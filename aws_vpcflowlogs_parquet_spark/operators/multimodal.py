"""Multimodal column plumbing (SURVEY §2.4): opaque binary payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
(`decode_image` raises ``NotImplementedError``; `extract_features` computes
real, deterministic byte-level features) — but the Spark-side plumbing is
the production shape: binary column in, ``mapInPandas`` with an explicit
output schema, Arrow batches end-to-end, per-partition processing with no
driver involvement, so it scales with executors × partitions.

The testdata has no binary column; payloads are materialized as the UTF-8
encoding of ``documents.text``, which keeps the operator oracle-checkable
(octet_length/md5 are byte-exact in DuckDB).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, content_md5 string, is_ascii boolean"


def decode_image(payload: bytes) -> object:
    """Decode an image payload. Codec libraries are not available in this
    environment; the Spark plumbing around this stub is real and tested."""
    raise NotImplementedError("image codecs not available in this environment")


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Attach the opaque binary column (UTF-8 bytes of text)."""
    return documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def extract_features(documents: DataFrame) -> DataFrame:
    """binary payload → typed metadata via Arrow-batched mapInPandas.

    The batch function is a nested closure so cloudpickle ships it by
    value — executors need no import path to this package (the engine may
    be driven from any cwd, and a real cluster's workers never have the
    driver's sys.path).
    """

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        # One Arrow batch in, one out: vectorized byte-level features.
        for pdf in batches:
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "content_md5": payloads.map(
                        lambda b: _hashlib.md5(b).hexdigest()
                    ),
                    "is_ascii": payloads.map(lambda b: all(x < 128 for x in b)),
                }
            )

    return with_binary_payload(documents).mapInPandas(
        feature_batches, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_width int, out_height int"
)
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_md5 string"


def resize_images(documents: DataFrame, target_max: int = 64) -> DataFrame:
    """Aspect-preserving resize plan over binary image payloads.

    Decode is stubbed (:func:`decode_image`; dims derive deterministically
    from payload length) but the dataflow is the production one: binary in,
    Arrow batches through ``mapInPandas``, scalar metadata out — one
    pass, no shuffle, scales with input bytes.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fake_dims(payload: bytes) -> tuple[int, int]:
            # inlined _fake_dims: a module-level reference would make
            # cloudpickle serialize this closure by module path, which
            # breaks on workers that can't import the engine package
            n = len(payload)
            return 16 + n % 241, 16 + (n * 7) % 241

        for pdf in batches:
            dims = pdf["payload"].map(fake_dims)
            w = dims.map(lambda d: d[0]).astype("int32")
            h = dims.map(lambda d: d[1]).astype("int32")
            scale = (target_max / w.combine(h, max)).clip(upper=1.0)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "out_width": (w * scale).astype("int32").clip(lower=1),
                    "out_height": (h * scale).astype("int32").clip(lower=1),
                }
            )

    return with_binary_payload(documents).mapInPandas(
        resize_batches, schema=RESIZE_SCHEMA
    )


def sample_frames(documents: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame sampling over binary video payloads: one input row fans out
    to ``n_frames`` output rows (1:N mapInPandas — the batch function
    yields more rows than it receives, no explode/shuffle needed).

    Frames are deterministic byte slices standing in for codec output;
    the fan-out shape, schema, and Arrow batching are the production
    plumbing.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                k = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    frame = bytes(payload[i * k : (i + 1) * k])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(frame))
                    out["frame_md5"].append(_hashlib.md5(frame).hexdigest())
            yield _pd.DataFrame(out)

    return with_binary_payload(documents).mapInPandas(
        frame_batches, schema=FRAME_SCHEMA
    )


AUDIO_SCHEMA = (
    "doc_id bigint, window_idx int, n_samples int, energy bigint, peak int"
)


def audio_energy(documents: DataFrame, window: int = 256) -> DataFrame:
    """Windowed audio-energy extraction over binary payloads: treat the
    payload as 8-bit PCM samples, emit per-window sum-of-squares energy
    and peak amplitude — the VAD/silence-detection front end of an audio
    pipeline. Another 1:N Arrow-batched mapInPandas fan-out (like
    sample_frames): windows materialize executor-side, no explode, no
    shuffle, and the vectorized numpy inner loop is the production shape
    a real decoder would slot into. Integer outputs → oracle-exact
    (the ASCII corpus makes byte values equal character codes, so DuckDB
    replays them from the text)."""

    def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = {
                "doc_id": [], "window_idx": [],
                "n_samples": [], "energy": [], "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = _np.frombuffer(bytes(payload), dtype=_np.uint8)
                for w in range(0, max(len(samples), 1), window):
                    chunk = samples[w : w + window].astype(_np.int64)
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(w // window)
                    out["n_samples"].append(int(chunk.size))
                    out["energy"].append(int((chunk * chunk).sum()))
                    out["peak"].append(int(chunk.max()) if chunk.size else 0)
            yield _pd.DataFrame(out)

    return with_binary_payload(documents).mapInPandas(
        energy_batches, schema=AUDIO_SCHEMA
    )
