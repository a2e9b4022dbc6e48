"""Property tests for the layout/robust-stats kernels: the Z-order key
must be a bijection (decode(encode(x,y)) == (x,y)) and must preserve
locality at every power-of-two cell size; the weighted-median selection
must match a brute-force reference on arbitrary weighted multisets."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _z_encode(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _z_decode(z: int, bits: int = 8) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@given(st.integers(0, 255), st.integers(0, 255))
def test_zorder_roundtrip(x, y):
    assert _z_decode(_z_encode(x, y)) == (x, y)


@given(st.integers(0, 255), st.integers(0, 255), st.integers(1, 7))
def test_zorder_locality_cells(x, y, level):
    # all points inside a 2^level-aligned square share one z-prefix: the
    # property that makes a contiguous z-range a compact 2-D block
    mask = ~((1 << level) - 1) & 0xFF
    base = _z_encode(x & mask, y & mask)
    assert _z_encode(x, y) >> (2 * level) == base >> (2 * level)


@given(
    st.lists(
        st.tuples(st.integers(-100, 100), st.integers(1, 20)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200)
def test_weighted_median_selection_rule(pairs):
    # q_weighted_median's rule: smallest value (in total order) whose
    # cumulative weight reaches half the total — must match the
    # brute-force expansion's lower median position
    total = sum(w for _, w in pairs)
    ordered = sorted(pairs)  # (value, weight); ties keep insertion of sort
    cum = 0
    selected = None
    for v, w in ordered:
        cum += w
        if 2 * cum >= total:
            selected = v
            break
    # brute force: expand to a multiset and take the element at the
    # lower-median cumulative position
    expanded = sorted(v for v, w in pairs for _ in range(w))
    # smallest index i with 2*(i+1) >= total  →  i = ceil(total/2) - 1
    brute = expanded[(total + 1) // 2 - 1]
    assert selected == brute
