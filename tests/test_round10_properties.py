"""Property depth for the round-10 mechanism families: each test pins,
over ARBITRARY hypothesis-generated inputs, the mathematical identity
its oracle relies on — so the oracle-vs-Spark agreement on the fixture
data cannot be a coincidence of that data.

- CIDR buddy merge: the iterative fixpoint equals the closed-form
  characterization (fully-covered ∧ parent-not) the DuckDB oracle uses,
  and the cover is EXACT (disjoint blocks, union = leaf set).
- Group LCP: LCP(set) = LCP(lexicographic min, max).
- Largest-remainder spreading (q_revenue_recognition): slices always
  reassemble the exact total, earliest periods get the extra cents.
- Luhn: completing a payload with its computed check digit always
  validates; single-digit corruptions never do.
- Tree LCA: max(common ancestors) under heap numbering equals the
  walk-up LCA.
- Next-fit packing: the [1, size]-element seedless fold equals the
  imperative loop, and n_bins is within 2x of the volume lower bound.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _iterative_cover(leaves: set[int], max_k: int = 8):
    frontier = set(leaves)
    out = set()
    for k in range(max_k):
        import collections

        parents = collections.Counter(b // 2 for b in frontier)
        out |= {(b, k) for b in frontier if parents[b // 2] == 1}
        frontier = {p for p, c in parents.items() if c == 2}
    out |= {(b, max_k) for b in frontier}
    return out


def _closed_form_cover(leaves: set[int], max_k: int = 8):
    import collections

    cnt = {}
    for k in range(max_k + 1):
        c = collections.Counter(b >> k for b in leaves)
        cnt[k] = c
    out = set()
    for k in range(max_k + 1):
        for blk, n in cnt[k].items():
            if n == (1 << k) and (
                k == max_k or cnt[k + 1][blk >> 1] < (1 << (k + 1))
            ):
                out.add((blk, k))
    return out


@given(st.sets(st.integers(min_value=0, max_value=4095), max_size=300))
@settings(max_examples=200, deadline=None)
def test_cidr_merge_fixpoint_equals_closed_form(leaves):
    it = _iterative_cover(leaves)
    cf = _closed_form_cover(leaves)
    assert it == cf
    # the cover is exact: blocks are disjoint and union back to leaves
    covered = set()
    for b, k in it:
        blk = set(range(b << k, (b << k) + (1 << k)))
        assert not (covered & blk)
        covered |= blk
    assert covered == leaves


@given(st.lists(st.text(alphabet="abc/", min_size=0, max_size=12),
                min_size=1, max_size=30))
@settings(max_examples=300, deadline=None)
def test_group_lcp_equals_min_max_lcp(strings):
    def lcp2(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return a[:n]

    full = strings[0]
    for s in strings[1:]:
        full = lcp2(full, s)
    assert full == lcp2(min(strings), max(strings))


@given(st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=1, max_value=12))
@settings(max_examples=300, deadline=None)
def test_largest_remainder_spread_reassembles_total(cents, n_periods):
    slices = [cents // n_periods + (1 if k < cents % n_periods else 0)
              for k in range(n_periods)]
    assert sum(slices) == cents
    # earliest periods carry the extra cents; monotone non-increasing
    assert slices == sorted(slices, reverse=True)
    assert max(slices) - min(slices) <= 1


def _luhn_sum(digits):
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total


@given(st.lists(st.integers(min_value=0, max_value=9),
                min_size=6, max_size=18))
@settings(max_examples=300, deadline=None)
def test_luhn_check_digit_completion_validates(payload):
    # compute the check digit that makes the full number valid
    partial = _luhn_sum(payload + [0])
    check = (10 - partial % 10) % 10
    digits = payload + [check]
    assert _luhn_sum(digits) % 10 == 0
    # single-digit corruption is always detected (the Luhn guarantee)
    for pos in range(len(digits)):
        for wrong in range(10):
            if wrong == digits[pos]:
                continue
            corrupted = digits[:]
            corrupted[pos] = wrong
            assert _luhn_sum(corrupted) % 10 != 0


@given(st.integers(min_value=1, max_value=1023),
       st.integers(min_value=1, max_value=1023))
@settings(max_examples=300, deadline=None)
def test_tree_lca_max_common_equals_walk_up(a, b):
    def ancestors(v):
        out = set()
        while v >= 1:
            out.add(v)
            v //= 2
        return out

    # walk-up LCA
    x, y = a, b
    while x.bit_length() > y.bit_length():
        x //= 2
    while y.bit_length() > x.bit_length():
        y //= 2
    while x != y:
        x //= 2
        y //= 2
    assert x == max(ancestors(a) & ancestors(b))


@given(st.lists(st.integers(min_value=1, max_value=75),
                min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_next_fit_fold_equals_loop_and_bounds(sizes):
    items = sorted(sizes, reverse=True)
    # the fold with [1, s] fresh-bin elements, seeded by the first
    acc = [1, items[0]]
    for s in items[1:]:
        x = [1, s]
        if acc[1] + x[1] <= 75:
            acc = [acc[0], acc[1] + x[1]]
        else:
            acc = [acc[0] + 1, x[1]]
    # imperative loop
    bins, load = 1, items[0]
    for s in items[1:]:
        if load + s <= 75:
            load += s
        else:
            bins, load = bins + 1, s
    assert acc[0] == bins
    # volume lower bound and the next-fit 2x guarantee
    import math

    lower = math.ceil(sum(items) / 75)
    assert lower <= bins <= 2 * lower
