"""int64 headroom pins for the bucketed exact-integer audit family
(VERDICT r8 item 3).

q_gini_bucketed / q_lorenz_bucketed / q_abc_pareto_bucketed document
their magnitude bounds in prose ("N·S holds through sf ≈ 1"); these
tests make the bounds EXECUTABLE: measure the actual value domain from
the shipped fixtures at every available scale factor, extrapolate the
worst-case product with the OBSERVED growth rate, and assert headroom
under 2^63. A future fixture regeneration that silently fattens
o_totalprice — or a query edit that grows the product — fails here
instead of wrapping silently in Spark's non-ANSI bigint arithmetic at
a scale the sf0.01 drive never reaches.

Tight bound, proved: with bins ordered ascending, every per-row term
n_b·(2·cums_b − s_b) is nonnegative (cums_b ≥ s_b) and
Σ_b n_b·(2·cums_b − s_b) = N·S·(1 − G) ≤ N·S by the piecewise-linear
Lorenz identity, so the largest magnitude anywhere in gini_num/gini_den
is exactly N·S — customers × total spend cents.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

I64_MAX = 2**63 - 1

SFS = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
]


def _spend_stats(sf_dir: str) -> tuple[int, int]:
    """(N customers, S total spend cents) — the exact integer lattice
    q_gini_bucketed aggregates on (floor(o_totalprice*100 + 0.5))."""
    con = duckdb.connect()
    n, s = con.execute(
        f"""
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT)
        FROM read_parquet('{sf_dir}/orders.parquet')
        """
    ).fetchone()
    con.close()
    return int(n), int(s)


@pytest.fixture(scope="module")
def spend():
    return {sf: _spend_stats(d) for d, sf in SFS if os.path.isdir(d)}


def test_gini_bucketed_product_holds_through_sf1(spend):
    # pin the docstring's claim: N·S stays inside int64 through sf = 1
    # (and therefore through every drive the driver actually runs)
    assert len(spend) >= 2, "need two fixture scales to measure growth"
    sfs = sorted(spend)
    (sf_a, sf_b) = sfs[0], sfs[-1]
    n_a, s_a = spend[sf_a]
    n_b, s_b = spend[sf_b]
    # measured growth exponents (≈1 for both N and S — verify, don't
    # assume: superlinear fixture growth would invalidate the linear
    # extrapolation the docstring relies on)
    g_n = math.log(n_b / n_a) / math.log(sf_b / sf_a)
    g_s = math.log(s_b / s_a) / math.log(sf_b / sf_a)
    assert g_n < 1.1 and g_s < 1.1, (g_n, g_s)
    n_1 = n_b * (1.0 / sf_b) ** max(g_n, 1.0)
    s_1 = s_b * (1.0 / sf_b) ** max(g_s, 1.0)
    worst_sf1 = n_1 * s_1
    assert worst_sf1 < I64_MAX, (
        f"gini_bucketed N·S at sf1 ≈ {worst_sf1:.3e} wraps int64 — move "
        f"gini_num/gini_den to DECIMAL(38,0) on both engines as the "
        f"query docstring prescribes"
    )
    # and confirm the docstring's "WRAPS beyond sf ≈ 1" warning is still
    # live, i.e. the margin at sf1 is under one decade: if a fixture
    # change ever shrinks the domain enough to retire the warning, this
    # flags the docstring for an update instead of leaving stale prose
    assert worst_sf1 * 10 > I64_MAX, f"{worst_sf1:.3e}"


def test_gini_bucketed_sf01_has_two_decades_slack(spend):
    # the sf0.1 stress drive is the largest scale a driver round runs;
    # it must sit ≥ 2 decades below wrap so a same-code 10× data bump
    # still cannot wrap silently
    sf, (n, s) = max(spend.items())
    scale = 0.1 / sf
    worst_sf01 = (n * scale) * (s * scale)
    assert worst_sf01 * 100 < I64_MAX, f"{worst_sf01:.3e}"


def test_abc_pareto_bucketed_cent_sums_hold_through_sf1(spend):
    # q_abc_pareto_bucketed's largest product is total-cents × 20
    # (the descending-bin cumulative compared against 20·S thresholds);
    # docstring claims headroom through sf ≈ 1000 — pin sf 1 with two
    # decades of slack, same measured-growth method.
    sf, (_, s) = max(spend.items())
    s_1 = s * (1.0 / sf)
    assert s_1 * 20 * 100 < I64_MAX, f"{s_1 * 20:.3e}"


def test_spearman_rank_products_two_decades_slack_at_sf01(spend):
    # q_spearman's largest bigint term is sx*sy = (n(n+1))^2 on the 2x
    # average-rank lattice; the sf0.1 stress drive must keep >= 2
    # decades below int64 wrap (the docstring prescribes DECIMAL(38,0)
    # past sf ~ 0.3)
    sf, (n, _) = max(spend.items())
    n_01 = n * (0.1 / sf)
    worst = (n_01 * (n_01 + 1)) ** 2
    assert worst * 100 < I64_MAX, f"{worst:.3e}"
