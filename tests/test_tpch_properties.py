"""Determinism properties behind the TPC-H adaptations (round 4):

- the floor-div binning identity the quartile/histogram oracles lean on;
- Q17's integer-lattice rewrite of the 0.2·avg correlated boundary;
- Q15's tie behavior: exact-decimal revenue makes MAX-equality return
  the SAME tied set in Spark and DuckDB.
"""

from __future__ import annotations

from fractions import Fraction
from math import floor

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    x=st.floats(min_value=0.0, max_value=9e12, allow_nan=False,
                allow_infinity=False),
    width=st.sampled_from([7, 500, 1000, 86400]),
)
@settings(max_examples=300)
def test_floor_div_binning_identity(x, width):
    # floor(x / w) == floor(x) div w for x >= 0, integer w > 0 — the
    # identity that lets q_group_quartiles_approx bin without a float
    # division any engine could rebind. Checked against exact rational
    # arithmetic, not float division (which itself can misround).
    assert floor(x) // width == Fraction(floor(x), width).__floor__()
    # and the exact real quotient agrees too
    assert Fraction(floor(x), width).__floor__() == (
        Fraction(x) / width
    ).__floor__() or floor(x) != Fraction(x).__floor__()


@given(
    qtys=st.lists(st.integers(1, 50), min_size=1, max_size=30),
)
@settings(max_examples=200)
def test_q17_lattice_boundary_equals_exact_fraction(qtys):
    # 'qty < 0.2 * avg(qtys)' decided on the integer lattice
    # (5 * qty * n < sum) must equal the exact rational comparison for
    # every member — no epsilon, no rounding mode
    n, s = len(qtys), sum(qtys)
    for q in qtys:
        lattice = 5 * q * n < s
        exact = Fraction(q) < Fraction(1, 5) * Fraction(s, n)
        assert lattice == exact


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000))
def test_q15_ties_return_identical_sets_cross_engine(spark, seed):
    # two suppliers engineered to the SAME revenue: the equality-
    # against-MAX filter must return BOTH, in both engines, because the
    # exact-decimal sum is bit-identical — the failure mode being
    # guarded is double-sum ties resolving differently per engine
    from aws_vpcflowlogs_parquet_spark.plans.catalog import _TPCH_Q15

    rng_price = 100.0 + (seed % 97) * 0.01
    li_rows = [
        # supplier 1: two lines; supplier 2: one line with the same total
        (1, rng_price, 0.1, "1996-02-01"),
        (1, rng_price, 0.1, "1996-02-02"),
        (2, 2 * rng_price, 0.1, "1996-02-03"),
        (3, 1.0, 0.0, "1996-02-04"),  # clearly below the max
        (4, 5.0, 0.0, "1997-06-01"),  # outside the date window
    ]
    sup_rows = [(i, f"S{i}") for i in (1, 2, 3, 4)]
    li = spark.createDataFrame(
        [(s, p, d, f"{t} 00:00:00") for s, p, d, t in li_rows],
        "l_suppkey long, l_extendedprice double, l_discount double, ship string",
    ).selectExpr(
        "l_suppkey", "l_extendedprice", "l_discount",
        "CAST(ship AS TIMESTAMP) AS l_shipdate",
    )
    sup = spark.createDataFrame(sup_rows, "s_suppkey long, s_name string")
    li.createOrReplaceTempView("lineitem_t15")
    sup.createOrReplaceTempView("supplier_t15")
    got = sorted(
        (r.s_suppkey, r.total_revenue)
        for r in spark.sql(_TPCH_Q15.format(s="_t15")).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem(l_suppkey BIGINT, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_shipdate TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO lineitem VALUES (?, ?, ?, ?)",
        [(s, p, d, f"{t} 00:00:00") for s, p, d, t in li_rows],
    )
    con.execute("CREATE TABLE supplier(s_suppkey BIGINT, s_name VARCHAR)")
    con.executemany("INSERT INTO supplier VALUES (?, ?)", sup_rows)
    want = sorted(
        (r[0], r[2])
        for r in con.execute(_TPCH_Q15.format(s="")).fetchall()
    )
    assert got == want
    assert [s for s, _ in got] == [1, 2]  # the engineered tie, both rows


def test_tpch_suite_complete_22_of_22():
    """The full adapted TPC-H suite is registered in the driver-verified
    catalog — one inventory assertion so completeness cannot silently
    regress (r4 VERDICT item 4). Adaptations that diverge from the spec
    columns (all because the synthetic schema has no partsupp relation,
    no l_shipmode/commit/receipt dates, no c_phone/o_comment, and
    c_mktsegment/p_brand analogues are key-derived) are documented
    per-query in the catalog docstrings and summarized in SURVEY §2.3."""
    from aws_vpcflowlogs_parquet_spark.plans.catalog import ORACLES, QUERIES

    expected = {f"q_tpch_q{i}" for i in range(1, 23)}
    registered = {n for n in QUERIES if n.startswith("q_tpch_q")}
    assert registered == expected, sorted(expected ^ registered)
    # every one is oracle-paired (no rows-only weak checks)
    assert expected <= set(ORACLES)
