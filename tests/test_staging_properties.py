"""Independent-witness properties for the round-4-staged, round-5-promoted
queries — each is oracle-replicated (test_queries_oracle.py, post-promotion);
these tests check the SEMANTICS against a second, independent implementation
or a mathematical invariant, the way SURVEY §5 does for the older families."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES as STAGED_QUERIES
from aws_vpcflowlogs_parquet_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_kcore_equals_python_peeling(spark):
    # independent witness: collect the derived edge set (tiny: 41-node
    # synthetic graph) and peel in plain Python to a FIXPOINT; the
    # bounded-round query must agree (8 rounds suffice here), and every
    # member must retain >= k neighbors inside the core.
    ev = load_table(spark, SF_DIR, "events")
    rows = (
        ev.selectExpr(
            "least(user_id % 41, (2 * user_id + event_id) % 41) AS lo",
            "greatest(user_id % 41, (2 * user_id + event_id) % 41) AS hi",
        )
        .filter("lo != hi")
        .distinct()
        .collect()
    )
    edges = {(r.lo, r.hi) for r in rows}
    k = 3
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
    want = {}
    for a, b in edges:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    got = {
        r.node: r.core_degree
        for r in STAGED_QUERIES["q_kcore"](spark, SF_DIR).collect()
    }
    assert got == want
    assert all(d >= k for d in got.values())


def test_window_funnel_dominated_by_unwindowed_funnel(spark):
    # the 24h window can only REMOVE conversions relative to q_funnel's
    # order-only chain, and levels must partition all users exactly
    from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES

    lv = {
        r.level: r.n_users
        for r in STAGED_QUERIES["q_window_funnel"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    assert sum(lv.values()) == ev.select("user_id").distinct().count()
    funnel = QUERIES["q_funnel"](spark, SF_DIR).collect()[0].asDict()
    n3_unwindowed = funnel["n_purchased_after"]
    assert lv.get(3, 0) <= n3_unwindowed
    # windowed level>=1 equals the unwindowed viewer count (level 1 has
    # no time constraint: its anchor IS the view)
    assert lv.get(1, 0) + lv.get(2, 0) + lv.get(3, 0) == funnel["n_viewed"]


def test_rolling_hll_tracks_exact_rolling_active(spark):
    exact = {
        r.window_day: r.active_7d
        for r in STAGED_QUERIES["q_rolling_active"](spark, SF_DIR).collect()
    }
    est_rows = STAGED_QUERIES["q_rolling_hll"](spark, SF_DIR).collect()
    assert len(est_rows) > 0
    # 16-register HLL: generous 4-sigma-ish envelope (rse ~ 1.04/sqrt(16))
    import datetime

    epoch = datetime.date(1970, 1, 1)
    checked = 0
    for r in est_rows:
        day = epoch + datetime.timedelta(days=int(r.day_idx))
        if day in exact and exact[day] >= 8:
            checked += 1
            rel = abs(r.est_active_7d - exact[day]) / exact[day]
            assert rel < 1.05, (day, r.est_active_7d, exact[day])
    assert checked > 0


def test_gini_equals_exact_fraction_computation(spark):
    o = load_table(spark, SF_DIR, "orders")
    spend = sorted(
        (int(r.x), r.o_custkey)
        for r in o.groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("x")
        )
        .collect()
    )
    n = len(spend)
    tot = sum(x for x, _ in spend)
    num = 2 * sum((i + 1) * x for i, (x, _) in enumerate(spend)) - (n + 1) * tot
    want = Fraction(num, n * tot)
    row = STAGED_QUERIES["q_gini"](spark, SF_DIR).collect()[0]
    assert row.n_customers == n
    assert abs(row.gini - float(want)) < 1e-12
    assert 0.0 <= row.gini <= 1.0


def test_percentile_disc_values_exist_and_rank_correctly(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    rows = STAGED_QUERIES["q_percentile_disc"](spark, SF_DIR).collect()
    data: dict[str, list[int]] = {}
    for r in li.select("l_returnflag", "l_quantity").collect():
        data.setdefault(r.l_returnflag, []).append(int(r.l_quantity))
    for r in rows:
        vals = sorted(data[r.grp])
        n = len(vals)
        for q_num, q_den, got in (
            (1, 4, r.p25), (1, 2, r.p50), (3, 4, r.p75), (19, 20, r.p95)
        ):
            rank = -(-q_num * n // q_den)  # ceil(q*n)
            assert got == vals[rank - 1], (r.grp, q_num, q_den)
            assert got in vals


# --------------------------------------------------- staged plan shapes


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_staged_tpch_q2_decorrelates_min_subquery(spark):
    # the correlated MIN must plan as an aggregate + join, not a
    # per-row subquery execution
    plan = _executed(STAGED_QUERIES["q_tpch_q2"](spark, SF_DIR))
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_staged_tpch_q21_plans_semi_and_anti(spark):
    plan = _executed(STAGED_QUERIES["q_tpch_q21"](spark, SF_DIR))
    assert "LeftSemi" in plan, plan
    assert "Anti" in plan, plan


def test_staged_prefix_filter_has_no_quadratic_join(spark):
    # the entire point: no cartesian/nested-loop pair generation
    docs = load_table(spark, SF_DIR, "documents")
    from aws_vpcflowlogs_parquet_spark.operators.dedup import (
        prefix_filtered_pairs,
    )

    plan = _executed(prefix_filtered_pairs(docs, 1, 5))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # round-5 verify rewrite: overlap comes from a codegen'd
    # array_intersect over per-doc arrays, not a per-candidate fan-out
    # join + re-aggregation (the arrays ride broadcast/shuffled
    # EQUI-joins on doc ids only)
    assert "array_intersect" in plan, plan


def test_staged_rolling_active_broadcasts_offsets(spark):
    plan = _executed(STAGED_QUERIES["q_rolling_active"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the fan-out factor is constant: exactly one scan of events
    assert plan.count("FileScan parquet") == 1, plan


def test_staged_rolling_hll_single_scan(spark):
    plan = _executed(STAGED_QUERIES["q_rolling_hll"](spark, SF_DIR))
    assert plan.count("FileScan parquet") == 1, plan
    assert "Window" in plan
