"""Staging catalog — queries built ahead of the external driver's
50-pending-per-round verification capacity, held out of ``queries()``
until the queue drains.

Round-11 status: **empty — all 27 round-10-staged queries were promoted
into the §2.3 catalog** (r10 VERDICT item 1): q_group_lcp,
q_histogram_equalize, q_ratio_delta_method, q_h_index,
q_linear_interpolate, q_csv_sniff, q_outlier_iqr, q_readability,
q_forecast_backtest, q_ua_parse, q_modularity, q_er_score,
q_flow_stitch, q_feature_hash_audit, q_revenue_recognition,
q_diff_in_diff, q_grid_hotspot, q_reconciliation,
q_sampling_temperature, q_span_f1, q_encoding_advisor, q_merkle_levels,
q_mix_rate_decomposition, q_t_closeness, q_conformal_interval, q_apdex
and q_backfill_plan each moved verbatim (oracle included) with
``@staged`` -> ``@register``; their independent-witness tests
(tests/test_round10_staging_witness.py) and plan pins
(tests/test_round10_staging_plans.py) now point at the catalog registry.

The staging machinery (``@staged``, ``STAGED_QUERIES``/``STAGED_ORACLES``,
the oracle gate in tests/test_staging_oracle.py) stays armed for any
future round that would overrun the driver's 50-pending-per-round cap:
move the ``@staged`` block to catalog.py, switch the decorator to
``@register``, add the SURVEY §2.3 row, confirm pending ≤ 50, re-run the
sf0.01 drive.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_session_posture

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}


def staged(name: str, oracle: str):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_posture(spark)
            return fn(spark, sf_dir)

        STAGED_QUERIES[name] = wrapped
        STAGED_ORACLES[name] = oracle
        return wrapped

    return deco


# =====================================================================
# Round-11 staged batch — built past the driver's 50-pending cap
# (45 pending after the round-11 catalog batches); promotion target:
# round 12. Same contract as catalog.py: exact DuckDB oracle at
# sf0.001 AND sf0.01 (tests/test_staging_oracle.py), pure-Python
# witnesses (tests/test_round11_staging_witness.py), plan pins.
# =====================================================================

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ..caching import track_persist  # noqa: E402
from ..operators import dedup as dd  # noqa: E402
from ..sources.tables import load_table  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@staged(
    "q_retry_backoff_conformance",
    oracle="""
    WITH err AS (
      SELECT user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'error'
    ),
    gaps AS (
      SELECT user_id, us,
             us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
               AS gap
      FROM err
    ),
    chains AS (
      SELECT user_id, us, gap,
             CAST(SUM(CASE WHEN gap IS NULL OR gap >= 7200000000
                           THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS chain_id
      FROM gaps
    ),
    withg AS (
      SELECT user_id, chain_id, us,
             CASE WHEN us - lag(us) OVER w < 7200000000
                  THEN us - lag(us) OVER w END AS g
      FROM chains
      WINDOW w AS (PARTITION BY user_id, chain_id ORDER BY us)
    ),
    steps AS (
      SELECT user_id, chain_id, g,
             lag(g) OVER (PARTITION BY user_id, chain_id ORDER BY us)
               AS g_prev
      FROM withg
    ),
    judged AS (
      SELECT user_id, chain_id,
             CAST(COUNT(*) AS BIGINT) AS chain_len,
             CAST(SUM(CASE WHEN g IS NOT NULL AND g_prev IS NOT NULL
                            AND g < 2 * g_prev THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violations
      FROM steps GROUP BY user_id, chain_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_chains,
           CAST(SUM(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_conformant,
           CAST(MAX(chain_len) AS BIGINT) AS longest_chain
    FROM judged GROUP BY user_id ORDER BY user_id
    """,
)
def q_retry_backoff_conformance(spark, sf_dir):
    """EXPONENTIAL-BACKOFF CONFORMANCE audit — the client-behavior
    check an API owner runs on error telemetry (misbehaving clients
    that retry LINEARLY during outages are the thundering herd): per
    user, consecutive errors within 2 h form one retry CHAIN
    (gaps-and-islands: a chain-id running sum over the new-chain
    flag), and a chain is conformant iff every inter-retry gap at
    least DOUBLES the previous one (g_i >= 2·g_{i-1}, integer
    microseconds — the exponential-backoff contract). Three stacked
    windows share ONE (user, time) partitioning: the session flag,
    the per-chain gap, and the gap's lag; per-user rollup reports
    chain counts, conformant counts, and the longest chain.

    At 100 TB: one exchange on user_id carries the whole audit; the
    chain segmentation is the same running-sum mechanism as
    q_gaps_islands and q_backfill_plan, applied to protocol
    conformance."""
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.expr("unix_micros(ts)").alias("us")
    )
    wu = Window.partitionBy("user_id").orderBy("us")
    gaps = err.withColumn("gap", F.col("us") - F.lag("us").over(wu))
    new_chain = F.when(
        F.col("gap").isNull() | (F.col("gap") >= 7200000000), 1
    ).otherwise(0)
    chains = gaps.withColumn(
        "chain_id",
        F.sum(new_chain)
        .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    wc = Window.partitionBy("user_id", "chain_id").orderBy("us")
    g = F.when(
        F.col("us") - F.lag("us").over(wc) < 7200000000,
        F.col("us") - F.lag("us").over(wc),
    )
    steps = chains.select(
        "user_id",
        "chain_id",
        g.alias("g"),
        F.lag(g).over(wc).alias("g_prev"),
    )
    judged = steps.groupBy("user_id", "chain_id").agg(
        F.count("*").cast("bigint").alias("chain_len"),
        F.sum(
            F.when(
                F.col("g").isNotNull()
                & F.col("g_prev").isNotNull()
                & (F.col("g") < 2 * F.col("g_prev")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_violations"),
    )
    return (
        judged.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_chains"),
            F.sum(F.when(F.col("n_violations") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_conformant"),
            F.max("chain_len").cast("bigint").alias("longest_chain"),
        )
        .orderBy("user_id")
    )


@staged(
    "q_krippendorff_alpha",
    oracle="""
    WITH ratings AS (
      SELECT user_id % 50 AS unit,
             LEAST(CAST(floor(value / 50) AS INT), 6) AS c
      FROM events
    ),
    nuc AS (
      SELECT unit, c, CAST(COUNT(*) AS BIGINT) AS n_uc
      FROM ratings GROUP BY unit, c
    ),
    mu AS (
      SELECT unit, CAST(SUM(n_uc) AS BIGINT) AS m_u
      FROM nuc GROUP BY unit
      HAVING SUM(n_uc) >= 2
    ),
    do_num AS (
      SELECT CAST(SUM(12 * n.n_uc * (m.m_u - n.n_uc) // (m.m_u - 1))
               AS BIGINT) AS do12,
             CAST(SUM(n.n_uc) AS BIGINT) AS big_n
      FROM nuc n JOIN mu m ON m.unit = n.unit
    ),
    margins AS (
      SELECT c, CAST(SUM(n.n_uc) AS BIGINT) AS n_c
      FROM nuc n JOIN mu m ON m.unit = n.unit
      GROUP BY c
    ),
    de_num AS (
      SELECT CAST(SUM(n_c * ((SELECT big_n FROM do_num) - n_c))
               AS BIGINT) AS de
      FROM margins
    )
    SELECT d.do12, d.big_n, e.de,
           1.0 - (CAST(d.do12 AS DOUBLE) * CAST(d.big_n - 1 AS DOUBLE))
                 / (12.0 * CAST(e.de AS DOUBLE)) AS alpha
    FROM do_num d, de_num e
    """,
)
def q_krippendorff_alpha(spark, sf_dir):
    """KRIPPENDORFF'S ALPHA (nominal) — the labeling-ops agreement
    metric that, unlike q_judge_kappa's pairwise Cohen form, handles
    ANY number of raters per unit and missing ratings natively: units
    are user cohorts, categories are value buckets, and alpha =
    1 − Do/De over the coincidence counts. The exactness trick: Do's
    per-unit terms divide by (m_u − 1) ∈ {1..4} (unequal rater counts
    per unit), so the sum is scaled by 12 = lcm(1,2,3,4) FIRST —
    12·n_uc(m_u−n_uc)/(m_u−1) is then an exact integer for every unit
    — and De's margin form shares the single denominator N(N−1), so
    alpha assembles from three BIGINT numerators with ONE floating
    division chain at readout. Units with a single rating drop out
    (they carry no agreement information), exactly per the estimator's
    definition.

    At 100 TB: two hash aggs (unit×category, then unit) + a bounded
    margin agg — the coincidence matrix never materializes beyond
    |categories| rows."""
    ev = _t(spark, sf_dir, "events")
    ratings = ev.select(
        (F.col("user_id") % 50).alias("unit"),
        F.least(
            F.floor(F.col("value") / 50).cast("int"), F.lit(6)
        ).alias("c"),
    )
    nuc = ratings.groupBy("unit", "c").agg(
        F.count("*").cast("bigint").alias("n_uc")
    )
    mu = (
        nuc.groupBy("unit")
        .agg(F.sum("n_uc").cast("bigint").alias("m_u"))
        .filter(F.col("m_u") >= 2)
    )
    joined = nuc.join(mu, "unit")
    do_num = joined.agg(
        F.sum(
            F.expr("(12 * n_uc * (m_u - n_uc)) div (m_u - 1)")
        )
        .cast("bigint")
        .alias("do12"),
        F.sum("n_uc").cast("bigint").alias("big_n"),
    )
    margins = joined.groupBy("c").agg(
        F.sum("n_uc").cast("bigint").alias("n_c")
    )
    de_num = margins.crossJoin(F.broadcast(do_num)).agg(
        F.sum(F.col("n_c") * (F.col("big_n") - F.col("n_c")))
        .cast("bigint")
        .alias("de")
    )
    return do_num.crossJoin(F.broadcast(de_num)).select(
        "do12",
        "big_n",
        "de",
        (
            F.lit(1.0)
            - (
                F.col("do12").cast("double")
                * (F.col("big_n") - 1).cast("double")
            )
            / (F.lit(12.0) * F.col("de").cast("double"))
        ).alias("alpha"),
    )


@staged(
    "q_join_order_plan",
    oracle="""
    WITH stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_c,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_o,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_l,
             (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
              FROM orders) AS ndv_oc,
             (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
              FROM customer) AS ndv_cc,
             (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
              FROM lineitem) AS ndv_lo,
             (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
              FROM orders) AS ndv_oo
    ),
    est AS (
      SELECT *,
             n_c * n_o // GREATEST(ndv_cc, ndv_oc) AS co,
             n_o * n_l // GREATEST(ndv_oo, ndv_lo) AS ol
      FROM stats
    ),
    plans AS (
      SELECT 'co_then_l' AS plan_name, co AS inter1,
             co * n_l // GREATEST(ndv_oo, ndv_lo) AS inter2,
             co + co * n_l // GREATEST(ndv_oo, ndv_lo) AS est_cost
      FROM est
      UNION ALL
      SELECT 'ol_then_c', ol,
             ol * n_c // GREATEST(ndv_cc, ndv_oc),
             ol + ol * n_c // GREATEST(ndv_cc, ndv_oc)
      FROM est
      UNION ALL
      SELECT 'cl_cross_then_o', n_c * n_l,
             n_c * n_l * n_o
               // GREATEST(ndv_cc, ndv_oc)
               // GREATEST(ndv_oo, ndv_lo),
             n_c * n_l + n_c * n_l * n_o
               // GREATEST(ndv_cc, ndv_oc)
               // GREATEST(ndv_oo, ndv_lo)
      FROM est
    )
    SELECT plan_name, inter1, inter2, est_cost,
           CAST(CASE WHEN est_cost = (SELECT MIN(est_cost) FROM plans)
                THEN 1 ELSE 0 END AS INT) AS is_best
    FROM plans ORDER BY plan_name
    """,
)
def q_join_order_plan(spark, sf_dir):
    """JOIN-ORDER ENUMERATION with textbook cardinality estimates —
    the System-R kernel in miniature, run AS a query (engine
    introspection turned into data): for the customer⋈orders⋈lineitem
    chain, estimate each left-deep plan's intermediate sizes with the
    standard |A⋈B| = |A||B|/max(ndv_a, ndv_b) formula from REAL
    distinct counts, cost = Σ intermediates, and flag the argmin —
    which must be a chain order, never the cross-product order (the
    planner lesson the query materializes; is_best pins it). Every
    estimate is integer floor arithmetic from exact counts; the plan
    grid is three rows assembled from one broadcast stats row.

    This is what Catalyst's CBO does internally with ANALYZE stats
    (q_analyze_stats collects them); surfacing the arithmetic as a
    relational readout makes the cost model auditable and testable.
    At 100 TB: six scalar aggregates (each map-side combined), then
    bounded-row arithmetic."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    stats = (
        c.agg(
            F.count("*").cast("bigint").alias("n_c"),
            F.countDistinct("c_custkey").cast("bigint").alias("ndv_cc"),
        )
        .crossJoin(
            F.broadcast(
                o.agg(
                    F.count("*").cast("bigint").alias("n_o"),
                    F.countDistinct("o_custkey")
                    .cast("bigint")
                    .alias("ndv_oc"),
                    F.countDistinct("o_orderkey")
                    .cast("bigint")
                    .alias("ndv_oo"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                li.agg(
                    F.count("*").cast("bigint").alias("n_l"),
                    F.countDistinct("l_orderkey")
                    .cast("bigint")
                    .alias("ndv_lo"),
                )
            )
        )
    )
    est = stats.select(
        "*",
        F.expr("n_c * n_o div GREATEST(ndv_cc, ndv_oc)").alias("co"),
        F.expr("n_o * n_l div GREATEST(ndv_oo, ndv_lo)").alias("ol"),
    )
    plans = (
        est.select(
            F.lit("co_then_l").alias("plan_name"),
            F.col("co").alias("inter1"),
            F.expr("co * n_l div GREATEST(ndv_oo, ndv_lo)").alias("inter2"),
            F.expr(
                "co + co * n_l div GREATEST(ndv_oo, ndv_lo)"
            ).alias("est_cost"),
        )
        .unionByName(
            est.select(
                F.lit("ol_then_c").alias("plan_name"),
                F.col("ol").alias("inter1"),
                F.expr("ol * n_c div GREATEST(ndv_cc, ndv_oc)").alias(
                    "inter2"
                ),
                F.expr(
                    "ol + ol * n_c div GREATEST(ndv_cc, ndv_oc)"
                ).alias("est_cost"),
            )
        )
        .unionByName(
            est.select(
                F.lit("cl_cross_then_o").alias("plan_name"),
                F.expr("n_c * n_l").alias("inter1"),
                F.expr(
                    "n_c * n_l * n_o div GREATEST(ndv_cc, ndv_oc)"
                    " div GREATEST(ndv_oo, ndv_lo)"
                ).alias("inter2"),
                F.expr(
                    "n_c * n_l + n_c * n_l * n_o"
                    " div GREATEST(ndv_cc, ndv_oc)"
                    " div GREATEST(ndv_oo, ndv_lo)"
                ).alias("est_cost"),
            )
        )
    )
    best = plans.agg(F.min("est_cost").alias("min_cost"))
    return (
        plans.crossJoin(F.broadcast(best))
        .select(
            "plan_name",
            "inter1",
            "inter2",
            "est_cost",
            F.when(F.col("est_cost") == F.col("min_cost"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_best"),
        )
        .orderBy("plan_name")
    )


@staged(
    "q_newsvendor",
    oracle="""
    WITH demand AS (
      SELECT p.p_brand AS brand,
             CAST(floor(l.l_quantity) AS BIGINT) AS d
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    ranked AS (
      SELECT brand, d,
             CAST(row_number() OVER (PARTITION BY brand ORDER BY d)
               AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY brand) AS BIGINT) AS n
      FROM demand
    ),
    qstar AS (
      SELECT brand, MIN(d) AS q_star, MAX(n) AS n
      FROM ranked WHERE rn * 4 >= n * 3
      GROUP BY brand
    )
    SELECT d.brand, q.n, q.q_star,
           CAST(SUM(CASE WHEN q.q_star > d.d
                         THEN (q.q_star - d.d) * 1 ELSE 0 END)
             AS BIGINT) AS overage_cost,
           CAST(SUM(CASE WHEN d.d > q.q_star
                         THEN (d.d - q.q_star) * 3 ELSE 0 END)
             AS BIGINT) AS underage_cost
    FROM demand d JOIN qstar q ON q.brand = d.brand
    GROUP BY d.brand, q.n, q.q_star
    ORDER BY d.brand
    """,
)
def q_newsvendor(spark, sf_dir):
    """NEWSVENDOR stocking policy per brand — the one-period
    inventory optimum every supply-chain pipeline recomputes nightly:
    with underage cost cu = 3 and overage co = 1, the optimal stock
    q* is the demand distribution's critical quantile at
    cu/(cu+co) = 3/4, read EXACTLY from the empirical CDF by the
    integer cross-multiplication rn·4 ≥ n·3 (no percentile_cont
    interpolation, no floats — the smallest demand whose rank clears
    the ratio IS the argmin of expected cost on the empirical
    distribution). The realized-cost backtest rides the same scan:
    Σ co·(q*−d)+ + Σ cu·(d−q*)+, all on the integer demand lattice —
    so the policy AND its cost audit are one query.

    At 100 TB: rank window per brand + two joins against the bounded
    per-brand policy row — the q_percentile_disc machinery pointed at
    a decision problem."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    demand = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.floor("l_quantity").cast("bigint").alias("d"),
    )
    wb = Window.partitionBy("brand")
    ranked = demand.select(
        "brand",
        "d",
        F.row_number().over(wb.orderBy("d")).cast("bigint").alias("rn"),
        F.count("*").over(wb).cast("bigint").alias("n"),
    )
    qstar = (
        ranked.filter(F.col("rn") * 4 >= F.col("n") * 3)
        .groupBy("brand")
        .agg(F.min("d").alias("q_star"), F.max("n").alias("n"))
    )
    return (
        demand.join(F.broadcast(qstar), "brand")
        .groupBy("brand", "n", "q_star")
        .agg(
            F.sum(
                F.when(
                    F.col("q_star") > F.col("d"),
                    (F.col("q_star") - F.col("d")) * 1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("overage_cost"),
            F.sum(
                F.when(
                    F.col("d") > F.col("q_star"),
                    (F.col("d") - F.col("q_star")) * 3,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("underage_cost"),
        )
        .select(
            "brand", "n", "q_star", "overage_cost", "underage_cost"
        )
        .orderBy("brand")
    )


@staged(
    "q_pinball_eval",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS y,
             epoch_us(ts) AS us, event_id
      FROM events
    ),
    lagged AS (
      SELECT user_id, y,
             lag(y, 1) OVER w AS yhat1,
             lag(y, 7) OVER w AS yhat7
      FROM seq WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    scored AS (
      SELECT user_id,
             GREATEST(9 * (y - yhat1), -(y - yhat1)) AS l1,
             GREATEST(9 * (y - yhat7), -(y - yhat7)) AS l7
      FROM lagged WHERE yhat1 IS NOT NULL AND yhat7 IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(l1) AS BIGINT) AS loss10_naive1,
           CAST(SUM(l7) AS BIGINT) AS loss10_naive7,
           CASE WHEN SUM(l1) <= SUM(l7) THEN 'naive1' ELSE 'naive7' END
             AS winner
    FROM scored GROUP BY user_id ORDER BY user_id
    """,
)
def q_pinball_eval(spark, sf_dir):
    """PINBALL (quantile) LOSS model evaluation at τ = 0.9 — the
    scoring rule for quantile forecasts (what you minimize when the
    target is P90 capacity, not the mean): for two baseline predictors
    (naive-1 = last value, naive-7 = 7-back seasonal naive), score
    Σ max(τ(y−ŷ), (τ−1)(y−ŷ)) per user. With τ = 9/10 the loss scales
    by 10 onto the INTEGER lattice: max(9d, −d) over cent-valued
    residuals — so the winner verdict (the query's point) is decided
    on exact integers, never on float sums. Rows where either
    predictor lacks history drop from BOTH scores, keeping the
    comparison paired — the same fairness rule as q_forecast_backtest,
    here under an asymmetric loss.

    At 100 TB: two lags share one (user, time) window partitioning —
    single exchange — then one map-side-combined agg."""
    ev = _t(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("y"),
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lagged = seq.select(
        "user_id",
        "y",
        F.lag("y", 1).over(w).alias("yhat1"),
        F.lag("y", 7).over(w).alias("yhat7"),
    ).filter(F.col("yhat1").isNotNull() & F.col("yhat7").isNotNull())
    d1 = F.col("y") - F.col("yhat1")
    d7 = F.col("y") - F.col("yhat7")
    scored = lagged.select(
        "user_id",
        F.greatest(F.lit(9) * d1, -d1).alias("l1"),
        F.greatest(F.lit(9) * d7, -d7).alias("l7"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_scored"),
            F.sum("l1").cast("bigint").alias("loss10_naive1"),
            F.sum("l7").cast("bigint").alias("loss10_naive7"),
        )
        .select(
            "user_id",
            "n_scored",
            "loss10_naive1",
            "loss10_naive7",
            F.when(
                F.col("loss10_naive1") <= F.col("loss10_naive7"), "naive1"
            )
            .otherwise("naive7")
            .alias("winner"),
        )
        .orderBy("user_id")
    )


@staged(
    "q_rrf_fusion",
    oracle="""
    WITH base AS (
      SELECT doc_id, source, n_chars,
             len(list_filter(string_split(lower(text), ' '),
                 x -> x = 'data')) AS hits
      FROM documents
    ),
    r1 AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY hits DESC, doc_id) AS rank1
      FROM base
    ),
    r2 AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars ASC, doc_id) AS rank2
      FROM base
    ),
    fused AS (
      SELECT r1.source, r1.doc_id,
             CAST(1000000000000 // (60 + r1.rank1)
                + 1000000000000 // (60 + r2.rank2) AS BIGINT) AS rrf_e12
      FROM r1 JOIN r2 ON r1.doc_id = r2.doc_id AND r1.source = r2.source
    )
    SELECT source, doc_id, rrf_e12, fused_rank
    FROM (
      SELECT source, doc_id, rrf_e12,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY rrf_e12 DESC, doc_id) AS BIGINT) AS fused_rank
      FROM fused
    ) WHERE fused_rank <= 3
    ORDER BY source, fused_rank
    """,
)
def q_rrf_fusion(spark, sf_dir):
    """RECIPROCAL RANK FUSION — the standard hybrid-retrieval combiner
    (BM25 list + vector list → one ranking, the RRF of Cormack et
    al. every RAG stack ships): score = Σ_r 1/(60 + rank_r) over the
    per-source keyword ranking (hits on a probe term) and a
    length-prior ranking. The reciprocal terms are IRRATIONAL in
    general, so each is materialized as floor(10^12/(60+rank)) — the
    e12 integer lattice — making the fused ORDER engine-exact (sum of
    integers), not a float artifact; ranks themselves come from
    total-ordered row_number windows (tie-broken by doc_id) and the
    fusion is one equi-join on (source, doc) + one rank window, all
    partitioned by source.

    At 100 TB: two rank windows sharing the source partitioning, one
    co-partitioned join, one WindowGroupLimit top-3 — the fusion adds
    no shuffle beyond the rankings themselves."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(
            F.filter(
                F.split(F.lower("text"), " "),
                lambda x: x == F.lit("data"),
            )
        ).alias("hits"),
    )
    ws = Window.partitionBy("source")
    r1 = base.select(
        "doc_id",
        "source",
        F.row_number()
        .over(ws.orderBy(F.desc("hits"), F.asc("doc_id")))
        .alias("rank1"),
    )
    r2 = base.select(
        "doc_id",
        "source",
        F.row_number()
        .over(ws.orderBy(F.asc("n_chars"), F.asc("doc_id")))
        .alias("rank2"),
    )
    fused = r1.join(r2, ["doc_id", "source"]).select(
        "source",
        "doc_id",
        F.expr(
            "CAST(1000000000000 div (60 + rank1)"
            " + 1000000000000 div (60 + rank2) AS BIGINT)"
        ).alias("rrf_e12"),
    )
    return (
        fused.withColumn(
            "fused_rank",
            F.row_number()
            .over(ws.orderBy(F.desc("rrf_e12"), F.asc("doc_id")))
            .cast("bigint"),
        )
        .filter(F.col("fused_rank") <= 3)
        .orderBy("source", "fused_rank")
    )


@staged(
    "q_spc_control_chart",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS x,
             row_number() OVER (PARTITION BY event_type
               ORDER BY event_id) - 1 AS rn
      FROM events
    ),
    grouped AS (
      SELECT event_type, rn // 5 AS g,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(MAX(x) - MIN(x) AS BIGINT) AS r,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM seq GROUP BY event_type, rn // 5
      HAVING COUNT(*) = 5
    ),
    phase1 AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(s) AS BIGINT) AS ts,
             CAST(SUM(r) AS BIGINT) AS tr
      FROM grouped WHERE g < 20 GROUP BY event_type
    ),
    judged AS (
      SELECT gr.event_type, gr.g,
             CASE WHEN abs(gr.s * p.m - p.ts) * 200 > 577 * p.tr
                  THEN 1 ELSE 0 END AS rule1,
             CASE WHEN abs(gr.s * p.m - p.ts) * 600 > 2 * 577 * p.tr
                  THEN 1 ELSE 0 END AS warn2s
      FROM grouped gr JOIN phase1 p ON p.event_type = gr.event_type
    )
    SELECT j.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_subgroups,
           CAST(SUM(rule1) AS BIGINT) AS n_rule1,
           CAST(SUM(warn2s) AS BIGINT) AS n_beyond_2sigma,
           MAX(p.m) AS m_phase1
    FROM judged j JOIN phase1 p ON p.event_type = j.event_type
    GROUP BY j.event_type ORDER BY j.event_type
    """,
)
def q_spc_control_chart(spark, sf_dir):
    """SHEWHART X̄-R CONTROL CHART audit — the SPC mechanism behind
    every manufacturing/SLO quality gate: 5-observation subgroups in
    event order, phase-1 limits from the first 20 subgroups
    (x̄̄ ± A2·R̄ with the standard A2 = 0.577 constant for n = 5), and
    every subgroup judged against them. The whole decision lives on
    the integer lattice by cross-multiplication: |x̄_g − x̄̄| > A2·R̄
    with subgroup SUMS s = 5x̄_g becomes |s·m − TS|·200 > 577·TR
    (both sides BIGINT — the 1000-scaled A2 and the 5 from the
    subgroup size fold into the 200), and the 2σ warning line is the
    same inequality at ⅔ the width (×600 vs 2·577). No float ever
    decides a violation. Partial trailing subgroups are dropped (the
    chart's own convention).

    At 100 TB: one rank window per type (event order), one subgroup
    agg, one broadcast phase-1 row per type — the q_anomaly_zscore
    family upgraded to the subgroup-range methodology."""
    ev = _t(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("x"),
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("event_id")
            )
            - 1
        ).alias("rn"),
    )
    grouped = (
        seq.groupBy("event_type", (F.col("rn") / 5).cast("bigint").alias("g"))
        .agg(
            F.sum("x").cast("bigint").alias("s"),
            (F.max("x") - F.min("x")).cast("bigint").alias("r"),
            F.count("*").alias("k"),
        )
        .filter(F.col("k") == 5)
    )
    phase1 = (
        grouped.filter(F.col("g") < 20)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("m"),
            F.sum("s").cast("bigint").alias("ts"),
            F.sum("r").cast("bigint").alias("tr"),
        )
    )
    judged = grouped.join(F.broadcast(phase1), "event_type").select(
        "event_type",
        "m",
        F.when(
            F.abs(F.col("s") * F.col("m") - F.col("ts")) * 200
            > 577 * F.col("tr"),
            1,
        )
        .otherwise(0)
        .alias("rule1"),
        F.when(
            F.abs(F.col("s") * F.col("m") - F.col("ts")) * 600
            > 2 * 577 * F.col("tr"),
            1,
        )
        .otherwise(0)
        .alias("warn2s"),
    )
    return (
        judged.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_subgroups"),
            F.sum("rule1").cast("bigint").alias("n_rule1"),
            F.sum("warn2s").cast("bigint").alias("n_beyond_2sigma"),
            F.max("m").alias("m_phase1"),
        )
        .orderBy("event_type")
    )


@staged(
    "q_kendall_w",
    oracle="""
    WITH scores AS (
      SELECT CAST(event_id % 3 AS INT) AS rater,
             CAST(user_id % 10 AS BIGINT) AS item,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS score
      FROM events GROUP BY 1, 2
    ),
    ranks AS (
      SELECT rater, item,
             CAST(row_number() OVER (PARTITION BY rater
               ORDER BY score DESC, item) AS BIGINT) AS rk
      FROM scores
    ),
    rsums AS (
      SELECT item, CAST(SUM(rk) AS BIGINT) AS r_i,
             CAST(COUNT(*) AS BIGINT) AS m_chk
      FROM ranks GROUP BY item
    ),
    agg AS (
      SELECT CAST(SUM(r_i * r_i) AS BIGINT) AS s2,
             CAST(SUM(r_i) AS BIGINT) AS s1,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(m_chk) AS BIGINT) AS m
      FROM rsums
    )
    SELECT n, m, s2,
           (12.0 * CAST(s2 AS DOUBLE)
            - 3.0 * CAST(m * m * n * (n + 1) * (n + 1) AS DOUBLE))
           / CAST(m * m * n * (n * n - 1) AS DOUBLE) AS kendall_w
    FROM agg
    """,
)
def q_kendall_w(spark, sf_dir):
    """KENDALL'S W (coefficient of concordance) — do m independent
    rankers agree on an item ordering? The multi-rater generalization
    of rank correlation (q_spearman is the m = 2 case; q_judge_kappa
    and q_krippendorff_alpha are its categorical cousins): three
    raters each rank ten items by their summed observed score, and
    W = (12·ΣR_i² − 3m²n(n+1)²) / (m²n(n²−1)) reads agreement off the
    rank-sum dispersion. ΣR_i² and ΣR_i stay BIGINT (ranks from
    total-ordered row_number with the (score desc, item) tie-break —
    the deterministic-ranks convention documented at q_spearman);
    W itself is ONE floating division at readout. W = 1 is perfect
    concordance; W = 0 is the random-ranking null.

    At 100 TB: one score agg (map-side combined), one rank window per
    rater, two bounded aggs."""
    ev = _t(spark, sf_dir, "events")
    scores = ev.groupBy(
        (F.col("event_id") % 3).cast("int").alias("rater"),
        (F.col("user_id") % 10).cast("bigint").alias("item"),
    ).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("score")
    )
    wr = Window.partitionBy("rater").orderBy(F.desc("score"), F.asc("item"))
    ranks = scores.select(
        "rater",
        "item",
        F.row_number().over(wr).cast("bigint").alias("rk"),
    )
    rsums = ranks.groupBy("item").agg(
        F.sum("rk").cast("bigint").alias("r_i"),
        F.count("*").cast("bigint").alias("m_chk"),
    )
    agg = rsums.agg(
        F.sum(F.col("r_i") * F.col("r_i")).cast("bigint").alias("s2"),
        F.sum("r_i").cast("bigint").alias("s1"),
        F.count("*").cast("bigint").alias("n"),
        F.max("m_chk").cast("bigint").alias("m"),
    )
    return agg.select(
        "n",
        "m",
        "s2",
        (
            (
                F.lit(12.0) * F.col("s2").cast("double")
                - F.lit(3.0)
                * (
                    F.col("m")
                    * F.col("m")
                    * F.col("n")
                    * (F.col("n") + 1)
                    * (F.col("n") + 1)
                ).cast("double")
            )
            / (
                F.col("m")
                * F.col("m")
                * F.col("n")
                * (F.col("n") * F.col("n") - 1)
            ).cast("double")
        ).alias("kendall_w"),
    )


@staged(
    "q_harmonic_centrality",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT
             LEAST(user_id % 41, (2 * user_id + event_id) % 41) AS lo,
             GREATEST(user_id % 41, (2 * user_id + event_id) % 41) AS hi
      FROM events
      WHERE user_id % 41 != (2 * user_id + event_id) % 41
    ),
    sym AS (
      SELECT lo AS a, hi AS b FROM raw
      UNION ALL SELECT hi, lo FROM raw
    ),
    d1 AS (
      SELECT s.a AS seed, s.b AS node FROM sym s WHERE s.a < 4
    ),
    d2 AS (
      SELECT d.seed, s.b AS node
      FROM d1 d JOIN sym s ON s.a = d.node
    ),
    d3 AS (
      SELECT d.seed, s.b AS node
      FROM (SELECT DISTINCT seed, node FROM d2) d
      JOIN sym s ON s.a = d.node
    ),
    dist AS (
      SELECT seed, node, MIN(d) AS d FROM (
        SELECT seed, node, 1 AS d FROM d1
        UNION ALL SELECT seed, node, 2 FROM d2
        UNION ALL SELECT seed, node, 3 FROM d3
      ) u
      WHERE node != seed
      GROUP BY seed, node
    )
    SELECT seed,
           CAST(COUNT(*) AS BIGINT) AS n_reached_3,
           CAST(SUM(1000000 // d) AS BIGINT) AS harmonic_e6
    FROM dist GROUP BY seed ORDER BY seed
    """,
)
def q_harmonic_centrality(spark, sf_dir):
    """HARMONIC CENTRALITY (3-hop truncated) from seed nodes — the
    centrality that stays finite on disconnected graphs (Boldi &
    Vigna's recommendation over closeness): H(s) = Σ_v 1/d(s,v),
    truncated at radius 3 (the production form — full-radius
    centrality on a big graph is a multi-source BFS you cap). The
    Spark side runs the BSP frontier expansion the 100 TB job would:
    per-round DISTINCT frontier join against the symmetric edge list,
    distances resolved by MIN over rounds; the reciprocal weights live
    on the e6 integer lattice (1e6/d for d ∈ {1,2,3} is exact), so
    the centrality is an exact integer. Oracle unrolls the same three
    rounds as chained CTEs — independent join order, same fixpoint.

    At 100 TB: 3 frontier equi-joins (each keyed on the edge source,
    frontier deduped per round so fan-out is bounded by |V| per seed,
    never path-count), one MIN agg, one rollup — the q_recursive_bfs
    machinery pointed at a centrality readout."""
    ev = _t(spark, sf_dir, "events")
    u = F.col("user_id") % 41
    v = (2 * F.col("user_id") + F.col("event_id")) % 41
    raw = (
        ev.filter(u != v)
        .select(F.least(u, v).alias("lo"), F.greatest(u, v).alias("hi"))
        .distinct()
    )
    sym = raw.select(
        F.col("lo").alias("a"), F.col("hi").alias("b")
    ).unionByName(raw.select(F.col("hi").alias("a"), F.col("lo").alias("b")))
    d1 = (
        sym.filter(F.col("a") < 4)
        .select(F.col("a").alias("seed"), F.col("b").alias("node"))
        .distinct()
    )
    d2 = (
        d1.join(sym, d1.node == sym.a)
        .select("seed", F.col("b").alias("node"))
        .distinct()
    )
    d3 = (
        d2.join(sym, d2.node == sym.a)
        .select("seed", F.col("b").alias("node"))
        .distinct()
    )
    dist = (
        d1.withColumn("d", F.lit(1))
        .unionByName(d2.withColumn("d", F.lit(2)))
        .unionByName(d3.withColumn("d", F.lit(3)))
        .filter(F.col("node") != F.col("seed"))
        .groupBy("seed", "node")
        .agg(F.min("d").alias("d"))
    )
    return (
        dist.groupBy("seed")
        .agg(
            F.count("*").cast("bigint").alias("n_reached_3"),
            F.sum(F.expr("1000000 div d")).cast("bigint").alias(
                "harmonic_e6"
            ),
        )
        .orderBy("seed")
    )


@staged(
    "q_markov_power",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS nxt
      FROM events
    ),
    m1 AS (
      SELECT event_type AS f, nxt AS t, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    m2 AS (
      SELECT a.f, b.t, CAST(SUM(a.c * b.c) AS BIGINT) AS c
      FROM m1 a JOIN m1 b ON a.t = b.f GROUP BY a.f, b.t
    ),
    m4 AS (
      SELECT a.f, b.t,
             CAST(SUM((a.c // 1000) * (b.c // 1000)) AS BIGINT) AS c
      FROM m2 a JOIN m2 b ON a.t = b.f GROUP BY a.f, b.t
    ),
    rows_tot AS (
      SELECT f, CAST(SUM(c) AS BIGINT) AS rowsum FROM m4 GROUP BY f
    )
    SELECT m.f AS from_state, m.t AS to_state, m.c AS w4,
           CAST(m.c AS DOUBLE) / CAST(r.rowsum AS DOUBLE) AS p4
    FROM m4 m JOIN rows_tot r ON r.f = m.f
    ORDER BY from_state, to_state
    """,
)
def q_markov_power(spark, sf_dir):
    """EXACT MARKOV CHAIN MATRIX POWER — 4-step transition structure
    via integer matrix squaring (M² then M⁴), the relational form of
    repeated squaring: where q_markov_transitions reads the 1-step
    counts, this reads where the chain CONCENTRATES after 4 steps —
    the mixing diagnostic (rows of M^k converging toward each other IS
    convergence to the stationary distribution), computed without a
    single float until the final row normalization. Each squaring is
    one equi-join on the inner state + one hash agg of count products;
    the M²→M⁴ step rescales entries by 1000 (integer div) first so
    products stay far inside BIGINT at any corpus size — the same
    overflow discipline as q_l_moments' split accumulator, applied as
    pre-scaling since only RATIOS survive normalization.

    At 100 TB: the raw volume dies in the 1-step count agg (states²
    rows — 25 here); both squarings act on the bounded state-space
    matrix. This is the |states|³ BSP matmul of q_sparse_matmul
    specialized to chain analysis."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.expr("unix_micros(ts)"), F.col("event_id")
    )
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    m1 = seq.groupBy(
        F.col("event_type").alias("f"), F.col("nxt").alias("t")
    ).agg(F.count("*").cast("bigint").alias("c"))
    a = m1.select(F.col("f"), F.col("t").alias("mid"), F.col("c").alias("ca"))
    b = m1.select(F.col("f").alias("mid"), F.col("t"), F.col("c").alias("cb"))
    m2 = (
        a.join(b, "mid")
        .groupBy("f", "t")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("c"))
    )
    a2 = m2.select(
        F.col("f"), F.col("t").alias("mid"), F.expr("c div 1000").alias("ca")
    )
    b2 = m2.select(
        F.col("f").alias("mid"), F.col("t"), F.expr("c div 1000").alias("cb")
    )
    m4 = (
        a2.join(b2, "mid")
        .groupBy("f", "t")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("c"))
    )
    rows_tot = m4.groupBy("f").agg(F.sum("c").cast("bigint").alias("rowsum"))
    return (
        m4.join(F.broadcast(rows_tot), "f")
        .select(
            F.col("f").alias("from_state"),
            F.col("t").alias("to_state"),
            F.col("c").alias("w4"),
            (F.col("c").cast("double") / F.col("rowsum").cast("double")).alias(
                "p4"
            ),
        )
        .orderBy("from_state", "to_state")
    )


@staged(
    "q_local_matching",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT
             LEAST(user_id % 41, (2 * user_id + event_id) % 41) AS a,
             GREATEST(user_id % 41, (2 * user_id + event_id) % 41) AS b,
             CAST(MIN(event_id) AS BIGINT) AS w
      FROM events
      WHERE user_id % 41 != (2 * user_id + event_id) % 41
      GROUP BY 1, 2
    ),
    r1_dom AS (
      SELECT e.a, e.b, e.w FROM raw e
      WHERE NOT EXISTS (
        SELECT 1 FROM raw o
        WHERE (o.a = e.a OR o.b = e.a OR o.a = e.b OR o.b = e.b)
          AND (o.w < e.w OR (o.w = e.w AND (o.a < e.a
               OR (o.a = e.a AND o.b < e.b))))
          AND NOT (o.a = e.a AND o.b = e.b)
      )
    ),
    rem1 AS (
      SELECT e.* FROM raw e
      WHERE NOT EXISTS (
        SELECT 1 FROM r1_dom m
        WHERE m.a IN (e.a, e.b) OR m.b IN (e.a, e.b)
      )
    ),
    r2_dom AS (
      SELECT e.a, e.b, e.w FROM rem1 e
      WHERE NOT EXISTS (
        SELECT 1 FROM rem1 o
        WHERE (o.a = e.a OR o.b = e.a OR o.a = e.b OR o.b = e.b)
          AND (o.w < e.w OR (o.w = e.w AND (o.a < e.a
               OR (o.a = e.a AND o.b < e.b))))
          AND NOT (o.a = e.a AND o.b = e.b)
      )
    ),
    rem2 AS (
      SELECT e.* FROM rem1 e
      WHERE NOT EXISTS (
        SELECT 1 FROM r2_dom m
        WHERE m.a IN (e.a, e.b) OR m.b IN (e.a, e.b)
      )
    ),
    r3_dom AS (
      SELECT e.a, e.b, e.w FROM rem2 e
      WHERE NOT EXISTS (
        SELECT 1 FROM rem2 o
        WHERE (o.a = e.a OR o.b = e.a OR o.a = e.b OR o.b = e.b)
          AND (o.w < e.w OR (o.w = e.w AND (o.a < e.a
               OR (o.a = e.a AND o.b < e.b))))
          AND NOT (o.a = e.a AND o.b = e.b)
      )
    ),
    matched AS (
      SELECT a, b, w, 1 AS round FROM r1_dom
      UNION ALL SELECT a, b, w, 2 FROM r2_dom
      UNION ALL SELECT a, b, w, 3 FROM r3_dom
    )
    SELECT CAST(round AS INT) AS round,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(SUM(w) AS BIGINT) AS weight_sum
    FROM matched GROUP BY round ORDER BY round
    """,
)
def q_local_matching(spark, sf_dir):
    """PARALLEL MAXIMAL MATCHING by locally-dominant edges — the
    BSP answer to greedy matching's inherent sequentiality (the ER /
    record-linkage assignment step at cluster scale): an edge is
    LOCALLY DOMINANT iff it is the minimum-priority edge incident to
    BOTH its endpoints (priority = (weight, a, b), a total order so
    rounds are deterministic); all dominant edges match simultaneously
    (they cannot conflict — each endpoint admits one minimum),
    matched endpoints drop out, repeat. Three unrolled rounds, each:
    one per-endpoint MIN aggregation (the edge list exploded to its
    two endpoint rows), one join back, one anti-join to shrink the
    remainder — no sequential scan anywhere, the Hoepman/Preis
    algorithm shape. The greedy-by-priority sequential matching and
    the locally-dominant parallel matching produce the SAME edge set
    (the witness pins this identity); the oracle finds dominant edges
    by NOT EXISTS instead — an independent formulation.

    At 100 TB: per round two shuffles keyed on endpoint, fan-out
    2·|E| endpoint rows; rounds needed grow slowly (expected
    O(log n)); three suffice for this graph (witness asserts the
    remainder is edge-free or unmatched-only)."""
    ev = _t(spark, sf_dir, "events")
    u = F.col("user_id") % 41
    v = (2 * F.col("user_id") + F.col("event_id")) % 41
    edges = (
        ev.filter(u != v)
        .groupBy(
            F.least(u, v).alias("a"), F.greatest(u, v).alias("b")
        )
        .agg(F.min("event_id").cast("bigint").alias("w"))
    )

    def one_round(es):
        ends = es.select(
            F.col("a").alias("node"), "a", "b", "w"
        ).unionByName(es.select(F.col("b").alias("node"), "a", "b", "w"))
        best = ends.groupBy("node").agg(
            F.min(F.struct("w", "a", "b")).alias("m")
        )
        dom = (
            es.join(
                best.select(
                    F.col("node").alias("a"),
                    F.col("m").alias("ma"),
                ),
                "a",
            )
            .join(
                best.select(
                    F.col("node").alias("b"),
                    F.col("m").alias("mb"),
                ),
                "b",
            )
            .filter(
                (F.col("ma") == F.struct("w", "a", "b"))
                & (F.col("mb") == F.struct("w", "a", "b"))
            )
            .select("a", "b", "w")
        )
        used = dom.select(F.col("a").alias("node")).unionByName(
            dom.select(F.col("b").alias("node"))
        )
        rem = (
            es.join(used.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(used.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b", "w")
        )
        return dom, rem

    matched = None
    rem = edges
    for rnd in (1, 2, 3):
        dom, rem = one_round(rem)
        tagged = dom.withColumn("round", F.lit(rnd).cast("int"))
        matched = tagged if matched is None else matched.unionByName(tagged)
    return (
        matched.groupBy("round")
        .agg(
            F.count("*").cast("bigint").alias("n_matched"),
            F.sum("w").cast("bigint").alias("weight_sum"),
        )
        .orderBy("round")
    )


@staged(
    "q_business_days",
    oracle="""
    WITH lags AS (
      SELECT o.o_orderpriority AS priority,
             CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT)
               AS d1,
             CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT)
               AS d2
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ),
    counted AS (
      SELECT priority,
             ((d2 // 7) * 5 + CASE d2 % 7 WHEN 0 THEN 0 WHEN 1 THEN 1
                WHEN 2 THEN 1 WHEN 3 THEN 1 WHEN 4 THEN 2
                WHEN 5 THEN 3 ELSE 4 END)
             - ((d1 // 7) * 5 + CASE d1 % 7 WHEN 0 THEN 0 WHEN 1 THEN 1
                WHEN 2 THEN 1 WHEN 3 THEN 1 WHEN 4 THEN 2
                WHEN 5 THEN 3 ELSE 4 END)
               AS bdays
      FROM lags
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(bdays) AS BIGINT) AS bdays_sum,
           CAST(MIN(bdays) AS BIGINT) AS bdays_min,
           CAST(MAX(bdays) AS BIGINT) AS bdays_max,
           CAST(SUM(bdays) AS DOUBLE) / COUNT(*) AS bdays_avg
    FROM counted GROUP BY priority ORDER BY priority
    """,
)
def q_business_days(spark, sf_dir):
    """BUSINESS-DAY ARITHMETIC (NETWORKDAYS) in closed form — the
    order-to-ship lead time every fulfillment SLA is written in,
    computed WITHOUT a calendar-table join: with day numbers on the
    epoch-day lattice (epoch day 0 = Thursday; residues {1, 2} of
    d mod 7 are the weekend), the weekday count below any day D is the
    PREFIX FORM f(D) = (D div 7)·5 + prefix(D mod 7) with the 7-entry
    prefix table of the weekday pattern, and the count in [d1, d2) is
    simply f(d2) − f(d1) — the difference of two lattice lookups, no
    boundary clamps to get wrong (the first cut of this query tried
    the clamp form and the brute-force witness caught it off by the
    weekend-endpoint cases). Pure integer expressions — the mechanism
    is the closed form itself,
    the alternative to exploding a date spine per row (q_calendar_dim
    is the spine approach; this is the O(1)-per-row one).

    The witness re-counts weekdays by brute-force day iteration per
    pair, pinning the closed form. At 100 TB: one equi-join +
    codegen arithmetic + one agg; no spine, no fan-out."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lags = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.expr(
                "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS BIGINT)"
            ).alias("d1"),
            F.expr(
                "CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000 AS BIGINT)"
            ).alias("d2"),
        )
    )
    prefix = (
        "CASE {d} % 7 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1"
        " WHEN 3 THEN 1 WHEN 4 THEN 2 WHEN 5 THEN 3 ELSE 4 END"
    )
    counted = lags.select(
        "priority",
        F.expr(
            f"((d2 div 7) * 5 + {prefix.format(d='d2')})"
            f" - ((d1 div 7) * 5 + {prefix.format(d='d1')})"
        ).alias("bdays"),
    )
    return (
        counted.groupBy("priority")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("bdays").cast("bigint").alias("bdays_sum"),
            F.min("bdays").cast("bigint").alias("bdays_min"),
            F.max("bdays").cast("bigint").alias("bdays_max"),
            (
                F.sum("bdays").cast("double") / F.count("*")
            ).alias("bdays_avg"),
        )
        .orderBy("priority")
    )


@staged(
    "q_hill_tail_index",
    oracle="""
    WITH vals AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events WHERE value > 0
    ),
    ranked AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type
               ORDER BY x DESC, x) AS rk
      FROM vals
    ),
    topk AS (SELECT event_type, x, rk FROM ranked WHERE rk <= 51),
    xk AS (
      SELECT event_type, x AS x_k FROM topk WHERE rk = 51
    ),
    terms AS (
      SELECT t.event_type,
             CAST(floor(ln(CAST(t.x AS DOUBLE) / CAST(k.x_k AS DOUBLE))
               * 1000000000.0 + 0.5) AS BIGINT) AS nano
      FROM topk t JOIN xk k ON k.event_type = t.event_type
      WHERE t.rk <= 50
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS k_used,
           CAST(SUM(nano) AS BIGINT) AS hill_sum_nano,
           CAST(SUM(nano) AS BIGINT) / (COUNT(*) * 1000000000.0)
             AS hill_gamma,
           1000000000.0 * COUNT(*) / CAST(SUM(nano) AS DOUBLE)
             AS tail_alpha
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
)
def q_hill_tail_index(spark, sf_dir):
    """HILL TAIL-INDEX ESTIMATOR per key — the heavy-tail diagnostic
    of risk and capacity planning (is the value distribution
    power-law, and with what exponent? α < 2 means infinite variance
    and all mean-based dashboards lie): γ̂ = (1/k)·Σ ln(x_(i)/x_(k+1))
    over the top k = 50 order statistics, α̂ = 1/γ̂. The order
    statistics come from one per-key rank window (WindowGroupLimit
    prunes the scan to the top 51); each log term collapses to the
    1e-9 integer lattice BEFORE the sum (q_entropy discipline), so the
    estimator is a ratio of exact integers, floats only at the
    γ̂/α̂ readout.

    At 100 TB: the rank window's top-k heap ships only 51 rows per
    key (asserted at the SQLMetrics level for the q_topk family);
    everything downstream is bounded at keys × 51."""
    ev = _t(spark, sf_dir, "events")
    vals = ev.filter(F.col("value") > 0).select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("x"))
    ranked = vals.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 51
    )
    xk = ranked.filter(F.col("rk") == 51).select(
        "event_type", F.col("x").alias("x_k")
    )
    terms = (
        ranked.filter(F.col("rk") <= 50)
        .join(F.broadcast(xk), "event_type")
        .select(
            "event_type",
            F.floor(
                F.log(
                    F.col("x").cast("double") / F.col("x_k").cast("double")
                )
                * F.lit(1000000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("nano"),
        )
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("k_used"),
            F.sum("nano").cast("bigint").alias("hill_sum_nano"),
        )
        .select(
            "event_type",
            "k_used",
            "hill_sum_nano",
            (
                F.col("hill_sum_nano")
                / (F.col("k_used") * F.lit(1000000000.0))
            ).alias("hill_gamma"),
            (
                F.lit(1000000000.0)
                * F.col("k_used")
                / F.col("hill_sum_nano").cast("double")
            ).alias("tail_alpha"),
        )
        .orderBy("event_type")
    )


@staged(
    "q_fiscal_445",
    oracle="""
    WITH days AS (
      SELECT epoch_us(ts) // 86400000000 - 19723 AS fd, value
      FROM events
    ),
    mapped AS (
      SELECT fd // 7 AS wk,
             (fd // 7) // 13 AS fq,
             CASE WHEN (fd // 7) % 13 < 4 THEN 1
                  WHEN (fd // 7) % 13 < 8 THEN 2
                  ELSE 3 END AS period_in_q,
             value
      FROM days
    )
    SELECT CAST(fq AS BIGINT) AS fiscal_quarter,
           CAST(period_in_q AS INT) AS period_in_quarter,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT wk) AS BIGINT) AS n_weeks,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents_sum
    FROM mapped GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_fiscal_445(spark, sf_dir):
    """4-4-5 FISCAL CALENDAR mapping — the retail/finance reporting
    calendar (every quarter = 13 weeks split 4+4+5 so periods compare
    like-for-like across years, unlike Gregorian months): event
    timestamps map to (fiscal week, quarter, period) by pure integer
    division on the epoch-day lattice (fiscal epoch = 2024-01-01, a
    Monday, day 19723), then one rollup per period. The mechanism is
    the closed-form calendar arithmetic — no date-dimension join, the
    same spine-free discipline as q_business_days; week = fd div 7,
    quarter = week div 13, period by the 4/8 residue split.

    At 100 TB: codegen arithmetic + one map-side-combined agg; the
    COUNT(DISTINCT wk) audit column certifies each period really holds
    4 or 5 distinct weeks (the calendar's defining property — the
    witness asserts it)."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        F.expr(
            "unix_micros(ts) div 86400000000 - 19723"
        ).alias("fd"),
        "value",
    )
    mapped = days.select(
        F.expr("fd div 7").alias("wk"),
        F.expr("(fd div 7) div 13").alias("fq"),
        F.expr(
            "CASE WHEN (fd div 7) % 13 < 4 THEN 1"
            " WHEN (fd div 7) % 13 < 8 THEN 2 ELSE 3 END"
        ).alias("period_in_q"),
        "value",
    )
    return (
        mapped.groupBy(
            F.col("fq").cast("bigint").alias("fiscal_quarter"),
            F.col("period_in_q").cast("int").alias("period_in_quarter"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("wk").cast("bigint").alias("n_weeks"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents_sum"),
        )
        .orderBy("fiscal_quarter", "period_in_quarter")
    )


@staged(
    "q_dup_invoice",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             epoch_us(o_orderdate) // 86400000000 AS d
      FROM orders
    ),
    inv AS (
      SELECT o_orderkey, o_custkey, cents, d FROM base
      UNION ALL
      SELECT o_orderkey + 1000000000, o_custkey, cents, d + 3
      FROM base WHERE o_orderkey % 40 = 0
    ),
    pairs AS (
      SELECT a.o_custkey AS custkey,
             a.cents, abs(a.d - b.d) AS day_gap
      FROM inv a JOIN inv b
        ON a.o_custkey = b.o_custkey AND a.cents = b.cents
       AND a.o_orderkey < b.o_orderkey
      WHERE abs(a.d - b.d) <= 7
    )
    SELECT custkey,
           CAST(COUNT(*) AS BIGINT) AS n_suspect_pairs,
           CAST(MIN(day_gap) AS BIGINT) AS min_day_gap,
           CAST(SUM(cents) AS BIGINT) AS exposure_cents
    FROM pairs GROUP BY custkey ORDER BY custkey
    """,
)
def q_dup_invoice(spark, sf_dir):
    """DUPLICATE-INVOICE DETECTION — the accounts-payable fraud/error
    sweep (double billing is the classic AP leak): two postings from
    the same customer with the IDENTICAL amount within 7 days are a
    suspect pair. The fixture's random prices never collide (verified
    at all three SFs), so the feed PLANTS the pathology
    deterministically — every 40th order is re-posted 3 days later
    under a shifted key, the retry-double-post shape — and the
    detector must recover exactly the planted pairs (the witness
    asserts the recovered set ≡ the plant; the same planted-trap
    discipline as q_ua_parse's Safari trap and q_span_f1's boundary
    drift).

    The blocking key is (custkey, exact cents) — an EQUI-join, so
    candidate volume is Σ multiplicity² per (customer, amount) cell,
    orders of magnitude below a customer-only block; the ±7-day window
    is a residual filter on already-blocked pairs, not a range join.
    Exact cents (never float equality on money) and epoch-day integers
    end-to-end. At 100 TB: the dedup-blocking discipline
    (q_phonetic_blocking, q_er_score) on the numeric+temporal domain."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000"
        ).alias("d"),
    )
    inv = base.unionByName(
        base.filter(F.col("o_orderkey") % 40 == 0).select(
            (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
            "o_custkey",
            "cents",
            (F.col("d") + 3).alias("d"),
        )
    )
    a = inv.alias("a")
    b = inv.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter(F.abs(F.col("a.d") - F.col("b.d")) <= 7)
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.cents").alias("cents"),
            F.abs(F.col("a.d") - F.col("b.d")).alias("day_gap"),
        )
    )
    return (
        pairs.groupBy("custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_suspect_pairs"),
            F.min("day_gap").cast("bigint").alias("min_day_gap"),
            F.sum("cents").cast("bigint").alias("exposure_cents"),
        )
        .orderBy("custkey")
    )


@staged(
    "q_wilcoxon_signed",
    oracle="""
    WITH seq AS (
      SELECT event_type, user_id,
             CAST(round(value * 100) AS BIGINT) AS y,
             row_number() OVER (PARTITION BY event_type, user_id
               ORDER BY epoch_us(ts), event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
      FROM events
    ),
    paired AS (
      SELECT event_type, user_id,
             MAX(CASE WHEN rn_d = 1 THEN y END)
             - MAX(CASE WHEN rn_a = 1 THEN y END) AS d
      FROM seq GROUP BY event_type, user_id
      HAVING COUNT(*) >= 2
    ),
    nz AS (
      SELECT event_type, user_id, d, abs(d) AS ad
      FROM paired WHERE d != 0
    ),
    ranked AS (
      SELECT x.event_type, x.d,
             (SELECT COUNT(*) FROM nz o
              WHERE o.event_type = x.event_type AND o.ad < x.ad)
             + (SELECT COUNT(*) FROM nz o
                WHERE o.event_type = x.event_type AND o.ad <= x.ad)
             + 1 AS midrank2
      FROM nz x
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN d > 0 THEN midrank2 ELSE 0 END)
             AS BIGINT) AS w_plus_x2,
           CAST(SUM(midrank2) AS BIGINT) AS w_total_x2
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
)
def q_wilcoxon_signed(spark, sf_dir):
    """WILCOXON SIGNED-RANK statistic per event type — the paired
    nonparametric test (q_rank_sum is the UNpaired Mann-Whitney
    cousin): each user's paired observation is (first event, last
    event) of the type, d = last − first on the cents lattice, zero
    differences drop (the test's own rule), and W+ = Σ ranks of
    positive d over |d|-ranks WITH AVERAGE-RANK TIES. The tie-exact
    trick: 2·midrank = |{|d'| < |d|}| + |{|d'| ≤ |d|}| + 1 (the
    rank-by-counting identity, integer on the ×2 lattice — no .5
    floats), so W+ and the total ΣR are exact integers; the invariant
    w_total_x2 = n(n+1) (Σ of all midranks doubled) is the built-in
    checksum the witness asserts.

    Spark computes the counting ranks via two aggregation-joins on the
    (type, |d|) histogram — no correlated subquery, no per-row scan:
    |{< x}| and |{≤ x}| come from one cumulative window over the
    bounded distinct-|d| domain per type.

    At 100 TB: the pairing collapses raw events to one row per
    (type, user) in a single agg; everything after acts on that
    reduction."""
    ev = _t(spark, sf_dir, "events")
    w_a = Window.partitionBy("event_type", "user_id").orderBy(
        F.expr("unix_micros(ts)"), F.col("event_id")
    )
    w_d = Window.partitionBy("event_type", "user_id").orderBy(
        F.expr("unix_micros(ts) * -1"), F.col("event_id").desc()
    )
    seq = ev.select(
        "event_type",
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("y"),
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    paired = (
        seq.groupBy("event_type", "user_id")
        .agg(
            (
                F.max(F.when(F.col("rn_d") == 1, F.col("y")))
                - F.max(F.when(F.col("rn_a") == 1, F.col("y")))
            ).alias("d"),
            F.count("*").alias("k"),
        )
        .filter((F.col("k") >= 2) & (F.col("d") != 0))
        .select("event_type", "d", F.abs("d").alias("ad"))
    )
    hist = paired.groupBy("event_type", "ad").agg(
        F.count("*").alias("c"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("c_pos"),
    )
    wh = Window.partitionBy("event_type").orderBy("ad")
    cum = hist.select(
        "event_type",
        "ad",
        "c",
        "c_pos",
        F.coalesce(
            F.sum("c").over(
                wh.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("lt"),
        F.sum("c")
        .over(wh.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("le"),
    )
    # midrank2 for every element of this |d| tie-group
    scored = cum.select(
        "event_type",
        (F.col("lt") + F.col("le") + 1).alias("midrank2"),
        "c",
        "c_pos",
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("n_pairs"),
            F.sum(F.col("midrank2") * F.col("c_pos"))
            .cast("bigint")
            .alias("w_plus_x2"),
            F.sum(F.col("midrank2") * F.col("c"))
            .cast("bigint")
            .alias("w_total_x2"),
        )
        .orderBy("event_type")
    )


@staged(
    "q_tiered_billing",
    oracle="""
    WITH usage AS (
      SELECT user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS units
      FROM events GROUP BY user_id
    ),
    tiers AS (
      SELECT * FROM (VALUES
        (1, CAST(0 AS BIGINT),       CAST(500000 AS BIGINT),  10),
        (2, CAST(500000 AS BIGINT),  CAST(2000000 AS BIGINT),  7),
        (3, CAST(2000000 AS BIGINT), CAST(9223372036854775807 AS BIGINT), 4)
      ) AS t(tier, lo, hi, rate_milli)
    ),
    charges AS (
      SELECT u.user_id, u.units, t.tier,
             GREATEST(LEAST(u.units, t.hi) - t.lo, 0) AS tier_units,
             GREATEST(LEAST(u.units, t.hi) - t.lo, 0) * t.rate_milli
               AS tier_milli
      FROM usage u CROSS JOIN tiers t
    )
    SELECT user_id, MAX(units) AS units,
           CAST(MAX(CASE WHEN tier_units > 0 THEN tier END) AS INT)
             AS top_tier,
           CAST(SUM(tier_milli) AS BIGINT) AS bill_milli,
           CAST(SUM(tier_milli) AS BIGINT)
             / CAST(MAX(units) AS DOUBLE) AS effective_rate_milli
    FROM charges GROUP BY user_id ORDER BY user_id
    """,
)
def q_tiered_billing(spark, sf_dir):
    """TIERED (progressive-bracket) BILLING — usage-based pricing with
    marginal rates, the metering readout every SaaS/cloud billing
    pipeline runs (and structurally the progressive tax bracket):
    units in [0, 5000) bill at 10 m$/unit, [5000, 20000) at 7, the
    rest at 4 — each user's charge is Σ over brackets of
    clamp(units, lo, hi)·rate, the MARGINAL form (crossing a tier
    boundary never makes the total bill jump — the witness asserts
    monotonicity + continuity on synthetic boundary probes). The
    bracket table is a 3-row broadcast; the clamp is
    GREATEST(LEAST(units, hi) − lo, 0) — pure integer lattice
    (centi-units × milli-rates), one division for the effective-rate
    readout.

    At 100 TB: one map-side-combined usage agg, a 3-row broadcast
    fan-out, one rollup — the canonical metering shape."""
    ev = _t(spark, sf_dir, "events")
    usage = ev.groupBy("user_id").agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("units")
    )
    tiers = spark.createDataFrame(
        [
            (1, 0, 500000, 10),
            (2, 500000, 2000000, 7),
            (3, 2000000, (1 << 63) - 1, 4),
        ],
        "tier int, lo bigint, hi bigint, rate_milli int",
    )
    charges = usage.crossJoin(F.broadcast(tiers)).select(
        "user_id",
        "units",
        "tier",
        F.greatest(
            F.least(F.col("units"), F.col("hi")) - F.col("lo"), F.lit(0)
        ).alias("tier_units"),
        (
            F.greatest(
                F.least(F.col("units"), F.col("hi")) - F.col("lo"),
                F.lit(0),
            )
            * F.col("rate_milli")
        ).alias("tier_milli"),
    )
    return (
        charges.groupBy("user_id")
        .agg(
            F.max("units").alias("units"),
            F.max(F.when(F.col("tier_units") > 0, F.col("tier")))
            .cast("int")
            .alias("top_tier"),
            F.sum("tier_milli").cast("bigint").alias("bill_milli"),
        )
        .select(
            "user_id",
            "units",
            "top_tier",
            "bill_milli",
            (
                F.col("bill_milli") / F.col("units").cast("double")
            ).alias("effective_rate_milli"),
        )
        .orderBy("user_id")
    )


@staged(
    "q_lsh_tuning_curve",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x != '') AS tk
      FROM documents
    ),
    sigs AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(CASE WHEN len(tk) >= 3 THEN
               list_transform(generate_series(1, len(tk) - 2),
                 i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
             ELSE [] END) AS sh
      FROM t
    ),
    ne AS MATERIALIZED (SELECT doc_id, sh FROM sigs WHERE len(sh) > 0),
    pairs AS MATERIALIZED (
      SELECT CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / CAST(len(a.sh) + len(b.sh)
                      - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               AS s
      FROM ne a JOIN ne b ON a.doc_id < b.doc_id
      WHERE 5 * len(list_intersect(a.sh, b.sh)) >= len(a.sh) + len(b.sh)
    ),
    configs AS (
      SELECT * FROM (VALUES
        (1, 16), (2, 8), (4, 4), (8, 2), (16, 1)) AS c(r, b)
    ),
    scored AS (
      SELECT c.r, c.b,
             CAST(floor((1.0 - power(1.0 - power(p.s, c.r), c.b))
               * 1000000000.0 + 0.5) AS BIGINT) AS hit_nano
      FROM pairs p CROSS JOIN configs c
    )
    SELECT r, b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(hit_nano) AS BIGINT) AS recall_sum_nano,
           CAST(SUM(hit_nano) AS BIGINT)
             / (COUNT(*) * 1000000000.0) AS expected_recall
    FROM scored GROUP BY r, b ORDER BY r
    """,
)
def q_lsh_tuning_curve(spark, sf_dir):
    """LSH BANDING S-CURVE TUNING — which (rows r, bands b) split of a
    16-permutation MinHash budget should the dedup pipeline run? For a
    pair at Jaccard s, banded LSH finds it with probability
    1 − (1 − s^r)^b; sweeping the five budget-preserving configs over
    the corpus's ACTUAL qualifying-pair similarity distribution (the
    prefix-filtered exact pair relation at the policy floor, shared
    machinery with q_dedup_threshold_sweep) turns the textbook S-curve
    into a data-driven expected-recall table — the choice between
    (4,4) and (2,8) is exactly what q_lsh_recall later audits
    empirically. The powers are INTEGER exponents, so both engines
    evaluate the same repeated-multiplication tree (no libm pow
    divergence: s^r with r ∈ {1,2,4,8,16} is exact double
    multiplication), and each per-pair hit probability collapses to
    the 1e-9 lattice BEFORE averaging.

    At 100 TB: the pair relation is the cost (shared, prefix-blocked);
    the sweep is a 5-row broadcast fan-out + one agg."""
    docs = _t(spark, sf_dir, "documents")
    pairs = track_persist(dd.prefix_filtered_pairs(docs, 1, 5)).select(
        F.col("jaccard").alias("s")
    )
    configs = spark.createDataFrame(
        [(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)], "r int, b int"
    )
    scored = pairs.crossJoin(F.broadcast(configs)).select(
        "r",
        "b",
        F.floor(
            (
                F.lit(1.0)
                - F.pow(
                    F.lit(1.0) - F.pow(F.col("s"), F.col("r")),
                    F.col("b"),
                )
            )
            * F.lit(1000000000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("hit_nano"),
    )
    return (
        scored.groupBy("r", "b")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("hit_nano").cast("bigint").alias("recall_sum_nano"),
        )
        .select(
            "r",
            "b",
            "n_pairs",
            "recall_sum_nano",
            (
                F.col("recall_sum_nano")
                / (F.col("n_pairs") * F.lit(1000000000.0))
            ).alias("expected_recall"),
        )
        .orderBy("r")
    )


@staged(
    "q_churn_labels",
    oracle="""
    WITH cutoff AS (
      SELECT TIMESTAMP '2024-01-21 00:00:00' AS t_cut,
             TIMESTAMP '2024-01-31 00:00:00' AS t_end
    ),
    feats AS (
      SELECT e.user_id,
             CAST(COUNT(*) AS BIGINT) AS n_before,
             CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
               AS cents_before,
             CAST(MAX(epoch_us(e.ts)) AS BIGINT) AS last_seen_us,
             CAST((SELECT epoch_us(t_cut) FROM cutoff)
                  - MAX(epoch_us(e.ts)) AS BIGINT) AS recency_us
      FROM events e
      WHERE e.ts < (SELECT t_cut FROM cutoff)
      GROUP BY e.user_id
    ),
    labels AS (
      SELECT f.user_id, f.n_before, f.cents_before, f.recency_us,
             CAST(CASE WHEN EXISTS (
               SELECT 1 FROM events a, cutoff c
               WHERE a.user_id = f.user_id
                 AND a.ts >= c.t_cut AND a.ts < c.t_end
             ) THEN 0 ELSE 1 END AS INT) AS churned
      FROM feats f
    )
    SELECT * FROM labels ORDER BY user_id
    """,
)
def q_churn_labels(spark, sf_dir):
    """CHURN LABEL CONSTRUCTION — the training-set builder every churn
    model starts from, with the point-in-time discipline made
    structural: features (activity count, spend, recency) computed
    STRICTLY before the cutoff (one filtered scan — nothing after
    t_cut can reach a feature column, the leakage q_pit_audit hunts
    for), label = no activity in the [cutoff, horizon) observation
    window (left-anti semantics). Recency on the integer microsecond
    lattice; spend in exact cents.

    At 100 TB: one pre-cutoff agg + one post-cutoff distinct +
    left-anti join — the label window scan is cheap because the
    predicate pushes to the partition level when events are
    dt-partitioned (the layout operators' case for date clustering)."""
    ev = _t(spark, sf_dir, "events")
    t_cut = F.lit("2024-01-21 00:00:00").cast("timestamp")
    t_end = F.lit("2024-01-31 00:00:00").cast("timestamp")
    feats = (
        ev.filter(F.col("ts") < t_cut)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_before"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents_before"),
            F.max(F.expr("unix_micros(ts)")).cast("bigint").alias(
                "last_seen_us"
            ),
        )
        .withColumn(
            "recency_us",
            (
                F.unix_micros(t_cut) - F.col("last_seen_us")
            ).cast("bigint"),
        )
    )
    active_after = (
        ev.filter((F.col("ts") >= t_cut) & (F.col("ts") < t_end))
        .select("user_id")
        .distinct()
        .withColumn("act", F.lit(1))
    )
    return (
        feats.join(active_after, "user_id", "left")
        .select(
            "user_id",
            "n_before",
            "cents_before",
            "recency_us",
            F.when(F.col("act").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("churned"),
        )
        .orderBy("user_id")
    )
