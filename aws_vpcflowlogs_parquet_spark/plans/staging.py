"""Staging catalog — queries built ahead of the external driver's
50-pending-per-round verification capacity, held out of ``queries()``
until the queue drains.

Round-12 status: **empty — all 19 round-11-staged queries were promoted
into the §2.3 catalog** (r11 VERDICT item 1): q_retry_backoff_conformance,
q_krippendorff_alpha, q_join_order_plan, q_newsvendor, q_pinball_eval,
q_rrf_fusion, q_spc_control_chart, q_kendall_w, q_harmonic_centrality,
q_markov_power, q_local_matching, q_business_days, q_hill_tail_index,
q_fiscal_445, q_dup_invoice, q_wilcoxon_signed, q_tiered_billing,
q_lsh_tuning_curve and q_churn_labels each moved verbatim (oracle
included) with ``@staged`` -> ``@register``; their independent-witness
tests (tests/test_round11_staging_witness.py) and plan pins now point at
the catalog registry.

The staging machinery (``@staged``, ``STAGED_QUERIES``/``STAGED_ORACLES``,
the oracle gate in tests/test_staging_oracle.py) stays armed for any
future round that would overrun the driver's 50-pending-per-round cap:
move the ``@staged`` block to catalog.py, switch the decorator to
``@register``, add the SURVEY §2.3 row, confirm pending <= 50, re-run the
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
# Round-12 staged batch — built past the driver's 50-pending cap
# (45 pending after the round-12 catalog batches); promotion target:
# round 13. Same contract as catalog.py: exact DuckDB oracle at
# sf0.001 AND sf0.01 (tests/test_staging_oracle.py), pure-Python
# witnesses (tests/test_round12_staging_witness.py), plan pins.
# =====================================================================

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ..caching import track_persist  # noqa: E402
from ..sources.tables import load_table  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@staged(
    "q_turning_points",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    lagged AS (
      SELECT event_type, x,
             lag(x) OVER (PARTITION BY event_type ORDER BY d) AS prev,
             lead(x) OVER (PARTITION BY event_type ORDER BY d) AS nxt
      FROM daily
    ),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
               AND ((x > prev AND x > nxt) OR (x < prev AND x < nxt))
               THEN 1 ELSE 0 END) AS BIGINT) AS t_count
      FROM lagged GROUP BY event_type
    )
    SELECT event_type, n, t_count,
           (CAST(t_count AS DOUBLE) - 2.0 * CAST(n - 2 AS DOUBLE) / 3.0)
             / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0) AS zstat
    FROM agg ORDER BY event_type
    """,
)
def q_turning_points(spark, sf_dir):
    """TURNING-POINTS randomness test per key — does the daily series
    alternate like noise, or is it smoother/rougher than chance (the
    cheapest IID screen next to q_runs_test's sign runs): count strict
    local extrema T; under IID, E[T] = 2(n-2)/3, Var = (16n-29)/90.
    The count is decided entirely in BIGINT on the daily exact-cents
    lattice (strict inequalities, so ties never count a spurious
    extremum); z is one identical float chain. One lag + one lead on
    ONE (key, day) window. At 100 TB: the daily agg kills raw
    volume."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x").over(w).alias("prev"),
        F.lead("x").over(w).alias("nxt"),
    )
    is_tp = (
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (
            ((F.col("x") > F.col("prev")) & (F.col("x") > F.col("nxt")))
            | ((F.col("x") < F.col("prev")) & (F.col("x") < F.col("nxt")))
        )
    )
    agg = lagged.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(is_tp, 1).otherwise(0)).cast("bigint").alias("t_count"),
    )
    z = (
        F.col("t_count").cast("double")
        - 2.0 * (F.col("n") - 2).cast("double") / 3.0
    ) / F.sqrt((16.0 * F.col("n").cast("double") - 29.0) / 90.0)
    return agg.select(
        "event_type", "n", "t_count", z.alias("zstat")
    ).orderBy("event_type")


@staged(
    "q_ar1_unit_root",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               // 1024 AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    pairs AS (
      SELECT event_type, x AS y,
             lag(x) OVER (PARTITION BY event_type ORDER BY d) AS xl
      FROM daily
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xl) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(xl * xl) AS BIGINT) AS sxx,
             CAST(SUM(xl * y) AS BIGINT) AS sxy
      FROM pairs WHERE xl IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n AS n_pairs,
           CAST(n * sxy - sx * sy AS BIGINT) AS rho_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS rho_den,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS rho
    FROM sums ORDER BY event_type
    """,
)
def q_ar1_unit_root(spark, sf_dir):
    """AR(1) PERSISTENCE per key — the unit-root screen (rho near 1
    means shocks persist and the series needs differencing before any
    q_trend_ols / q_holt_smoothing-style model): regress x_t on
    x_{t-1} with intercept; rho = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2), both
    sides exact BIGINT on the quantized daily lattice (the q_ljung_box
    discipline — numerator and denominator are reported as the exact
    integers the division reads from). One lag window + one aggregate.
    At 100 TB: bounded daily domain per key."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            " div 1024"
        ).alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    pairs = daily.select(
        "event_type",
        F.col("x").alias("y"),
        F.lag("x").over(w).alias("xl"),
    ).filter(F.col("xl").isNotNull())
    sums = pairs.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xl").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("xl") * F.col("xl")).cast("bigint").alias("sxx"),
        F.sum(F.col("xl") * F.col("y")).cast("bigint").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "bigint"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "bigint"
    )
    return sums.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        num.alias("rho_num"),
        den.alias("rho_den"),
        (num.cast("double") / den.cast("double")).alias("rho"),
    ).orderBy("event_type")


@staged(
    "q_seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE))
               % 7 AS INT) AS dow,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    parts AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS q,
             CAST(SUM(CASE WHEN dow = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ng0,
             CAST(SUM(CASE WHEN dow = 0 THEN x ELSE 0 END) AS BIGINT) AS sg0,
             CAST(SUM(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ng1,
             CAST(SUM(CASE WHEN dow = 1 THEN x ELSE 0 END) AS BIGINT) AS sg1,
             CAST(SUM(CASE WHEN dow = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ng2,
             CAST(SUM(CASE WHEN dow = 2 THEN x ELSE 0 END) AS BIGINT) AS sg2,
             CAST(SUM(CASE WHEN dow = 3 THEN 1 ELSE 0 END) AS BIGINT) AS ng3,
             CAST(SUM(CASE WHEN dow = 3 THEN x ELSE 0 END) AS BIGINT) AS sg3,
             CAST(SUM(CASE WHEN dow = 4 THEN 1 ELSE 0 END) AS BIGINT) AS ng4,
             CAST(SUM(CASE WHEN dow = 4 THEN x ELSE 0 END) AS BIGINT) AS sg4,
             CAST(SUM(CASE WHEN dow = 5 THEN 1 ELSE 0 END) AS BIGINT) AS ng5,
             CAST(SUM(CASE WHEN dow = 5 THEN x ELSE 0 END) AS BIGINT) AS sg5,
             CAST(SUM(CASE WHEN dow = 6 THEN 1 ELSE 0 END) AS BIGINT) AS ng6,
             CAST(SUM(CASE WHEN dow = 6 THEN x ELSE 0 END) AS BIGINT) AS sg6
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n,
           1.0 - (CAST(q AS DOUBLE) - ((CASE WHEN ng0 = 0 THEN 0.0 ELSE CAST(sg0 AS DOUBLE) * CAST(sg0 AS DOUBLE) / CAST(ng0 AS DOUBLE) END) + (CASE WHEN ng1 = 0 THEN 0.0 ELSE CAST(sg1 AS DOUBLE) * CAST(sg1 AS DOUBLE) / CAST(ng1 AS DOUBLE) END) + (CASE WHEN ng2 = 0 THEN 0.0 ELSE CAST(sg2 AS DOUBLE) * CAST(sg2 AS DOUBLE) / CAST(ng2 AS DOUBLE) END) + (CASE WHEN ng3 = 0 THEN 0.0 ELSE CAST(sg3 AS DOUBLE) * CAST(sg3 AS DOUBLE) / CAST(ng3 AS DOUBLE) END) + (CASE WHEN ng4 = 0 THEN 0.0 ELSE CAST(sg4 AS DOUBLE) * CAST(sg4 AS DOUBLE) / CAST(ng4 AS DOUBLE) END) + (CASE WHEN ng5 = 0 THEN 0.0 ELSE CAST(sg5 AS DOUBLE) * CAST(sg5 AS DOUBLE) / CAST(ng5 AS DOUBLE) END) + (CASE WHEN ng6 = 0 THEN 0.0 ELSE CAST(sg6 AS DOUBLE) * CAST(sg6 AS DOUBLE) / CAST(ng6 AS DOUBLE) END)))
             / (CAST(q AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE)) AS strength
    FROM parts ORDER BY event_type
    """,
)
def q_seasonal_strength(spark, sf_dir):
    """DAY-OF-WEEK SEASONALITY STRENGTH per key — the variance-
    explained readout (1 - SSE_within / SSE_total over dow groups,
    i.e. the R^2 of the weekly profile) that decides whether
    q_seasonal_baseline's dow model is worth applying. Exactness
    discipline: the dow domain is pinned to 7 FIXED conditional
    aggregates (dow from an anchor-date day-count mod 7 — NOT the
    engines' dayofweek(), whose week-start conventions differ), so
    the within-group term is a FIXED-ORDER 7-term float chain over
    exact BIGINT (n_g, s_g) cells — no order-sensitive float
    aggregation anywhere (the q_ewma fixed-taps discipline). At
    100 TB: one scan, 14 conditional aggregates + the daily
    pre-agg."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("d"),
    ).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("x")
    ).withColumn(
        "dow",
        (F.datediff(F.col("d"), F.lit("1995-01-01")) % 7).cast("int"),
    )
    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    ]
    for k in range(7):
        aggs.append(
            F.sum(F.when(F.col("dow") == k, 1).otherwise(0))
            .cast("bigint")
            .alias("ng%d" % k)
        )
        aggs.append(
            F.sum(F.when(F.col("dow") == k, F.col("x")).otherwise(0))
            .cast("bigint")
            .alias("sg%d" % k)
        )
    parts = daily.groupBy("event_type").agg(*aggs)
    within = None
    for k in range(7):
        term = F.when(F.col("ng%d" % k) == 0, 0.0).otherwise(
            F.col("sg%d" % k).cast("double")
            * F.col("sg%d" % k).cast("double")
            / F.col("ng%d" % k).cast("double")
        )
        within = term if within is None else within + term
    strength = 1.0 - (F.col("q").cast("double") - within) / (
        F.col("q").cast("double")
        - F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n").cast("double")
    )
    return parts.select(
        "event_type", "n", strength.alias("strength")
    ).orderBy("event_type")


_COHD = (
    "((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " / sqrt((("
    "CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    " / CAST(n1 AS DOUBLE)) + ("
    "CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"
    " / CAST(n2 AS DOUBLE)))"
    " / CAST(n1 + n2 - 2 AS DOUBLE)))"
)


@staged(
    "q_cohens_d",
    oracle=f"""
    WITH g AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    sums AS (
      SELECT
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
          AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN event_type = 'click' THEN x ELSE 0 END)
          AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN event_type = 'click' THEN x * x ELSE 0 END)
          AS BIGINT) AS q1,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS n2,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN x ELSE 0 END)
          AS BIGINT) AS s2,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN x * x ELSE 0 END)
          AS BIGINT) AS q2
      FROM g
    )
    SELECT n1, n2, {_COHD} AS cohens_d,
           {_COHD} * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0))
             AS hedges_g
    FROM sums
    """,
)
def q_cohens_d(spark, sf_dir):
    """COHEN'S D effect size (click vs purchase values) with the
    Hedges' g small-sample correction — the magnitude companion to
    q_ab_test's significance verdict (a significant-but-tiny effect
    and a huge-but-noisy one read the same p-value; d is what you
    size decisions on). Six exact BIGINT sufficient statistics in ONE
    conditional aggregate (single scan, no join); d and g are one
    shared readout expression text (the q_jarque_bera discipline).
    At 100 TB: the cheapest shape there is."""
    ev = _t(spark, sf_dir, "events")
    g = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("x")
    )
    is1 = F.col("event_type") == "click"
    is2 = F.col("event_type") == "purchase"
    sums = g.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(is1, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(is1, F.col("x") * F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("q1"),
        F.sum(F.when(is2, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(is2, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("s2"),
        F.sum(F.when(is2, F.col("x") * F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("q2"),
    )
    return sums.select(
        "n1",
        "n2",
        F.expr(_COHD).alias("cohens_d"),
        F.expr(
            f"{_COHD} * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE)"
            f" - 9.0))"
        ).alias("hedges_g"),
    )


_CPK_SIG = (
    "sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
    " / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))"
)


@staged(
    "q_process_capability",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      FROM events
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS q,
             CAST(SUM(CASE WHEN x > 45000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above,
             CAST(SUM(CASE WHEN x < 500 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_below
      FROM v GROUP BY event_type
    )
    SELECT event_type, n, n_above, n_below,
           (45000.0 - 500.0) / (6.0 * {_CPK_SIG}) AS cp,
           LEAST(45000.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE),
                 CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - 500.0)
             / (3.0 * {_CPK_SIG}) AS cpk
    FROM sums ORDER BY event_type
    """,
)
def q_process_capability(spark, sf_dir):
    """PROCESS CAPABILITY indices Cp / Cpk per key against fixed spec
    limits (USL = 450.00, LSL = 5.00) — the SPC readout that pairs
    with q_spc_control_chart's violation detection (the chart says
    out-of-CONTROL; Cp/Cpk say whether an in-control process even fits
    the SPEC): exact (n, S, Q) moments plus exact INTEGER out-of-spec
    counts (the lattice comparisons x > 45000 / x < 500 never touch a
    float) in one conditional aggregate; the index chains are one
    shared readout text. At 100 TB: one map-side-combined scan."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("x")
    )
    sums = v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
        F.sum(F.when(F.col("x") > 45000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_above"),
        F.sum(F.when(F.col("x") < 500, 1).otherwise(0))
        .cast("bigint")
        .alias("n_below"),
    )
    return sums.select(
        "event_type",
        "n",
        "n_above",
        "n_below",
        F.expr(f"(45000.0 - 500.0) / (6.0 * {_CPK_SIG})").alias("cp"),
        F.expr(
            f"LEAST(45000.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE),"
            f" CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - 500.0)"
            f" / (3.0 * {_CPK_SIG})"
        ).alias("cpk"),
    ).orderBy("event_type")


@staged(
    "q_cohort_ltv",
    oracle="""
    WITH om AS (
      SELECT o_custkey,
             CAST(date_diff('month', DATE '1995-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    first_m AS (
      SELECT o_custkey, MIN(m) AS cohort FROM om GROUP BY o_custkey
    ),
    ages AS (SELECT * FROM (VALUES (1), (3), (6), (12)) AS t(k)),
    cell AS (
      SELECT f.cohort, a.k, om.o_custkey,
             CAST(SUM(CASE WHEN om.m < f.cohort + a.k
               THEN om.cents ELSE 0 END) AS BIGINT) AS spend_k
      FROM om
      JOIN first_m f ON f.o_custkey = om.o_custkey
      CROSS JOIN ages a
      GROUP BY f.cohort, a.k, om.o_custkey
    )
    SELECT cohort, k,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(spend_k) AS BIGINT) AS total_cents,
           CAST(SUM(spend_k) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / 100.0 AS ltv_avg
    FROM cell GROUP BY cohort, k ORDER BY cohort, k
    """,
)
def q_cohort_ltv(spark, sf_dir):
    """COHORT LTV CURVE at fixed ages (1/3/6/12 months since first
    order) — the revenue companion to q_cohort_retention's activity
    triangle: per cohort month, the average cumulative spend within
    each age horizon. The fixed-age formulation needs NO dense month
    spine (a customer's k-month spend is one conditional sum against
    their own cohort start — a 4-row broadcast fan-out, the
    q_tiered_billing shape), months are anchor-based integer
    arithmetic (no engine week/month convention in sight), and
    everything is exact cents until the single readout division.
    At 100 TB: one scan + broadcast first-order frame."""
    o = _t(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (
            (F.year("o_orderdate") - 1995) * 12
            + F.month("o_orderdate")
            - 1
        )
        .cast("bigint")
        .alias("m"),
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    om = track_persist(om)
    first_m = om.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    ages = spark.createDataFrame([(1,), (3,), (6,), (12,)], "k int")
    cell = (
        om.join(first_m, "o_custkey")
        .crossJoin(F.broadcast(ages))
        .groupBy("cohort", "k", "o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.col("m") < F.col("cohort") + F.col("k"),
                    F.col("cents"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("spend_k")
        )
    )
    return (
        cell.groupBy("cohort", "k")
        .agg(
            F.count("*").cast("bigint").alias("n_cust"),
            F.sum("spend_k").cast("bigint").alias("total_cents"),
        )
        .select(
            "cohort",
            "k",
            "n_cust",
            "total_cents",
            (
                F.col("total_cents").cast("double")
                / F.col("n_cust").cast("double")
                / 100.0
            ).alias("ltv_avg"),
        )
        .orderBy("cohort", "k")
    )


@staged(
    "q_xyz_volatility",
    oracle="""
    WITH monthly AS (
      SELECT l_partkey % 500 AS pk,
             date_trunc('month', l_shipdate) AS m,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY l_partkey % 500,
             date_trunc('month', l_shipdate)
    ),
    stats AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS s,
             CAST(SUM(q * q) AS BIGINT) AS ss
      FROM monthly GROUP BY pk HAVING COUNT(*) >= 2
    ),
    classed AS (
      SELECT pk,
             CASE WHEN 4 * n * ss <= 5 * s * s THEN 'X'
                  WHEN n * ss <= 2 * s * s THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM stats
    )
    SELECT xyz_class, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM classed GROUP BY xyz_class ORDER BY xyz_class
    """,
)
def q_xyz_volatility(spark, sf_dir):
    """XYZ DEMAND-VOLATILITY CLASSIFICATION — the variability axis
    that pairs with q_abc_pareto's value axis in inventory planning
    (X = steady, Y = variable, Z = erratic, by coefficient of
    variation over active months): the class thresholds cv < 0.5 and
    cv < 1 are decided by EXACT integer cross-multiplication —
    cv^2 <= t^2  <=>  n*SS - S^2 <= t^2 * S^2  <=>  the all-BIGINT
    inequalities 4*n*SS <= 5*S^2 and n*SS <= 2*S^2 — so no float ever
    classifies a part. Raw lineitem dies in the monthly demand agg.
    Magnitude: n*SS <= 80 months * (SUM q)^2-scale ~ 1e13 at sf1.
    At 100 TB: two hash aggs, nothing else."""
    li = _t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        (F.col("l_partkey") % 500).alias("pk"),
        F.date_trunc("month", "l_shipdate").alias("m"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    stats = (
        monthly.groupBy("pk")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("q").cast("bigint").alias("s"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    cls = F.when(
        4 * F.col("n") * F.col("ss") <= 5 * F.col("s") * F.col("s"), "X"
    ).when(F.col("n") * F.col("ss") <= 2 * F.col("s") * F.col("s"), "Y").otherwise(
        "Z"
    )
    return (
        stats.select(cls.alias("xyz_class"))
        .groupBy("xyz_class")
        .agg(F.count("*").cast("bigint").alias("n_parts"))
        .orderBy("xyz_class")
    )


@staged(
    "q_stream_ewma",
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ),
    fold AS (
      SELECT user_id, rn, x AS e FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, (3 * s.x + 7 * f.e) // 10
      FROM fold f
      JOIN seq s ON s.user_id = f.user_id AND s.rn = f.rn + 1
    ),
    last_rn AS (
      SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n_events
      FROM seq GROUP BY user_id
    )
    SELECT l.user_id, l.n_events, CAST(f.e AS BIGINT) AS ewma_cents
    FROM last_rn l
    JOIN fold f ON f.user_id = l.user_id AND f.rn = l.n_events
    ORDER BY l.user_id
    """,
)
def q_stream_ewma(spark, sf_dir):
    """STREAMING EXACT EWMA per user — the stateful sequential fold
    e_t = (3*x_t + 7*e_{t-1}) div 10 on the cents lattice (alpha=0.3
    with floor rounding, e_1 = x_1), the operator class where
    streaming is STRONGER than batch: q_ewma truncates the recurrence
    to 8 taps to stay parallel, while the stream pays O(1)/event in
    per-key state (streaming/windows.py stream_ewma,
    applyInPandasWithState; two int64s of state) and is EXACT. The
    integer recurrence is what makes cross-engine parity possible at
    all — the DuckDB oracle replays the identical fold as a bounded
    RECURSIVE CTE over per-user row numbers (~70 steps on this
    fixture), something float EWMA could never hash-match. In update
    mode every batch re-emits the running fold per key; the LAST
    emission per key is the full-sequence value, which is what the
    availableNow single-batch run returns and the cross-batch test
    pins (tests/test_round12_staging_witness.py). At 100 TB/day:
    state is 16 bytes/key, emission is one row per key per batch."""
    from ..streaming.windows import stream_ewma
    from .catalog import _run_stream_to_parquet, _staged_event_stream

    stream = _staged_event_stream(spark, sf_dir, "q_stream_ewma")
    out = stream_ewma(stream)
    emitted = _run_stream_to_parquet(
        spark, out, "q_stream_ewma", mode="update"
    )
    return emitted.select("user_id", "n_events", "ewma_cents").orderBy(
        "user_id"
    )


@staged(
    "q_simpson_paradox",
    oracle="""
    WITH raw AS (
      SELECT event_type,
             CAST(date_part('hour', ts) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    grp AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM raw GROUP BY event_type
    ),
    pooled AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(sx) AS BIGINT) AS sx,
             CAST(SUM(sy) AS BIGINT) AS sy,
             CAST(SUM(sxy) AS BIGINT) AS sxy
      FROM grp
    )
    SELECT g.event_type,
           CAST(g.n * g.sxy - g.sx * g.sy AS BIGINT) AS group_num,
           CAST(p.n * p.sxy - p.sx * p.sy AS BIGINT) AS pooled_num,
           CAST(CASE WHEN
                (CASE WHEN g.n * g.sxy - g.sx * g.sy < 0 THEN -1
                      WHEN g.n * g.sxy - g.sx * g.sy > 0 THEN 1
                      ELSE 0 END)
                * (CASE WHEN p.n * p.sxy - p.sx * p.sy < 0 THEN -1
                        WHEN p.n * p.sxy - p.sx * p.sy > 0 THEN 1
                        ELSE 0 END) < 0
                THEN 1 ELSE 0 END AS INT) AS sign_flip
    FROM grp g CROSS JOIN pooled p
    ORDER BY g.event_type
    """,
)
def q_simpson_paradox(spark, sf_dir):
    """SIMPSON'S PARADOX DETECTOR — does the value-vs-hour trend
    REVERSE inside any stratum relative to the pooled trend (the
    aggregation trap every dashboard rollup risks)? The OLS slope
    SIGN is fully determined by the exact BIGINT numerator
    n*Sxy - Sx*Sy, so both the per-group and pooled directions — and
    the flip verdict itself — are decided on the integer lattice
    without computing a single slope. One conditional aggregate per
    stratum + a 4-term pooled re-sum of the same sufficient
    statistics (no second scan). Magnitude: pooled n*Sxy ~ 1.2e18 at
    sf1 — inside int64, bound noted with the headroom family; the
    flip verdict multiplies the two SIGNS (+-1), never the two
    numerators — their product overflows int64 already at sf0.01
    (caught by the staging sf0.01 gate: DuckDB silently promotes to
    HUGEINT where Spark wraps). At 100 TB: one scan, strata-bounded
    everything."""
    ev = _t(spark, sf_dir, "events")
    raw = ev.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("y"),
    )
    grp = raw.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    grp = track_persist(grp)
    pooled = grp.agg(
        F.sum("n").cast("bigint").alias("pn"),
        F.sum("sx").cast("bigint").alias("psx"),
        F.sum("sy").cast("bigint").alias("psy"),
        F.sum("sxy").cast("bigint").alias("psxy"),
    )
    gnum = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "bigint"
    )
    pnum = (
        F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")
    ).cast("bigint")
    return (
        grp.crossJoin(F.broadcast(pooled))
        .select(
            "event_type",
            gnum.alias("group_num"),
            pnum.alias("pooled_num"),
            F.when(
                F.signum(gnum.cast("double")).cast("int")
                * F.signum(pnum.cast("double")).cast("int")
                < 0,
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("sign_flip"),
        )
        .orderBy("event_type")
    )


_ME_THRESHOLDS = (10000, 20000, 30000)


@staged(
    "q_mean_excess",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      FROM events
    ),
    th AS (SELECT * FROM (VALUES
      {', '.join(f'({u})' for u in _ME_THRESHOLDS)}) AS t(u)),
    agg AS (
      SELECT v.event_type, th.u,
             CAST(COUNT(*) AS BIGINT) AS n_exceed,
             CAST(SUM(v.x - th.u) AS BIGINT) AS sum_excess
      FROM v JOIN th ON v.x > th.u
      GROUP BY v.event_type, th.u
    )
    SELECT event_type, u, n_exceed, sum_excess,
           CAST(sum_excess AS DOUBLE) / CAST(n_exceed AS DOUBLE)
             AS mean_excess
    FROM agg ORDER BY event_type, u
    """,
)
def q_mean_excess(spark, sf_dir):
    """MEAN-EXCESS (mean residual life) readout at three thresholds —
    the EVT diagnostic that pairs with q_hill_tail_index: a mean-
    excess function that RISES with the threshold indicates a heavier-
    than-exponential tail (GPD shape > 0), the regime where p99-based
    capacity planning under-provisions. Exceedances and excess sums
    are exact BIGINTs from one scan against a 3-row broadcast
    threshold table (the q_tiered_billing fan-out shape); the mean is
    the single readout division. At 100 TB: one scan, 3x keys
    cells."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("x")
    )
    th = spark.createDataFrame(
        [(u,) for u in _ME_THRESHOLDS], "u bigint"
    )
    agg = (
        v.join(F.broadcast(th), v.x > th.u)
        .groupBy("event_type", "u")
        .agg(
            F.count("*").cast("bigint").alias("n_exceed"),
            F.sum(F.col("x") - F.col("u")).cast("bigint").alias("sum_excess"),
        )
    )
    return agg.select(
        "event_type",
        "u",
        "n_exceed",
        "sum_excess",
        (
            F.col("sum_excess").cast("double")
            / F.col("n_exceed").cast("double")
        ).alias("mean_excess"),
    ).orderBy("event_type", "u")


@staged(
    "q_interarrival_cv",
    oracle="""
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ),
    gaps AS (
      SELECT user_id, (us - prev) // 1000000 AS g
      FROM seq WHERE prev IS NOT NULL
    ),
    sums AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(g) AS BIGINT) AS sum_s,
             CAST(SUM(g * g) AS BIGINT) AS sum_s2
      FROM gaps GROUP BY user_id HAVING SUM(g) > 0
    )
    SELECT user_id, n_gaps, sum_s, sum_s2,
           CAST(n_gaps AS DOUBLE) * CAST(sum_s2 AS DOUBLE)
             / (CAST(sum_s AS DOUBLE) * CAST(sum_s AS DOUBLE)) - 1.0
             AS cv2,
           CAST(CASE WHEN n_gaps * sum_s2 > 2 * sum_s * sum_s
                THEN 1 ELSE 0 END AS INT) AS overdispersed
    FROM sums ORDER BY user_id
    """,
)
def q_interarrival_cv(spark, sf_dir):
    """INTERARRIVAL COEFFICIENT-OF-VARIATION test per user — is the
    arrival process Poisson-like (CV ~ 1), bursty (CV > 1, the
    q_burstiness regime) or pacemaker-regular (CV < 1, bot-like —
    the q_beaconing signal generalized)? Gaps are integer seconds
    (micro gaps squared would overflow int64 at month spans —
    documented); CV^2 = n*Sum g^2 / (Sum g)^2 - 1 reads from exact
    BIGINTs, and the overdispersion VERDICT is the exact integer
    inequality n*S2 > 2*S^2 (CV^2 > 1) — no float judges. One lag
    window per user + one aggregate. At 100 TB: per-key sequential
    state is one timestamp; this is the q_event_rate_alert family."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.expr("unix_micros(ts)"), F.col("event_id")
    )
    seq = ev.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("us"),
        F.lag(F.expr("unix_micros(ts)")).over(w).alias("prev"),
    )
    gaps = seq.filter(F.col("prev").isNotNull()).select(
        "user_id",
        F.expr("(us - prev) div 1000000").alias("g"),
    )
    sums = (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_gaps"),
            F.sum("g").cast("bigint").alias("sum_s"),
            F.sum(F.col("g") * F.col("g")).cast("bigint").alias("sum_s2"),
        )
        .filter(F.col("sum_s") > 0)
    )
    cv2 = (
        F.col("n_gaps").cast("double")
        * F.col("sum_s2").cast("double")
        / (F.col("sum_s").cast("double") * F.col("sum_s").cast("double"))
        - 1.0
    )
    over = (
        F.when(
            F.col("n_gaps") * F.col("sum_s2")
            > 2 * F.col("sum_s") * F.col("sum_s"),
            1,
        )
        .otherwise(0)
        .cast("int")
    )
    return sums.select(
        "user_id",
        "n_gaps",
        "sum_s",
        "sum_s2",
        cv2.alias("cv2"),
        over.alias("overdispersed"),
    ).orderBy("user_id")


def _shap_v(s: int) -> str:
    """SQL expression for coalition value v(S): converted users whose
    touched-set is contained in bitmask ``s`` (8-cell fixed sum)."""
    ks = [k for k in range(8) if k & ~s == 0]
    return "(" + " + ".join(f"c{k}" for k in ks) + ")"


_SHAP_PHI = {
    # phi_i * 6 = 2(v({i})-v(0)) + (v({i,j})-v({j})) + (v({i,k})-v({k}))
    #           + 2(v(N)-v(N\{i}))   for n=3 players (bits 1=view,
    # 2=click, 4=purchase)
    "view": (
        f"(2 * ({_shap_v(1)} - {_shap_v(0)})"
        f" + ({_shap_v(3)} - {_shap_v(2)})"
        f" + ({_shap_v(5)} - {_shap_v(4)})"
        f" + 2 * ({_shap_v(7)} - {_shap_v(6)}))"
    ),
    "click": (
        f"(2 * ({_shap_v(2)} - {_shap_v(0)})"
        f" + ({_shap_v(3)} - {_shap_v(1)})"
        f" + ({_shap_v(6)} - {_shap_v(4)})"
        f" + 2 * ({_shap_v(7)} - {_shap_v(5)}))"
    ),
    "purchase": (
        f"(2 * ({_shap_v(4)} - {_shap_v(0)})"
        f" + ({_shap_v(5)} - {_shap_v(1)})"
        f" + ({_shap_v(6)} - {_shap_v(2)})"
        f" + 2 * ({_shap_v(7)} - {_shap_v(3)}))"
    ),
}


def _shapley_oracle() -> str:
    cells = ",\n             ".join(
        f"CAST(SUM(CASE WHEN bits = {k} AND conv = 1 THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c{k}"
        for k in range(8)
    )
    arms = "\n      UNION ALL ".join(
        f"SELECT '{ch}' AS channel,"
        f" CAST({expr} AS BIGINT) AS phi_x6,"
        f" CAST({expr} AS DOUBLE) / 6.0 AS phi,"
        f" CAST({_shap_v(7)} - {_shap_v(0)} AS BIGINT) AS total_attributed"
        f" FROM cells"
        for ch, expr in _SHAP_PHI.items()
    )
    return f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             + 2 * MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             + 4 * MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS bits,
             MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT {cells}
      FROM per_user
    )
    SELECT * FROM (
      {arms}
    ) ORDER BY channel
    """


@staged("q_shapley_attribution", oracle=_shapley_oracle())
def q_shapley_attribution(spark, sf_dir):
    """SHAPLEY-VALUE CHANNEL ATTRIBUTION — the principled division of
    conversions among touchpoints (the game-theoretic upgrade of
    q_attribution's positional rules): with 3 channels the Shapley sum
    has 4 coalition strata with weights {2,1,1,2}/6, so phi*6 is an
    EXACT BIGINT linear combination of the 8 coalition values, each of
    which is a fixed sum of the 8 (touched-set, converted) cells —
    the whole computation is one per-user presence aggregate + one
    8-cell conditional aggregate + a fixed expression per channel.
    v(S) = converted users reachable through channels in S
    (touched-set containment). The efficiency axiom
    sum(phi) = v(N) - v(empty) is witness-pinned. At 100 TB: two hash
    aggs, 8 cells, zero joins."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
            + 2
            * F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
            + 4
            * F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
        ).alias("bits"),
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("conv"),
    )
    cells = per_user.agg(
        *[
            F.sum(
                F.when(
                    (F.col("bits") == k) & (F.col("conv") == 1), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"c{k}")
            for k in range(8)
        ]
    )
    cells = track_persist(cells)
    arms = None
    for ch, expr in _SHAP_PHI.items():
        arm = cells.select(
            F.lit(ch).alias("channel"),
            F.expr(f"CAST({expr} AS BIGINT)").alias("phi_x6"),
            F.expr(f"CAST({expr} AS DOUBLE) / 6.0").alias("phi"),
            F.expr(
                f"CAST({_shap_v(7)} - {_shap_v(0)} AS BIGINT)"
            ).alias("total_attributed"),
        )
        arms = arm if arms is None else arms.unionByName(arm)
    return arms.orderBy("channel")


_DECAY_W = [
    (0, 1000000000), (1, 900000000), (2, 810000000), (3, 729000000),
    (4, 656100000), (5, 590490000), (6, 531441000), (7, 478296900),
    (8, 430467210), (9, 387420489), (10, 348678440), (11, 313810596),
    (12, 282429536), (13, 254186583), (14, 228767925), (15, 205891132),
    (16, 185302019), (17, 166771817), (18, 150094635), (19, 135085172),
    (20, 121576655), (21, 109418989), (22, 98477090), (23, 88629381),
    (24, 79766443), (25, 71789799), (26, 64610819), (27, 58149737),
    (28, 52334763), (29, 47101287), (30, 42391158),
]  # round(1e9 * 0.9^d) — FROZEN so no engine ever computes a pow


@staged(
    "q_decay_activity",
    oracle=f"""
    WITH w(d, wt) AS (VALUES
      {', '.join(f'({d}, {wt})' for d, wt in _DECAY_W)}),
    aged AS (
      SELECT user_id,
             date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') AS age
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(w.wt) AS BIGINT) AS score_nano
    FROM aged JOIN w ON w.d = aged.age
    GROUP BY user_id ORDER BY user_id
    """,
)
def q_decay_activity(spark, sf_dir):
    """RECENCY-DECAYED ACTIVITY SCORE per user (half-life-style
    engagement weighting, the time-aware upgrade of a plain event
    count and the scoring side of q_rfm's recency bucket): weight
    0.9^age_days, with the 31 weights FROZEN as integer nano
    constants (the q_ndcg_eval discipline — no pow() at query time in
    either engine), so the score is an exact BIGINT dot product via
    one broadcast join against the weight dim. Events older than the
    window drop out by the inner join — exactly how a production
    decay score bounds its lookback. At 100 TB: one scan + broadcast
    31-row dim."""
    ev = _t(spark, sf_dir, "events")
    w = F.broadcast(
        spark.createDataFrame(_DECAY_W, "d int, wt bigint")
    )
    aged = ev.select(
        "user_id",
        F.datediff(F.lit("2024-01-31"), F.col("ts").cast("date")).alias(
            "age"
        ),
    )
    return (
        aged.join(w, aged.age == w.d)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("wt").cast("bigint").alias("score_nano"),
        )
        .orderBy("user_id")
    )


@staged(
    "q_pythagorean_means",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      FROM events WHERE value > 0
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(CAST(floor(ln(CAST(x AS DOUBLE))
               * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS lnsum_nano,
             CAST(SUM(1000000000000 // x) AS BIGINT) AS inv_pico
      FROM v GROUP BY event_type
    )
    SELECT event_type, n, s, lnsum_nano, inv_pico,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS am,
           CAST(lnsum_nano AS DOUBLE)
             / (CAST(n AS DOUBLE) * 1000000000.0) AS gm_ln,
           CAST(n AS DOUBLE) * 1000000000000.0
             / CAST(inv_pico AS DOUBLE) AS hm
    FROM sums ORDER BY event_type
    """,
)
def q_pythagorean_means(spark, sf_dir):
    """PYTHAGOREAN MEANS per key — arithmetic, geometric, harmonic
    (the three averages that disagree exactly when the distribution
    is skewed; GM for growth rates, HM for rates/ratios — using the
    wrong one is a classic metrics bug, and AM >= GM >= HM is
    witness-pinned): AM reads from the exact cents sum; GM's log
    terms and HM's reciprocals are materialized on integer lattices
    BEFORE summing (1e-9 ln units, 1e-12 reciprocal units — the
    q_hill_tail_index discipline), so all three numerators are exact
    BIGINTs. The geometric mean is reported in LOG form (gm_ln):
    exponentiating at readout is NOT portable — java.lang.Math.exp
    and C libm exp disagree by 1 ulp (caught by the staging sf0.01
    gate), while the division chain is IEEE-exactly shared. At
    100 TB: one map-side-combined aggregate."""
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("value") > 0).select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("x")
    )
    sums = v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(
            F.floor(
                F.log(F.col("x").cast("double")) * 1000000000.0 + 0.5
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("lnsum_nano"),
        F.sum(F.expr("1000000000000 div x")).cast("bigint").alias("inv_pico"),
    )
    return sums.select(
        "event_type",
        "n",
        "s",
        "lnsum_nano",
        "inv_pico",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("am"),
        (
            F.col("lnsum_nano").cast("double")
            / (F.col("n").cast("double") * 1000000000.0)
        ).alias("gm_ln"),
        (
            F.col("n").cast("double")
            * 1000000000000.0
            / F.col("inv_pico").cast("double")
        ).alias("hm"),
    ).orderBy("event_type")


@staged(
    "q_srm_check",
    oracle="""
    WITH assigned AS (
      SELECT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':srm'),
               1, 8))::BIGINT % 2 AS arm,
             user_id
      FROM events
    ),
    arms AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT CASE WHEN arm = 0 THEN user_id END)
               AS BIGINT) AS n_a,
             CAST(COUNT(DISTINCT CASE WHEN arm = 1 THEN user_id END)
               AS BIGINT) AS n_b
      FROM assigned GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE) AS chi2,
           CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) * 100
                          > 384 * (n_a + n_b)
                THEN 1 ELSE 0 END AS INT) AS srm_flag
    FROM arms ORDER BY event_type
    """,
)
def q_srm_check(spark, sf_dir):
    """SAMPLE-RATIO MISMATCH check per experiment slice — the
    assignment-integrity gate every A/B readout (q_ab_test, q_ab_cuped)
    must pass FIRST (a biased split invalidates any lift estimate):
    users hash deterministically into two arms (engine-portable md5,
    the q_sample_hash discipline), per-slice distinct-user arm counts
    are exact, the chi-square-vs-50/50 statistic (a-b)^2/(a+b) is one
    division of exact BIGINTs, and the alpha=0.05 VERDICT is the
    exact integer inequality 100*(a-b)^2 > 384*(a+b) — no float
    judges. At 100 TB: one scan + two distinct-count reductions."""
    ev = _t(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":srm"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    assigned = ev.select("event_type", arm.alias("arm"), "user_id")
    arms = assigned.groupBy("event_type").agg(
        F.countDistinct(
            F.when(F.col("arm") == 0, F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_a"),
        F.countDistinct(
            F.when(F.col("arm") == 1, F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    return arms.select(
        "event_type",
        "n_a",
        "n_b",
        ((d * d).cast("double") / (F.col("n_a") + F.col("n_b")).cast("double")).alias(
            "chi2"
        ),
        F.when(d * d * 100 > 384 * (F.col("n_a") + F.col("n_b")), 1)
        .otherwise(0)
        .cast("int")
        .alias("srm_flag"),
    ).orderBy("event_type")


@staged(
    "q_price_volume_mix",
    oracle="""
    WITH li AS (
      SELECT l_partkey % 100 AS pk,
             CASE WHEN year(l_shipdate) < 1998 THEN 0 ELSE 1 END AS period,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS r,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
    ),
    agg AS (
      SELECT pk,
             CAST(SUM(CASE WHEN period = 0 THEN r ELSE 0 END)
               AS BIGINT) AS r0,
             CAST(SUM(CASE WHEN period = 1 THEN r ELSE 0 END)
               AS BIGINT) AS r1,
             CAST(SUM(CASE WHEN period = 0 THEN q ELSE 0 END)
               AS BIGINT) AS q0,
             CAST(SUM(CASE WHEN period = 1 THEN q ELSE 0 END)
               AS BIGINT) AS q1
      FROM li GROUP BY pk
      HAVING SUM(CASE WHEN period = 0 THEN q ELSE 0 END) > 0
         AND SUM(CASE WHEN period = 1 THEN q ELSE 0 END) > 0
    )
    SELECT pk, r0, r1, q0, q1,
           CAST(r1 * q0 - r0 * q1 AS BIGINT) AS price_eff_xq0,
           CAST(r0 * (q1 - q0) AS BIGINT) AS volume_eff_xq0,
           CAST(r1 * q0 - r0 * q1 AS DOUBLE) / CAST(q0 AS DOUBLE)
             / 100.0 AS price_effect,
           CAST(r0 * (q1 - q0) AS DOUBLE) / CAST(q0 AS DOUBLE)
             / 100.0 AS volume_effect
    FROM agg ORDER BY pk
    """,
)
def q_price_volume_mix(spark, sf_dir):
    """PRICE/VOLUME BRIDGE per product bucket — the revenue-variance
    decomposition every finance review runs (how much of the
    period-over-period revenue change came from realized-price moves
    vs volume moves?): with p_i = R_i/Q_i, the decomposition
    dR = (p1-p0)*Q1 + p0*(Q1-Q0) becomes EXACT on the x Q0 lattice —
    price_eff*Q0 = R1*Q0 - R0*Q1 and volume_eff*Q0 = R0*(Q1-Q0), both
    BIGINT, and their sum telescopes to (R1-R0)*Q0 by construction
    (the witness pins this bridge identity per bucket). One
    conditional aggregate per bucket, both-periods-present buckets
    only (new/discontinued lines are their own bridge row in
    production — out of scope here, documented). Magnitude: R*Q <=
    ~1e16 at sf1. At 100 TB: one scan, one hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_partkey") % 100).alias("pk"),
        F.when(F.year("l_shipdate") < 1998, 0).otherwise(1).alias("period"),
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("bigint")
        .alias("r"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    agg = (
        base.groupBy("pk")
        .agg(
            F.sum(F.when(F.col("period") == 0, F.col("r")).otherwise(0))
            .cast("bigint")
            .alias("r0"),
            F.sum(F.when(F.col("period") == 1, F.col("r")).otherwise(0))
            .cast("bigint")
            .alias("r1"),
            F.sum(F.when(F.col("period") == 0, F.col("q")).otherwise(0))
            .cast("bigint")
            .alias("q0"),
            F.sum(F.when(F.col("period") == 1, F.col("q")).otherwise(0))
            .cast("bigint")
            .alias("q1"),
        )
        .filter((F.col("q0") > 0) & (F.col("q1") > 0))
    )
    price_num = (
        F.col("r1") * F.col("q0") - F.col("r0") * F.col("q1")
    ).cast("bigint")
    vol_num = (F.col("r0") * (F.col("q1") - F.col("q0"))).cast("bigint")
    return agg.select(
        "pk",
        "r0",
        "r1",
        "q0",
        "q1",
        price_num.alias("price_eff_xq0"),
        vol_num.alias("volume_eff_xq0"),
        (price_num.cast("double") / F.col("q0").cast("double") / 100.0).alias(
            "price_effect"
        ),
        (vol_num.cast("double") / F.col("q0").cast("double") / 100.0).alias(
            "volume_effect"
        ),
    ).orderBy("pk")


@staged(
    "q_fleiss_kappa",
    oracle="""
    WITH ranked AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(round(value * 100) AS BIGINT) // 12500 AS cat,
             row_number() OVER (PARTITION BY CAST(ts AS DATE)
               ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ),
    panel AS (
      SELECT d, cat FROM ranked WHERE rn <= 20
    ),
    full_days AS (
      SELECT d FROM panel GROUP BY d HAVING COUNT(*) = 20
    ),
    cells AS (
      SELECT p.d, p.cat, CAST(COUNT(*) AS BIGINT) AS nij
      FROM panel p JOIN full_days USING (d)
      GROUP BY p.d, p.cat
    ),
    per_item AS (
      SELECT d, CAST(SUM(nij * nij) - 20 AS BIGINT) AS pi_num
      FROM cells GROUP BY d
    ),
    totals AS (
      SELECT cat, CAST(SUM(nij) AS BIGINT) AS tj FROM cells GROUP BY cat
    ),
    agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM per_item) AS n_items,
             (SELECT CAST(SUM(pi_num) AS BIGINT) FROM per_item)
               AS pbar_num,
             (SELECT CAST(SUM(tj * tj) AS BIGINT) FROM totals) AS pe_num
    )
    SELECT n_items, pbar_num, pe_num,
           (CAST(pbar_num AS DOUBLE) / (CAST(n_items AS DOUBLE) * 380.0)
            - CAST(pe_num AS DOUBLE)
              / (400.0 * CAST(n_items AS DOUBLE)
                 * CAST(n_items AS DOUBLE)))
           / (1.0 - CAST(pe_num AS DOUBLE)
              / (400.0 * CAST(n_items AS DOUBLE)
                 * CAST(n_items AS DOUBLE))) AS kappa
    FROM agg
    """,
)
def q_fleiss_kappa(spark, sf_dir):
    """FLEISS' KAPPA — multi-rater agreement at FIXED panel size
    (n = 20 raters per item), the equal-panel member of the
    agreement family next to q_judge_kappa (two raters) and
    q_krippendorff_alpha (unequal panels): items are days, the panel
    is the deterministic first-20 events per day (total (ts,
    event_id) order), categories are value bands. Both the per-item
    agreement numerators (sum n_ij^2 - n, exact on the x n(n-1) = 380
    lattice) and the chance-agreement numerator (sum T_j^2 on the
    (nN)^2 lattice) are exact BIGINTs; kappa is one identical float
    chain. Days with fewer than 20 events drop out by definition.
    At 100 TB: one rank window + two bounded aggs."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy(F.col("ts").cast("date")).orderBy(
        F.expr("unix_micros(ts)"), F.col("event_id")
    )
    ranked = ev.select(
        F.col("ts").cast("date").alias("d"),
        F.expr("CAST(round(value * 100) AS BIGINT) div 12500").alias("cat"),
        F.row_number().over(w).alias("rn"),
    )
    panel = ranked.filter(F.col("rn") <= 20).select("d", "cat")
    panel = track_persist(panel)
    full_days = (
        panel.groupBy("d").agg(F.count("*").alias("c")).filter(
            F.col("c") == 20
        ).select("d")
    )
    cells = (
        panel.join(F.broadcast(full_days), "d")
        .groupBy("d", "cat")
        .agg(F.count("*").cast("bigint").alias("nij"))
    )
    cells = track_persist(cells)
    per_item = cells.groupBy("d").agg(
        (F.sum(F.col("nij") * F.col("nij")) - 20)
        .cast("bigint")
        .alias("pi_num")
    )
    totals = cells.groupBy("cat").agg(
        F.sum("nij").cast("bigint").alias("tj")
    )
    a1 = per_item.agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("pi_num").cast("bigint").alias("pbar_num"),
    )
    a2 = totals.agg(
        F.sum(F.col("tj") * F.col("tj")).cast("bigint").alias("pe_num")
    )
    nd = F.col("n_items").cast("double")
    pbar = F.col("pbar_num").cast("double") / (nd * 380.0)
    pe = F.col("pe_num").cast("double") / (400.0 * nd * nd)
    return a1.crossJoin(F.broadcast(a2)).select(
        "n_items",
        "pbar_num",
        "pe_num",
        ((pbar - pe) / (1.0 - pe)).alias("kappa"),
    )


def _set_cover_oracle() -> str:
    parts = [
        """
    WITH toks AS (
      SELECT source,
             list_filter(string_split(lower(text), ' '),
               x -> x != '') AS tk
      FROM documents
    ),
    m AS MATERIALIZED (
      SELECT DISTINCT source, t FROM (
        SELECT source,
               unnest(CASE WHEN len(tk) >= 2 THEN
                 list_transform(generate_series(1, len(tk) - 1),
                   i -> concat_ws(' ', tk[i], tk[i + 1]))
               ELSE [] END) AS t
        FROM toks
      )
    ),
    u0 AS MATERIALIZED (SELECT DISTINCT t FROM m)"""
    ]
    for r in (1, 2, 3, 4):
        parts.append(
            f""",
    w{r} AS MATERIALIZED (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM m JOIN u{r - 1} USING (t)
      GROUP BY source ORDER BY n_new DESC, source LIMIT 1
    ),
    u{r} AS MATERIALIZED (
      SELECT t FROM u{r - 1}
      WHERE t NOT IN (SELECT m.t FROM m
                      JOIN w{r} ON w{r}.source = m.source)
    )"""
        )
    arms = "\n      UNION ALL ".join(
        f"SELECT {r} AS round, source, n_new,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM u{r}) AS n_remaining"
        f" FROM w{r}"
        for r in (1, 2, 3, 4)
    )
    parts.append(f"""
    SELECT * FROM (
      {arms}
    ) ORDER BY round""")
    return "".join(parts)


@staged("q_set_cover_greedy", oracle=_set_cover_oracle())
def q_set_cover_greedy(spark, sf_dir):
    """GREEDY SET COVER over (source -> vocabulary) — which data
    sources to ingest FIRST to cover the most vocabulary (the
    ln(n)-approximate coverage-planning primitive behind corpus
    acquisition and test-suite minimization): 4 unrolled greedy
    rounds, each one hash agg over the (source, token) membership
    restricted to the uncovered set + a total-ordered argmax
    (count DESC, source) + an anti-join shrink, with per-round
    localCheckpoint (the q_ktruss lineage discipline). Rounds are
    deterministic, so the oracle unrolls the identical greedy as
    chained MATERIALIZED CTEs with LIMIT-1 argmax. The universe is
    word BIGRAMS (the fixture's unigram vocabulary is 30 words and
    every source covers it — degenerate; bigrams give a real 4-round
    trajectory, probed 755/128/20/3 at sf0.001). The membership
    relation is bigram-distinct per source — bounded by vocabulary,
    not corpus size; at 100 TB that relation is the only thing that
    grows and it is the natural pre-aggregate."""
    docs = _t(spark, sf_dir, "documents")
    m = (
        docs.select(
            "source",
            F.expr(
                "filter(split(lower(text), ' '), x -> x != '')"
            ).alias("tk"),
        )
        .select(
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(tk) >= 2 THEN"
                    " transform(sequence(1, size(tk) - 1),"
                    " i -> concat_ws(' ', element_at(tk, i),"
                    " element_at(tk, i + 1)))"
                    " ELSE array() END"
                )
            ).alias("t"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    u = m.select("t").distinct().localCheckpoint(eager=True)
    out = None
    for rnd in (1, 2, 3, 4):
        counts = m.join(u, "t", "left_semi").groupBy("source").agg(
            F.count("*").cast("bigint").alias("n_new")
        )
        winner = counts.orderBy(F.desc("n_new"), "source").limit(
            1
        ).localCheckpoint(eager=True)
        covered = m.join(
            F.broadcast(winner.select("source")), "source", "left_semi"
        ).select("t")
        u = u.join(covered, "t", "left_anti").localCheckpoint(eager=True)
        rem = u.agg(F.count("*").cast("bigint").alias("n_remaining"))
        arm = (
            winner.select(
                F.lit(rnd).cast("int").alias("round"), "source", "n_new"
            )
            .crossJoin(F.broadcast(rem))
        )
        out = arm if out is None else out.unionByName(arm)
    return out.orderBy("round")


# =====================================================================
# Round-13 staged batch 5 — classical-statistics completions: the
# inequality-decomposition, k-group rank test, 2x2 epidemiology and
# variance-homogeneity screens the catalog's test family still lacked.
# Same contract: exact DuckDB oracle at sf0.001 AND sf0.01, pure-Python
# witnesses, plan pins.
# =====================================================================


@staged(
    "q_theil_index",
    oracle="""
    WITH x AS (
      SELECT o_orderpriority AS g,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    gs AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(cents) AS BIGINT) AS s_g
      FROM x GROUP BY g
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s
      FROM gs
    ),
    terms AS (
      SELECT x.g,
             CAST(floor(
               (CAST(x.cents AS DOUBLE) * CAST(tot.n AS DOUBLE)
                / CAST(tot.s AS DOUBLE))
               * ln(CAST(x.cents AS DOUBLE) * CAST(tot.n AS DOUBLE)
                    / CAST(tot.s AS DOUBLE))
               * 1000000000.0 + 0.5) AS BIGINT) AS tot_nano,
             CAST(floor(
               (CAST(x.cents AS DOUBLE) * CAST(gs.n_g AS DOUBLE)
                / CAST(gs.s_g AS DOUBLE))
               * ln(CAST(x.cents AS DOUBLE) * CAST(gs.n_g AS DOUBLE)
                    / CAST(gs.s_g AS DOUBLE))
               * 1000000000.0 + 0.5) AS BIGINT) AS win_nano
      FROM x JOIN gs ON gs.g = x.g CROSS JOIN tot
    )
    SELECT terms.g AS g, gs.n_g, gs.s_g,
           CAST(SUM(terms.win_nano) AS BIGINT) AS within_nano_sum,
           CAST(SUM(terms.tot_nano) AS BIGINT) AS total_nano_sum,
           CAST(floor(
             (CAST(gs.s_g AS DOUBLE) / CAST(tot.s AS DOUBLE))
             * ln((CAST(gs.s_g AS DOUBLE) * CAST(tot.n AS DOUBLE))
                  / (CAST(tot.s AS DOUBLE) * CAST(gs.n_g AS DOUBLE)))
             * 1000000000.0 + 0.5) AS BIGINT) AS between_nano,
           CAST(SUM(terms.win_nano) AS DOUBLE)
             / (CAST(gs.n_g AS DOUBLE) * 1000000000.0) AS theil_g
    FROM terms JOIN gs ON gs.g = terms.g CROSS JOIN tot
    GROUP BY terms.g, gs.n_g, gs.s_g, tot.s, tot.n
    ORDER BY g
    """,
)
def q_theil_index(spark, sf_dir):
    """THEIL T INEQUALITY INDEX with the within/between decomposition
    (the additive-decomposability property Gini lacks — the reason
    national statistics offices use Theil to split inequality into
    group effects): per priority group g, T_g = (1/n_g) sum
    (x/mu_g) ln(x/mu_g), the group's share of the global index
    (sum over the group of the global-mu terms), and the between-group
    term s_g ln(mu_g/mu). Every ln term is materialized on the 1e-9
    nano lattice BEFORE the count-weighted exact BIGINT sums (the
    q_mutual_info discipline) so emitted numerators are exact; the one
    emitted double is a single division chain. Dataflow: one bounded
    group-stats agg (5 rows, broadcast back) + one per-row term agg —
    two scans of a 2-column projection; at 100 TB the projection is
    what crosses the wire and the second scan's input dies in a
    map-side combine on 5 keys. Witness pins the decomposition
    identity T_total ~= T_between + sum s_g T_g on the lattice."""
    x = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("g"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    x = track_persist(x)
    gs = x.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("cents").cast("bigint").alias("s_g"),
    )
    gs = track_persist(gs)
    tot = gs.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
    )
    nano = lambda col: F.floor(col * 1000000000.0 + 0.5).cast(  # noqa: E731
        "bigint"
    )
    xd = F.col("cents").cast("double")
    r_tot = xd * F.col("n").cast("double") / F.col("s").cast("double")
    r_win = xd * F.col("n_g").cast("double") / F.col("s_g").cast("double")
    terms = (
        x.join(F.broadcast(gs), "g")
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            nano(r_tot * F.log(r_tot)).alias("tot_nano"),
            nano(r_win * F.log(r_win)).alias("win_nano"),
        )
    )
    agg = terms.groupBy("g").agg(
        F.sum("win_nano").cast("bigint").alias("within_nano_sum"),
        F.sum("tot_nano").cast("bigint").alias("total_nano_sum"),
    )
    s_share = F.col("s_g").cast("double") / F.col("s").cast("double")
    between = F.log(
        (F.col("s_g").cast("double") * F.col("n").cast("double"))
        / (F.col("s").cast("double") * F.col("n_g").cast("double"))
    )
    return (
        agg.join(F.broadcast(gs), "g")
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            "n_g",
            "s_g",
            "within_nano_sum",
            "total_nano_sum",
            nano(s_share * between).alias("between_nano"),
            (
                F.col("within_nano_sum").cast("double")
                / (F.col("n_g").cast("double") * 1000000000.0)
            ).alias("theil_g"),
        )
        .orderBy("g")
    )


@staged(
    "q_kruskal_wallis",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ),
    marg AS (
      SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY v
    ),
    cum AS (
      SELECT v, t,
             CAST(COALESCE(SUM(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS bef
      FROM marg
    ),
    r2 AS (
      SELECT cells.g,
             CAST(SUM(cells.c * (2 * cum.bef + cum.t + 1)) AS BIGINT)
               AS r2_g,
             CAST(SUM(cells.c) AS BIGINT) AS n_g
      FROM cells JOIN cum ON cum.v = cells.v
      GROUP BY cells.g
    ),
    tots AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n FROM r2),
    ties AS (
      SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum FROM marg
    ),
    piv AS (
      SELECT
        MAX(CASE WHEN g = 'A' THEN r2_g END) AS r2_a,
        MAX(CASE WHEN g = 'N' THEN r2_g END) AS r2_n,
        MAX(CASE WHEN g = 'R' THEN r2_g END) AS r2_r,
        MAX(CASE WHEN g = 'A' THEN n_g END) AS n_a,
        MAX(CASE WHEN g = 'N' THEN n_g END) AS n_n,
        MAX(CASE WHEN g = 'R' THEN n_g END) AS n_r
      FROM r2
    )
    SELECT tots.n AS n, piv.n_a, piv.n_n, piv.n_r,
           piv.r2_a, piv.r2_n, piv.r2_r, ties.tie_sum,
           (3.0 * CAST(piv.r2_a AS DOUBLE) * CAST(piv.r2_a AS DOUBLE)
              / (CAST(piv.n_a AS DOUBLE) * CAST(tots.n AS DOUBLE)
                 * CAST(tots.n + 1 AS DOUBLE))
            + 3.0 * CAST(piv.r2_n AS DOUBLE) * CAST(piv.r2_n AS DOUBLE)
              / (CAST(piv.n_n AS DOUBLE) * CAST(tots.n AS DOUBLE)
                 * CAST(tots.n + 1 AS DOUBLE))
            + 3.0 * CAST(piv.r2_r AS DOUBLE) * CAST(piv.r2_r AS DOUBLE)
              / (CAST(piv.n_r AS DOUBLE) * CAST(tots.n AS DOUBLE)
                 * CAST(tots.n + 1 AS DOUBLE))
            - 3.0 * CAST(tots.n + 1 AS DOUBLE))
           / (1.0 - CAST(ties.tie_sum AS DOUBLE)
                / (CAST(tots.n AS DOUBLE) * CAST(tots.n AS DOUBLE)
                   * CAST(tots.n AS DOUBLE) - CAST(tots.n AS DOUBLE)))
             AS h_corrected
    FROM piv CROSS JOIN tots CROSS JOIN ties
    """,
)
def q_kruskal_wallis(spark, sf_dir):
    """KRUSKAL-WALLIS H — the k-group rank ANOVA completing the
    nonparametric ladder (q_rank_sum is the 2-group Mann-Whitney,
    q_friedman_test the blocked design; this is the one-way k-sample
    test with tie correction). NO global sort: l_quantity lives on a
    50-value lattice, so midranks come from the (flag x quantity)
    contingency table — 2*R_g = sum_v c_gv*(2*cum_before_v + t_v + 1),
    exact BIGINT (the doubled-midrank lattice absorbs the .5s); the
    tie term sum(t^3 - t) is exact on the same 50-row marginal. H is
    ONE written float chain over the 3-group pivot (fixed evaluation
    order — never a float SUM across groups), divided by the tie
    correction. The only window is a cumulative count over the 50-row
    value marginal (bounded by the lattice, never by data — needs a
    BOUNDED_UNPARTITIONED_WINDOW allowlist row at promotion). At
    100 TB: raw volume dies in the 150-cell contingency agg."""
    cells = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("g"),
            F.col("l_quantity").cast("bigint").alias("v"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    cells = track_persist(cells)
    marg = cells.groupBy("v").agg(F.sum("c").cast("bigint").alias("t"))
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = marg.select(
        "v",
        "t",
        F.coalesce(F.sum("t").over(w), F.lit(0)).cast("bigint").alias("bef"),
    )
    r2 = (
        cells.join(F.broadcast(cum), "v")
        .groupBy("g")
        .agg(
            F.sum(
                F.col("c") * (2 * F.col("bef") + F.col("t") + 1)
            )
            .cast("bigint")
            .alias("r2_g"),
            F.sum("c").cast("bigint").alias("n_g"),
        )
    )
    piv = r2.agg(
        F.max(F.when(F.col("g") == "A", F.col("r2_g"))).alias("r2_a"),
        F.max(F.when(F.col("g") == "N", F.col("r2_g"))).alias("r2_n"),
        F.max(F.when(F.col("g") == "R", F.col("r2_g"))).alias("r2_r"),
        F.max(F.when(F.col("g") == "A", F.col("n_g"))).alias("n_a"),
        F.max(F.when(F.col("g") == "N", F.col("n_g"))).alias("n_n"),
        F.max(F.when(F.col("g") == "R", F.col("n_g"))).alias("n_r"),
        F.sum("n_g").cast("bigint").alias("n"),
    )
    ties = marg.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_sum")
    )
    nd = F.col("n").cast("double")
    np1 = (F.col("n") + 1).cast("double")

    def contrib(r2c, nc):
        return (
            3.0
            * F.col(r2c).cast("double")
            * F.col(r2c).cast("double")
            / (F.col(nc).cast("double") * nd * np1)
        )

    h = (
        contrib("r2_a", "n_a")
        + contrib("r2_n", "n_n")
        + contrib("r2_r", "n_r")
        - 3.0 * np1
    )
    c_tie = 1.0 - F.col("tie_sum").cast("double") / (nd * nd * nd - nd)
    return piv.crossJoin(F.broadcast(ties)).select(
        "n",
        "n_a",
        "n_n",
        "n_r",
        "r2_a",
        "r2_n",
        "r2_r",
        "tie_sum",
        (h / c_tie).alias("h_corrected"),
    )


@staged(
    "q_odds_ratio",
    oracle="""
    WITH cells AS (
      SELECT event_type AS t,
        CAST(SUM(CASE WHEN user_id % 2 = 0
          AND round(value * 100) > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN user_id % 2 = 0
          AND round(value * 100) <= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN user_id % 2 = 1
          AND round(value * 100) > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN user_id % 2 = 1
          AND round(value * 100) <= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM events GROUP BY event_type
    ),
    adj AS (
      SELECT t, a, b, c, d,
             CASE WHEN a * b * c * d = 0 THEN 1 ELSE 0 END AS haldane,
             2 * a + CASE WHEN a * b * c * d = 0 THEN 1 ELSE 0 END AS aa,
             2 * b + CASE WHEN a * b * c * d = 0 THEN 1 ELSE 0 END AS bb,
             2 * c + CASE WHEN a * b * c * d = 0 THEN 1 ELSE 0 END AS cc,
             2 * d + CASE WHEN a * b * c * d = 0 THEN 1 ELSE 0 END AS dd
      FROM cells
    ),
    stats AS (
      SELECT t, a, b, c, d, haldane,
             CAST(aa * dd AS DOUBLE) / CAST(bb * cc AS DOUBLE) AS or_hat,
             sqrt(2.0 / CAST(aa AS DOUBLE) + 2.0 / CAST(bb AS DOUBLE)
                  + 2.0 / CAST(cc AS DOUBLE) + 2.0 / CAST(dd AS DOUBLE))
               AS se_log_or,
             CAST(floor(ln(CAST(aa * dd AS DOUBLE)
                           / CAST(bb * cc AS DOUBLE))
                  * 1000000000.0 + 0.5) AS BIGINT) AS log_or_nano
      FROM adj
    )
    SELECT t, a, b, c, d, haldane, or_hat, se_log_or, log_or_nano,
           log_or_nano - CAST(floor(1.96 * se_log_or * 1000000000.0
             + 0.5) AS BIGINT) AS ci_lo_nano,
           log_or_nano + CAST(floor(1.96 * se_log_or * 1000000000.0
             + 0.5) AS BIGINT) AS ci_hi_nano
    FROM stats ORDER BY t
    """,
)
def q_odds_ratio(spark, sf_dir):
    """2x2 ODDS RATIO per event type with Wald CI — the epidemiology /
    feature-screen cell next to q_mcnemar (paired) and q_wilson_ci
    (single proportion): exposure = user parity (the q_ab_test arm
    hash), outcome = value > 50.00 decided on the exact cents lattice.
    The Haldane-Anscombe zero-cell correction (+0.5 each) runs on the
    DOUBLED lattice so the adjusted cells stay exact BIGINTs; or_hat is
    ONE division of exact integer products; the CI is carried in LOG
    form on the 1e-9 lattice (exp() is 1-ulp non-portable across
    engines — the q_pythagorean_means finding) with the half-width
    quantized before the exact integer +-. One conditional agg per
    type; at 100 TB the 2x2 cells are the only state."""
    cents_hi = F.expr("round(value * 100) > 5000")
    even = F.col("user_id") % 2 == 0
    cells = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("t"))
        .agg(
            F.sum(F.when(even & cents_hi, 1).otherwise(0))
            .cast("bigint")
            .alias("a"),
            F.sum(F.when(even & ~cents_hi, 1).otherwise(0))
            .cast("bigint")
            .alias("b"),
            F.sum(F.when(~even & cents_hi, 1).otherwise(0))
            .cast("bigint")
            .alias("c"),
            F.sum(F.when(~even & ~cents_hi, 1).otherwise(0))
            .cast("bigint")
            .alias("d"),
        )
    )
    hald = F.when(
        F.col("a") * F.col("b") * F.col("c") * F.col("d") == 0, 1
    ).otherwise(0)
    adj = cells.select(
        "t",
        "a",
        "b",
        "c",
        "d",
        hald.alias("haldane"),
        (2 * F.col("a") + hald).alias("aa"),
        (2 * F.col("b") + hald).alias("bb"),
        (2 * F.col("c") + hald).alias("cc"),
        (2 * F.col("d") + hald).alias("dd"),
    )
    ratio = (F.col("aa") * F.col("dd")).cast("double") / (
        F.col("bb") * F.col("cc")
    ).cast("double")
    se = F.sqrt(
        2.0 / F.col("aa").cast("double")
        + 2.0 / F.col("bb").cast("double")
        + 2.0 / F.col("cc").cast("double")
        + 2.0 / F.col("dd").cast("double")
    )
    nano = lambda col: F.floor(col * 1000000000.0 + 0.5).cast(  # noqa: E731
        "bigint"
    )
    stats = adj.select(
        "t",
        "a",
        "b",
        "c",
        "d",
        "haldane",
        ratio.alias("or_hat"),
        se.alias("se_log_or"),
        nano(F.log(ratio)).alias("log_or_nano"),
    )
    half = nano(1.96 * F.col("se_log_or"))
    return stats.select(
        "t",
        "a",
        "b",
        "c",
        "d",
        "haldane",
        "or_hat",
        "se_log_or",
        "log_or_nano",
        (F.col("log_or_nano") - half).alias("ci_lo_nano"),
        (F.col("log_or_nano") + half).alias("ci_hi_nano"),
    ).orderBy("t")


@staged(
    "q_levene_test",
    oracle="""
    WITH x AS (
      SELECT event_type AS g,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    cells AS (
      SELECT g, cents, CAST(COUNT(*) AS BIGINT) AS c
      FROM x GROUP BY g, cents
    ),
    cum AS (
      SELECT g, cents, c,
             CAST(SUM(c) OVER (PARTITION BY g ORDER BY cents)
               AS BIGINT) AS cm,
             CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n_g
      FROM cells
    ),
    med AS (
      SELECT g,
             CAST(MIN(CASE WHEN cm >= (n_g + 1) // 2 THEN cents END)
               AS BIGINT)
             + CAST(MIN(CASE WHEN cm >= (n_g + 2) // 2 THEN cents END)
               AS BIGINT) AS med2
      FROM cum GROUP BY g
    ),
    dev AS (
      SELECT x.g, ABS(2 * x.cents - med.med2) AS z
      FROM x JOIN med ON med.g = x.g
    ),
    gs AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(z) AS BIGINT) AS z_g,
             CAST(SUM(z * z) AS BIGINT) AS q_g
      FROM dev GROUP BY g
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(z_g) AS BIGINT) AS z,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM gs
    ),
    terms AS (
      SELECT gs.g,
        CAST(floor(CAST(gs.n_g AS DOUBLE)
          * (CAST(gs.z_g AS DOUBLE) / CAST(gs.n_g AS DOUBLE)
             - CAST(tot.z AS DOUBLE) / CAST(tot.n AS DOUBLE))
          * (CAST(gs.z_g AS DOUBLE) / CAST(gs.n_g AS DOUBLE)
             - CAST(tot.z AS DOUBLE) / CAST(tot.n AS DOUBLE))
          * 1000.0 + 0.5) AS BIGINT) AS num_milli,
        CAST(floor((CAST(gs.q_g AS DOUBLE)
          - CAST(gs.z_g AS DOUBLE) * CAST(gs.z_g AS DOUBLE)
            / CAST(gs.n_g AS DOUBLE))
          * 1000.0 + 0.5) AS BIGINT) AS den_milli
      FROM gs CROSS JOIN tot
    )
    SELECT tot.n AS n, tot.k AS k,
           CAST(SUM(num_milli) AS BIGINT) AS num_milli,
           CAST(SUM(den_milli) AS BIGINT) AS den_milli,
           (CAST(tot.n AS DOUBLE) - CAST(tot.k AS DOUBLE))
             / (CAST(tot.k AS DOUBLE) - 1.0)
             * CAST(SUM(num_milli) AS DOUBLE)
             / CAST(SUM(den_milli) AS DOUBLE) AS w
    FROM terms CROSS JOIN tot GROUP BY tot.n, tot.k
    """,
)
def q_levene_test(spark, sf_dir):
    """BROWN-FORSYTHE (median-based Levene) variance-homogeneity test —
    the precondition screen q_anova_f silently assumes (equal group
    variances) made checkable: W = ((N-k)/(k-1)) * between-SS(z) /
    within-SS(z) over z = |x - median_g|. Group medians are exact on
    the DOUBLED cents lattice (med2 = x_(k1) + x_(k2), order stats by
    cumulative counting over per-group value cells — bounded by the
    32751-step cents range, never by rows); deviations 2|x| - med2 stay
    exact BIGINTs, so n_g, sum z, sum z^2 are exact sufficient stats.
    Between/within SS terms are quantized to the 1e-3 lattice per
    GROUP (5 rows) before the exact sums — z_g^2 would overflow int64
    raw at sf1, the double chain with milli quantization holds to
    ~1e17 (headroom documented). Dataflow: one cells agg + broadcast
    median join + one stats agg; the only windows run over per-group
    value cells. At 100 TB the cents-cell agg bounds all state."""
    x = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("g"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    x = track_persist(x)
    cells = x.groupBy("g", "cents").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wcum = (
        Window.partitionBy("g")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("g")
    cum = cells.select(
        "g",
        "cents",
        F.sum("c").over(wcum).cast("bigint").alias("cm"),
        F.sum("c").over(wall).cast("bigint").alias("n_g"),
    )
    k1 = F.expr("(n_g + 1) div 2")
    k2 = F.expr("(n_g + 2) div 2")
    med = cum.groupBy("g").agg(
        (
            F.min(F.when(F.col("cm") >= k1, F.col("cents"))).cast("bigint")
            + F.min(F.when(F.col("cm") >= k2, F.col("cents"))).cast(
                "bigint"
            )
        ).alias("med2")
    )
    dev = x.join(F.broadcast(med), "g").select(
        "g", F.abs(2 * F.col("cents") - F.col("med2")).alias("z")
    )
    gs = dev.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("z").cast("bigint").alias("z_g"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("q_g"),
    )
    gs = track_persist(gs)
    tot = gs.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("z_g").cast("bigint").alias("z"),
        F.count("*").cast("bigint").alias("k"),
    )
    milli = lambda col: F.floor(col * 1000.0 + 0.5).cast(  # noqa: E731
        "bigint"
    )
    zbar_diff = F.col("z_g").cast("double") / F.col("n_g").cast(
        "double"
    ) - F.col("z").cast("double") / F.col("n").cast("double")
    terms = gs.crossJoin(F.broadcast(tot)).select(
        "g",
        milli(F.col("n_g").cast("double") * zbar_diff * zbar_diff).alias(
            "num_milli"
        ),
        milli(
            F.col("q_g").cast("double")
            - F.col("z_g").cast("double")
            * F.col("z_g").cast("double")
            / F.col("n_g").cast("double")
        ).alias("den_milli"),
    )
    agg = terms.agg(
        F.sum("num_milli").cast("bigint").alias("num_milli"),
        F.sum("den_milli").cast("bigint").alias("den_milli"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "n",
        "k",
        "num_milli",
        "den_milli",
        (
            (F.col("n").cast("double") - F.col("k").cast("double"))
            / (F.col("k").cast("double") - 1.0)
            * F.col("num_milli").cast("double")
            / F.col("den_milli").cast("double")
        ).alias("w"),
    )


# =====================================================================
# Round-13 staged batch 6 — actuarial / financial mechanisms: runoff
# triangle projection, exact integer annuity fold, lattice IRR, and
# the German-tank serial estimator.
# =====================================================================

# left-associative 12-fold product chain: both engines parse a*b*c
# left-assoc and each IEEE multiply is correctly rounded, so the text
# being identical makes the double bit-identical (no pow(), which is
# 1-ulp non-portable like exp() — the q_pythagorean_means finding)
_Q12 = "(" + " * ".join(["q"] * 12) + ")"


@staged(
    "q_chain_ladder",
    oracle="""
    WITH tri AS (
      SELECT CAST(year(o_orderdate) - 1995 AS BIGINT) AS y,
             CAST(o_orderkey % 4 AS BIGINT) AS d,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS inc
      FROM orders
      WHERE (year(o_orderdate) - 1995) + (o_orderkey % 4) <= 6
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT y.y, d.d FROM range(0, 7) AS y(y), range(0, 4) AS d(d)
      WHERE y.y + d.d <= 6
    ),
    cum AS (
      SELECT grid.y, grid.d,
             CAST(SUM(COALESCE(t2.inc, 0)) OVER (
               PARTITION BY grid.y ORDER BY grid.d) AS BIGINT) AS c,
             CAST(LEAST(3, 6 - grid.y) AS BIGINT) AS l_y
      FROM grid LEFT JOIN tri t2 ON t2.y = grid.y AND t2.d = grid.d
    ),
    fac AS (
      SELECT
        CAST(SUM(CASE WHEN d = 1 AND l_y >= 1 THEN c END) AS BIGINT) AS nu0,
        CAST(SUM(CASE WHEN d = 0 AND l_y >= 1 THEN c END) AS BIGINT) AS de0,
        CAST(SUM(CASE WHEN d = 2 AND l_y >= 2 THEN c END) AS BIGINT) AS nu1,
        CAST(SUM(CASE WHEN d = 1 AND l_y >= 2 THEN c END) AS BIGINT) AS de1,
        CAST(SUM(CASE WHEN d = 3 AND l_y >= 3 THEN c END) AS BIGINT) AS nu2,
        CAST(SUM(CASE WHEN d = 2 AND l_y >= 3 THEN c END) AS BIGINT) AS de2
      FROM cum
    ),
    latest AS (
      SELECT y, l_y, MAX(CASE WHEN d = l_y THEN c END) AS c_latest
      FROM cum GROUP BY y, l_y
    )
    SELECT latest.y + 1995 AS origin_year, latest.l_y AS latest_dev,
           CAST(latest.c_latest AS BIGINT) AS c_latest,
           fac.nu0, fac.de0, fac.nu1, fac.de1, fac.nu2, fac.de2,
           CASE latest.l_y
             WHEN 3 THEN CAST(latest.c_latest AS DOUBLE)
             WHEN 2 THEN CAST(latest.c_latest AS DOUBLE)
               * (CAST(fac.nu2 AS DOUBLE) / CAST(fac.de2 AS DOUBLE))
             WHEN 1 THEN CAST(latest.c_latest AS DOUBLE)
               * (CAST(fac.nu1 AS DOUBLE) / CAST(fac.de1 AS DOUBLE))
               * (CAST(fac.nu2 AS DOUBLE) / CAST(fac.de2 AS DOUBLE))
             ELSE CAST(latest.c_latest AS DOUBLE)
               * (CAST(fac.nu0 AS DOUBLE) / CAST(fac.de0 AS DOUBLE))
               * (CAST(fac.nu1 AS DOUBLE) / CAST(fac.de1 AS DOUBLE))
               * (CAST(fac.nu2 AS DOUBLE) / CAST(fac.de2 AS DOUBLE))
           END AS ultimate
    FROM latest CROSS JOIN fac ORDER BY origin_year
    """,
)
def q_chain_ladder(spark, sf_dir):
    """CHAIN-LADDER runoff-triangle projection — the actuarial
    reserving mechanism (volume-weighted age-to-age development
    factors, ultimates by factor roll-forward): origin year x
    deterministic dev bucket (orderkey mod 4), censored to the runoff
    triangle y + d <= 6 so late origins genuinely lack tail
    development and the projection is real. Cumulative paid per cell
    is exact BIGINT cents over a DENSE 25-cell literal grid (absent
    cells coalesce to 0 — no missing-diagonal bugs); each factor
    f_d = sum C_{*,d+1} / sum C_{*,d} over origins observed at BOTH
    ages (the classical estimator) is ONE division of exact BIGINTs;
    ultimates multiply <= 3 factors in a CASE with fixed
    left-to-right order, so the double chain is engine-portable.
    Windows run over <= 4 dev cells per origin. At 100 TB: raw
    volume dies in the 25-cell triangle agg; factors and ultimates
    are O(1) readouts."""
    tri = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.year("o_orderdate") - 1995)
            + (F.col("o_orderkey") % 4)
            <= 6
        )
        .groupBy(
            (F.year("o_orderdate") - 1995).cast("bigint").alias("y"),
            (F.col("o_orderkey") % 4).cast("bigint").alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("inc")
        )
    )
    grid = (
        spark.range(7)
        .select(F.col("id").cast("bigint").alias("y"))
        .crossJoin(
            spark.range(4).select(F.col("id").cast("bigint").alias("d"))
        )
        .filter(F.col("y") + F.col("d") <= 6)
    )
    wcum = (
        Window.partitionBy("y")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        grid.join(F.broadcast(tri), ["y", "d"], "left")
        .select(
            "y",
            "d",
            F.coalesce(F.col("inc"), F.lit(0)).alias("inc"),
            F.least(F.lit(3), 6 - F.col("y")).cast("bigint").alias("l_y"),
        )
        .select(
            "y",
            "d",
            "l_y",
            F.sum("inc").over(wcum).cast("bigint").alias("c"),
        )
    )
    cum = track_persist(cum)

    def fpart(dn, dd, lmin):
        return [
            F.sum(
                F.when((F.col("d") == dn) & (F.col("l_y") >= lmin), F.col("c"))
            )
            .cast("bigint")
            .alias(f"nu{dd}"),
            F.sum(
                F.when((F.col("d") == dd) & (F.col("l_y") >= lmin), F.col("c"))
            )
            .cast("bigint")
            .alias(f"de{dd}"),
        ]

    fac = cum.agg(*(fpart(1, 0, 1) + fpart(2, 1, 2) + fpart(3, 2, 3)))
    latest = cum.groupBy("y", "l_y").agg(
        F.max(F.when(F.col("d") == F.col("l_y"), F.col("c"))).alias(
            "c_latest"
        )
    )

    def f(i):
        return F.col(f"nu{i}").cast("double") / F.col(f"de{i}").cast(
            "double"
        )

    cl = F.col("c_latest").cast("double")
    ult = (
        F.when(F.col("l_y") == 3, cl)
        .when(F.col("l_y") == 2, cl * f(2))
        .when(F.col("l_y") == 1, cl * f(1) * f(2))
        .otherwise(cl * f(0) * f(1) * f(2))
    )
    return (
        latest.crossJoin(F.broadcast(fac))
        .select(
            (F.col("y") + 1995).alias("origin_year"),
            F.col("l_y").alias("latest_dev"),
            F.col("c_latest").cast("bigint").alias("c_latest"),
            "nu0",
            "de0",
            "nu1",
            "de1",
            "nu2",
            "de2",
            ult.alias("ultimate"),
        )
        .orderBy("origin_year")
    )


@staged(
    "q_amortization_schedule",
    oracle=f"""
    WITH RECURSIVE loans AS (
      SELECT c_custkey AS id,
             CAST(round(c_acctbal * 100) AS BIGINT) AS p,
             CAST(300 + 25 * (c_nationkey % 10) AS BIGINT) AS rbp
      FROM customer WHERE c_acctbal > 0
    ),
    pay AS (
      SELECT id, p, rbp,
        CAST(floor(
          CAST(p AS DOUBLE) * (CAST(rbp AS DOUBLE) / 120000.0) * {_Q12}
          / ({_Q12} - 1.0) + 0.5) AS BIGINT) AS a
      FROM (SELECT *, 1.0 + CAST(rbp AS DOUBLE) / 120000.0 AS q
            FROM loans)
    ),
    sched AS (
      SELECT id, rbp, a, 0 AS k, CAST(0 AS BIGINT) AS pay_c,
             CAST(0 AS BIGINT) AS int_c, CAST(0 AS BIGINT) AS prin_c,
             p AS bal
      FROM pay
      UNION ALL
      SELECT id, rbp, a, k + 1,
        CASE WHEN k + 1 = 12 THEN bal + (bal * rbp) // 120000
             ELSE LEAST(a, bal + (bal * rbp) // 120000) END,
        (bal * rbp) // 120000,
        CASE WHEN k + 1 = 12 THEN bal
             ELSE LEAST(a, bal + (bal * rbp) // 120000)
               - (bal * rbp) // 120000 END,
        CASE WHEN k + 1 = 12 THEN CAST(0 AS BIGINT)
             ELSE bal - (LEAST(a, bal + (bal * rbp) // 120000)
               - (bal * rbp) // 120000) END
      FROM sched WHERE k < 12
    )
    SELECT id, k, pay_c, int_c, prin_c, bal
    FROM sched WHERE k >= 1 ORDER BY id, k
    """,
)
def q_amortization_schedule(spark, sf_dir):
    """LOAN AMORTIZATION SCHEDULE as an EXACT INTEGER FOLD — the
    ledger-family sequential recurrence (q_stream_ewma / q_ledger_replay
    discipline) applied to annuities: balance_k = balance_{k-1} -
    (payment - interest_k) with interest_k = (bal*rbp) div 120000
    decided entirely on the cents x basis-point integer lattice (bal
    <= 1e8 cents x rbp <= 525 = 5e10 — double-exact, so floor(x/120000)
    == integer div for the nonneg operands; documented bound). The
    fixed payment uses q^12 as a LEFT-ASSOCIATIVE 12-fold product
    chain — identical text on both engines makes the double
    bit-identical without pow() (1-ulp non-portable, the
    q_pythagorean_means finding) — then ONE floor quantization to
    cents. Month 12 pays off the remainder exactly (balance pinned to
    0 by the witness). Spark runs the fold per loan inside ONE
    F.aggregate over sequence(1,12) with an append-array accumulator
    (the q_ema_crossover shape — no shuffle, no window, map-only);
    the oracle replays the identical fold as a bounded RECURSIVE CTE.
    At 100 TB: embarrassingly parallel per loan; 12 rows out per
    loan."""
    loans = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(
            F.col("c_custkey").alias("id"),
            F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("p"),
            (300 + 25 * (F.col("c_nationkey") % 10))
            .cast("bigint")
            .alias("rbp"),
        )
    )
    q = 1.0 + F.col("rbp").cast("double") / 120000.0
    q12 = q * q * q * q * q * q * q * q * q * q * q * q
    pay = loans.select(
        "id",
        "p",
        "rbp",
        F.floor(
            F.col("p").cast("double")
            * (F.col("rbp").cast("double") / 120000.0)
            * q12
            / (q12 - 1.0)
            + 0.5
        )
        .cast("bigint")
        .alias("a"),
    )
    row_t = (
        "array<struct<k:int,pay_c:bigint,int_c:bigint,"
        "prin_c:bigint,bal:bigint>>"
    )

    def step(acc, k):
        bal = acc["bal"]
        intc = F.floor(
            (bal * F.col("rbp")).cast("double") / 120000.0
        ).cast("bigint")
        payc = F.when(k == 12, bal + intc).otherwise(
            F.least(F.col("a"), bal + intc)
        )
        princ = (payc - intc).cast("bigint")
        nbal = (bal - princ).cast("bigint")
        row = F.struct(
            k.cast("int").alias("k"),
            payc.cast("bigint").alias("pay_c"),
            intc.cast("bigint").alias("int_c"),
            princ.alias("prin_c"),
            nbal.alias("bal"),
        )
        return F.struct(
            nbal.alias("bal"),
            F.array_append(acc["rows"], row).alias("rows"),
        )

    folded = pay.select(
        "id",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(12)),
            F.struct(
                F.col("p").alias("bal"),
                F.array().cast(row_t).alias("rows"),
            ),
            step,
        )["rows"].alias("rows"),
    )
    r = F.col("r")
    return (
        folded.select("id", F.explode("rows").alias("r"))
        .select(
            "id",
            r["k"].alias("k"),
            r["pay_c"].alias("pay_c"),
            r["int_c"].alias("int_c"),
            r["prin_c"].alias("prin_c"),
            r["bal"].alias("bal"),
        )
        .orderBy("id", "k")
    )


@staged(
    "q_irr_lattice",
    oracle="""
    WITH cf AS (
      SELECT o_orderpriority AS g,
        CAST(-((9 * SUM(CASE WHEN year(o_orderdate) = 1995
          THEN CAST(round(o_totalprice * 100) AS BIGINT) END)) // 5)
          AS BIGINT) AS cf0,
        CAST(SUM(CASE WHEN year(o_orderdate) = 1996
          THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
          AS cf1,
        CAST(SUM(CASE WHEN year(o_orderdate) = 1997
          THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
          AS cf2,
        CAST(SUM(CASE WHEN year(o_orderdate) = 1998
          THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
          AS cf3
      FROM orders WHERE year(o_orderdate) <= 1998
      GROUP BY o_orderpriority
    ),
    grid AS (SELECT CAST(m AS BIGINT) AS m FROM range(0, 4097) AS t(m)),
    npv AS (
      SELECT cf.g, grid.m,
        CAST(cf.cf0 AS HUGEINT) * CAST((1024 + grid.m) AS HUGEINT)
          * CAST((1024 + grid.m) AS HUGEINT)
          * CAST((1024 + grid.m) AS HUGEINT)
        + CAST(cf.cf1 AS HUGEINT) * CAST((1024 + grid.m) AS HUGEINT)
          * CAST((1024 + grid.m) AS HUGEINT) * CAST(1024 AS HUGEINT)
        + CAST(cf.cf2 AS HUGEINT) * CAST((1024 + grid.m) AS HUGEINT)
          * CAST(1024 AS HUGEINT) * CAST(1024 AS HUGEINT)
        + CAST(cf.cf3 AS HUGEINT) * CAST(1024 AS HUGEINT)
          * CAST(1024 AS HUGEINT) * CAST(1024 AS HUGEINT) AS p
      FROM cf CROSS JOIN grid
    ),
    star AS (
      SELECT g, CAST(MAX(CASE WHEN p > 0 THEN m END) AS BIGINT) AS m_star
      FROM npv GROUP BY g
    )
    SELECT star.g AS g, cf.cf0, cf.cf1, cf.cf2, cf.cf3, star.m_star,
           CAST(star.m_star AS DOUBLE) / 1024.0 AS irr_lo,
           CAST(a.p AS DECIMAL(38, 0)) AS p_at,
           CAST(b.p AS DECIMAL(38, 0)) AS p_next
    FROM star
    JOIN cf ON cf.g = star.g
    LEFT JOIN npv a ON a.g = star.g AND a.m = star.m_star
    LEFT JOIN npv b ON b.g = star.g AND b.m = star.m_star + 1
    ORDER BY g
    """,
)
def q_irr_lattice(spark, sf_dir):
    """EXACT-LATTICE IRR — internal rate of return located WITHOUT a
    single float sign decision: cash flows per priority (year-0
    outlay = -(9*s div 5), i.e. 1.8x the 1995 cents integer-exactly —
    a 2x outlay left 1-URGENT never breaking even at sf0.001 —
    inflows 1996-98) make NPV(r) a cubic in
    d = 1+r; on the rate lattice r = m/1024 the sign of NPV equals
    the sign of the EXACT integer polynomial P(m) = cf0*(1024+m)^3 +
    cf1*(1024+m)^2*1024 + cf2*(1024+m)*1024^2 + cf3*1024^3 (<= ~1e21
    at sf0.1 — HUGEINT on the oracle, DECIMAL(38,0) on Spark, the
    q_knee_detection precedent). NPV is strictly decreasing in r
    (cf0 < 0, inflows after — monotonicity witness-pinned), so the
    IRR bracket is the argmax m with P(m) > 0 over the 4097-point
    broadcast grid — ONE bounded fan-out + one argmax agg instead of
    serial bisection (the grid version of q_quantile_bisect's
    rank-by-counting: at 100 TB the cells are 5 groups x 4097 —
    O(1) vs data). Emitted p_at/p_next are the exact bracketing sign
    proof; irr_lo = m_star/1024 is one division."""
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") <= 1998)

    def cfy(yr, i):
        s = F.sum(
            F.when(
                F.year("o_orderdate") == yr,
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
            )
        )
        if i == 0:
            # 1.8x outlay, integer-exact: -((9*s) div 5); the x2 form
            # left 1-URGENT at sf0.001 never breaking even (NPV(0)<0)
            return (-F.expr("CAST((9 * {0}) div 5 AS BIGINT)".format(
                "SUM(CASE WHEN year(o_orderdate) = 1995 THEN "
                "CAST(round(o_totalprice * 100) AS BIGINT) END)"
            ))).cast("bigint").alias("cf0")
        return s.cast("bigint").alias(f"cf{i}")

    cf = o.groupBy(F.col("o_orderpriority").alias("g")).agg(
        cfy(1995, 0), cfy(1996, 1), cfy(1997, 2), cfy(1998, 3)
    )
    grid = spark.range(4097).select(F.col("id").cast("bigint").alias("m"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nd = dec(1024 + F.col("m"))
    s1024 = dec(F.lit(1024))
    p = (
        dec(F.col("cf0")) * nd * nd * nd
        + dec(F.col("cf1")) * nd * nd * s1024
        + dec(F.col("cf2")) * nd * s1024 * s1024
        + dec(F.col("cf3")) * s1024 * s1024 * s1024
    )
    npv = cf.crossJoin(F.broadcast(grid)).select(
        "g", "m", "cf0", "cf1", "cf2", "cf3", p.alias("p")
    )
    npv = track_persist(npv)
    star = npv.groupBy("g").agg(
        F.max(F.when(F.col("p") > 0, F.col("m")))
        .cast("bigint")
        .alias("m_star")
    )
    a = npv.select(
        F.col("g").alias("ga"),
        F.col("m").alias("ma"),
        F.col("p").alias("p_at"),
    )
    b = npv.select(
        F.col("g").alias("gb"),
        F.col("m").alias("mb"),
        F.col("p").alias("p_next"),
    )
    return (
        star.join(F.broadcast(cf), "g")
        .join(
            F.broadcast(a),
            (F.col("ga") == F.col("g"))
            & (F.col("ma") == F.col("m_star")),
            "left",
        )
        .join(
            F.broadcast(b),
            (F.col("gb") == F.col("g"))
            & (F.col("mb") == F.col("m_star") + 1),
            "left",
        )
        .select(
            "g",
            "cf0",
            "cf1",
            "cf2",
            "cf3",
            "m_star",
            (F.col("m_star").cast("double") / 1024.0).alias("irr_lo"),
            "p_at",
            "p_next",
        )
        .orderBy("g")
    )


@staged(
    "q_german_tank",
    oracle="""
    WITH gs AS (
      SELECT o_orderpriority AS g,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(MAX(o_orderkey) AS BIGINT) AS m,
             CAST(SUM(o_orderkey) AS BIGINT) AS s
      FROM orders GROUP BY o_orderpriority
    )
    SELECT g, k, m, s,
           CAST(m * (k + 1) - k AS BIGINT) AS mvue_num,
           CAST(m * (k + 1) - k AS DOUBLE) / CAST(k AS DOUBLE) AS mvue,
           CAST(2 * s - k AS DOUBLE) / CAST(k AS DOUBLE) AS moment,
           CAST(floor((ln(CAST(m AS DOUBLE))
             - ln(0.05) / CAST(k AS DOUBLE)) * 1000000000.0 + 0.5)
             AS BIGINT) AS ln_upper_nano
    FROM gs ORDER BY g
    """,
)
def q_german_tank(spark, sf_dir):
    """GERMAN-TANK population estimator per stratum — the
    serial-number capture estimate (the frequentist cousin of
    q_capture_recapture): each priority class samples the global
    orderkey space, and N-hat is recovered three ways — MVUE
    m + m/k - 1 (emitted as the EXACT integer numerator m(k+1) - k
    plus one division), the moment estimator 2*mean - 1 = (2s - k)/k
    (same exact-numerator discipline), and the (1-alpha) upper
    confidence bound m * alpha^(-1/k) carried in LOG form on the 1e-9
    lattice (ln m - ln(0.05)/k — no pow()/exp(), the
    q_pythagorean_means finding). All sufficient stats (k, max, sum)
    are one map-side-combined agg — the textbook mergeable-statistic
    shape; at 100 TB nothing but the 5 group rows survives the
    scan."""
    gs = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("g"))
        .agg(
            F.count("*").cast("bigint").alias("k"),
            F.max("o_orderkey").cast("bigint").alias("m"),
            F.sum("o_orderkey").cast("bigint").alias("s"),
        )
    )
    nano = lambda col: F.floor(col * 1000000000.0 + 0.5).cast(  # noqa: E731
        "bigint"
    )
    kd = F.col("k").cast("double")
    return gs.select(
        "g",
        "k",
        "m",
        "s",
        (F.col("m") * (F.col("k") + 1) - F.col("k"))
        .cast("bigint")
        .alias("mvue_num"),
        (
            (F.col("m") * (F.col("k") + 1) - F.col("k")).cast("double") / kd
        ).alias("mvue"),
        ((2 * F.col("s") - F.col("k")).cast("double") / kd).alias("moment"),
        nano(
            F.log(F.col("m").cast("double")) - F.log(F.lit(0.05)) / kd
        ).alias("ln_upper_nano"),
    ).orderBy("g")


# =====================================================================
# Round-13 staged batch 7 — survey weighting, stylometry, districting
# and fairness audits.
# =====================================================================

from ..operators import dedup as dd  # noqa: E402

# same single-space tokenizer the catalog's document family uses
# (operators/dedup.py TOKENS_EXPR <-> catalog.py _DUCK_TOKENS)
_DUCK_TOKENS_STAGING = (
    "list_filter(string_split(lower(text), ' '), t -> t != '')"
)

@staged(
    "q_ipf_raking",
    oracle="""
    WITH cells AS (
      SELECT event_type AS t, CAST(user_id % 4 AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, user_id % 4
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot FROM cells),
    w0 AS (SELECT t, b, n, CAST(1000000000 AS BIGINT) AS w FROM cells),
    w1 AS (
      SELECT c.t, c.b, c.n,
        CAST(floor(CAST(c.w AS DOUBLE) * CAST(tot.n_tot AS DOUBLE)
          * 1000000000.0 / (5.0 * CAST(rm.s AS DOUBLE)) + 0.5)
          AS BIGINT) AS w
      FROM w0 c
      JOIN (SELECT t, CAST(SUM(n * w) AS BIGINT) AS s FROM w0
            GROUP BY t) rm ON rm.t = c.t
      CROSS JOIN tot
    ),
    w2 AS (
      SELECT c.t, c.b, c.n,
        CAST(floor(CAST(c.w AS DOUBLE) * CAST(tot.n_tot AS DOUBLE)
          * 1000000000.0 / (4.0 * CAST(cm.s AS DOUBLE)) + 0.5)
          AS BIGINT) AS w
      FROM w1 c
      JOIN (SELECT b, CAST(SUM(n * w) AS BIGINT) AS s FROM w1
            GROUP BY b) cm ON cm.b = c.b
      CROSS JOIN tot
    ),
    w3 AS (
      SELECT c.t, c.b, c.n,
        CAST(floor(CAST(c.w AS DOUBLE) * CAST(tot.n_tot AS DOUBLE)
          * 1000000000.0 / (5.0 * CAST(rm.s AS DOUBLE)) + 0.5)
          AS BIGINT) AS w
      FROM w2 c
      JOIN (SELECT t, CAST(SUM(n * w) AS BIGINT) AS s FROM w2
            GROUP BY t) rm ON rm.t = c.t
      CROSS JOIN tot
    ),
    w4 AS (
      SELECT c.t, c.b, c.n,
        CAST(floor(CAST(c.w AS DOUBLE) * CAST(tot.n_tot AS DOUBLE)
          * 1000000000.0 / (4.0 * CAST(cm.s AS DOUBLE)) + 0.5)
          AS BIGINT) AS w
      FROM w3 c
      JOIN (SELECT b, CAST(SUM(n * w) AS BIGINT) AS s FROM w3
            GROUP BY b) cm ON cm.b = c.b
      CROSS JOIN tot
    ),
    w5 AS (
      SELECT c.t, c.b, c.n,
        CAST(floor(CAST(c.w AS DOUBLE) * CAST(tot.n_tot AS DOUBLE)
          * 1000000000.0 / (5.0 * CAST(rm.s AS DOUBLE)) + 0.5)
          AS BIGINT) AS w
      FROM w4 c
      JOIN (SELECT t, CAST(SUM(n * w) AS BIGINT) AS s FROM w4
            GROUP BY t) rm ON rm.t = c.t
      CROSS JOIN tot
    ),
    w6 AS (
      SELECT c.t, c.b, c.n,
        CAST(floor(CAST(c.w AS DOUBLE) * CAST(tot.n_tot AS DOUBLE)
          * 1000000000.0 / (4.0 * CAST(cm.s AS DOUBLE)) + 0.5)
          AS BIGINT) AS w
      FROM w5 c
      JOIN (SELECT b, CAST(SUM(n * w) AS BIGINT) AS s FROM w5
            GROUP BY b) cm ON cm.b = c.b
      CROSS JOIN tot
    )
    SELECT t, b, n, w AS w_nano,
           CAST(n * w AS DOUBLE) / 1000000000.0 AS fitted
    FROM w6 ORDER BY t, b
    """,
)
def q_ipf_raking(spark, sf_dir):
    """ITERATIVE PROPORTIONAL FITTING (survey raking) — the
    matrix-scaling mechanism behind post-stratification weighting and
    doubly-constrained gravity models: 3 full sweeps alternately scale
    the (event_type x user-bucket) weight table so row sums match the
    uniform 1/5 target and column sums the uniform 1/4 target. The
    CLASSIC algorithm is a float fixpoint; here every weight lives on
    the 1e-9 nano lattice as a BIGINT and each margin sum S = sum n*w
    is EXACT integer arithmetic, so the adjustment ratio is one
    identical double chain (w * n_tot * 1e9 / (k * S), floor +0.5) and
    the whole iteration is bit-deterministic across engines and
    partitionings — lattice IPF. Spark: 6 unrolled margin-agg +
    broadcast-join steps over the 20-cell relation; the oracle unrolls
    the identical 6 CTEs. At 100 TB: raw volume dies in the first
    cell agg; every sweep is O(cells)."""
    cells = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            (F.col("user_id") % 4).cast("bigint").alias("b"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = cells.agg(F.sum("n").cast("bigint").alias("n_tot"))
    w = cells.select(
        "t", "b", "n", F.lit(1000000000).cast("bigint").alias("w")
    ).crossJoin(F.broadcast(tot))
    for step in range(6):
        key, k = (("t", 5.0) if step % 2 == 0 else ("b", 4.0))
        marg = w.groupBy(key).agg(
            F.sum(F.col("n") * F.col("w")).cast("bigint").alias("s")
        )
        w = (
            w.join(F.broadcast(marg), key)
            .select(
                "t",
                "b",
                "n",
                F.floor(
                    F.col("w").cast("double")
                    * F.col("n_tot").cast("double")
                    * 1000000000.0
                    / (F.lit(k) * F.col("s").cast("double"))
                    + 0.5
                )
                .cast("bigint")
                .alias("w"),
                "n_tot",
            )
        )
    return w.select(
        "t",
        "b",
        "n",
        F.col("w").alias("w_nano"),
        (
            (F.col("n") * F.col("w")).cast("double") / 1000000000.0
        ).alias("fitted"),
    ).orderBy("t", "b")


@staged(
    "q_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKENS_STAGING}) AS tk
      FROM documents
    ),
    topw AS (
      SELECT tk FROM (
        SELECT tk, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tk
        ORDER BY c DESC, tk LIMIT 15
      )
    ),
    stot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS total
      FROM toks GROUP BY source
    ),
    cnt AS (
      SELECT toks.source, toks.tk, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks JOIN topw ON topw.tk = toks.tk
      GROUP BY toks.source, toks.tk
    ),
    grid AS (
      SELECT stot.source, topw.tk, stot.total,
             CAST(COALESCE(cnt.c, 0) AS BIGINT) AS c
      FROM stot CROSS JOIN topw
      LEFT JOIN cnt ON cnt.source = stot.source AND cnt.tk = topw.tk
    ),
    f AS (
      SELECT source, tk, CAST((c * 1000000000) // total AS BIGINT)
        AS f_nano
      FROM grid
    ),
    wstats AS (
      SELECT tk, CAST(COUNT(*) AS BIGINT) AS s,
             CAST(SUM(f_nano) AS BIGINT) AS f1,
             CAST(SUM(f_nano * f_nano) AS BIGINT) AS f2
      FROM f GROUP BY tk
    ),
    z AS (
      SELECT f.source, f.tk,
        CASE WHEN wstats.s * wstats.f2 - wstats.f1 * wstats.f1 = 0
          THEN CAST(0 AS BIGINT)
          ELSE CAST(floor(
            CAST(wstats.s * f.f_nano - wstats.f1 AS DOUBLE)
            / sqrt(CAST(wstats.s * wstats.f2
                        - wstats.f1 * wstats.f1 AS DOUBLE))
            * 1000000.0 + 0.5) AS BIGINT) END AS z_micro
      FROM f JOIN wstats ON wstats.tk = f.tk
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(SUM(ABS(a.z_micro - b.z_micro)) AS BIGINT)
             AS sum_absz_micro,
           CAST(SUM(ABS(a.z_micro - b.z_micro)) AS DOUBLE)
             / 15000000.0 AS delta
    FROM z a JOIN z b ON a.tk = b.tk AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
)
def q_burrows_delta(spark, sf_dir):
    """BURROWS' DELTA authorship/stylometry distance between sources —
    the forensic-linguistics screen (z-scored relative frequencies of
    the top-15 function words, mean absolute z difference per source
    pair): relative frequencies are EXACT integer-division nanos
    (c*1e9 div total); per-word cross-source moments F1 = sum f,
    F2 = sum f^2 are exact BIGINTs so z = (S*f - F1)/sqrt(S*F2 - F1^2)
    is one identical chain (the constant-word degenerate case is
    decided by the EXACT integer discriminant = 0, not a NaN); z is
    re-latticed at 1e-6 so the pairwise |z_a - z_b| sums are exact
    integer arithmetic and delta is ONE division. Dense 20x15
    source-word grid (absent counts coalesce to 0 — a missing cell IS
    a style signal). At 100 TB: token volume dies in the (source,
    word) agg; the pair join runs on 300 bounded z rows."""
    toks = _t(spark, sf_dir, "documents").select(
        "source", F.explode(dd.tokens_col("text")).alias("tk")
    )
    toks = track_persist(toks)
    topw = (
        toks.groupBy("tk")
        .agg(F.count("*").cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), "tk")
        .limit(15)
        .select("tk")
    )
    stot = toks.groupBy("source").agg(
        F.count("*").cast("bigint").alias("total")
    )
    cnt = (
        toks.join(F.broadcast(topw), "tk")
        .groupBy("source", "tk")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    grid = (
        stot.crossJoin(F.broadcast(topw))
        .join(F.broadcast(cnt), ["source", "tk"], "left")
        .select(
            "source",
            "tk",
            F.expr("CAST((COALESCE(c, 0) * 1000000000) div total AS BIGINT)")
            .alias("f_nano"),
        )
    )
    wstats = grid.groupBy("tk").agg(
        F.count("*").cast("bigint").alias("s"),
        F.sum("f_nano").cast("bigint").alias("f1"),
        F.sum(F.col("f_nano") * F.col("f_nano"))
        .cast("bigint")
        .alias("f2"),
    )
    disc = F.col("s") * F.col("f2") - F.col("f1") * F.col("f1")
    z = (
        grid.join(F.broadcast(wstats), "tk")
        .select(
            "source",
            "tk",
            F.when(disc == 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.floor(
                    (F.col("s") * F.col("f_nano") - F.col("f1")).cast(
                        "double"
                    )
                    / F.sqrt(disc.cast("double"))
                    * 1000000.0
                    + 0.5
                ).cast("bigint")
            )
            .alias("z_micro"),
        )
    )
    a = z.select(
        F.col("source").alias("source_a"),
        "tk",
        F.col("z_micro").alias("za"),
    )
    b = z.select(
        F.col("source").alias("source_b"),
        "tk",
        F.col("z_micro").alias("zb"),
    )
    return (
        a.join(
            F.broadcast(b),
            (a["tk"] == b["tk"]) & (F.col("source_a") < F.col("source_b")),
        )
        .drop(b["tk"])
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.abs(F.col("za") - F.col("zb")))
            .cast("bigint")
            .alias("sum_absz_micro")
        )
        .select(
            "source_a",
            "source_b",
            "sum_absz_micro",
            (F.col("sum_absz_micro").cast("double") / 15000000.0).alias(
                "delta"
            ),
        )
        .orderBy("source_a", "source_b")
    )


@staged(
    "q_efficiency_gap",
    oracle="""
    WITH votes AS (
      SELECT CAST(o_custkey % 15 AS BIGINT) AS d,
        CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS va,
        CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS vb
      FROM orders GROUP BY o_custkey % 15
    ),
    wasted AS (
      SELECT d, va, vb,
        CASE WHEN va > vb THEN 'A' WHEN vb > va THEN 'B'
          ELSE 'TIE' END AS winner,
        CASE WHEN va > vb THEN va - ((va + vb) // 2 + 1)
          ELSE va END AS wasted_a,
        CASE WHEN vb > va THEN vb - ((va + vb) // 2 + 1)
          ELSE vb END AS wasted_b
      FROM votes
    ),
    tot AS (
      SELECT CAST(SUM(wasted_a) AS BIGINT) AS wa,
             CAST(SUM(wasted_b) AS BIGINT) AS wb,
             CAST(SUM(va + vb) AS BIGINT) AS v
      FROM wasted
    )
    SELECT wasted.d, wasted.va, wasted.vb, wasted.winner,
           CAST(wasted.wasted_a AS BIGINT) AS wasted_a,
           CAST(wasted.wasted_b AS BIGINT) AS wasted_b,
           (CAST(tot.wa AS DOUBLE) - CAST(tot.wb AS DOUBLE))
             / CAST(tot.v AS DOUBLE) AS efficiency_gap
    FROM wasted CROSS JOIN tot ORDER BY wasted.d
    """,
)
def q_efficiency_gap(spark, sf_dir):
    """EFFICIENCY GAP districting audit — the wasted-votes asymmetry
    measure from the gerrymandering literature (Stephanopoulos-McGhee):
    districts = custkey mod 15, party by orderkey parity (a
    deterministic near-50/50 electorate, so winners genuinely vary by
    district); a winner's wasted votes are the surplus above the
    majority threshold floor(total/2)+1, a loser's are ALL its votes;
    EG = (sum wasted_A - sum wasted_B) / total votes. Every count,
    threshold and surplus is decided in exact BIGINT arithmetic
    (integer-div threshold identical on both engines); the single
    emitted double is one subtraction + division over the 1-row
    broadcast totals. At 100 TB: one conditional agg on the district
    key, then O(districts) readout."""
    votes = (
        _t(spark, sf_dir, "orders")
        .groupBy((F.col("o_custkey") % 15).cast("bigint").alias("d"))
        .agg(
            F.sum(F.when(F.col("o_orderkey") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("va"),
            F.sum(F.when(F.col("o_orderkey") % 2 == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("vb"),
        )
    )
    thresh = F.expr("(va + vb) div 2 + 1")
    wasted = votes.select(
        "d",
        "va",
        "vb",
        F.when(F.col("va") > F.col("vb"), "A")
        .when(F.col("vb") > F.col("va"), "B")
        .otherwise("TIE")
        .alias("winner"),
        F.when(F.col("va") > F.col("vb"), F.col("va") - thresh)
        .otherwise(F.col("va"))
        .cast("bigint")
        .alias("wasted_a"),
        F.when(F.col("vb") > F.col("va"), F.col("vb") - thresh)
        .otherwise(F.col("vb"))
        .cast("bigint")
        .alias("wasted_b"),
    )
    wasted = track_persist(wasted)
    tot = wasted.agg(
        F.sum("wasted_a").cast("bigint").alias("wa"),
        F.sum("wasted_b").cast("bigint").alias("wb"),
        F.sum(F.col("va") + F.col("vb")).cast("bigint").alias("v"),
    )
    return (
        wasted.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "va",
            "vb",
            "winner",
            "wasted_a",
            "wasted_b",
            (
                (F.col("wa").cast("double") - F.col("wb").cast("double"))
                / F.col("v").cast("double")
            ).alias("efficiency_gap"),
        )
        .orderBy("d")
    )


@staged(
    "q_jain_fairness",
    oracle="""
    WITH peruser AS (
      SELECT event_type AS t, user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM events GROUP BY event_type, user_id
    ),
    gs AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS sum_cents,
             CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
               AS DECIMAL(38, 0)) AS sumsq,
             CAST(MAX(x) AS BIGINT) AS max_cents,
             CAST(MIN(x) AS BIGINT) AS min_cents
      FROM peruser GROUP BY t
    )
    SELECT t, n_users, sum_cents, sumsq, max_cents, min_cents,
           (CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE))
             / (CAST(n_users AS DOUBLE) * CAST(sumsq AS DOUBLE))
             AS jain,
           (CAST(10 AS HUGEINT) * CAST(sum_cents AS HUGEINT)
              * CAST(sum_cents AS HUGEINT)
            > CAST(9 AS HUGEINT) * CAST(n_users AS HUGEINT)
              * CAST(sumsq AS HUGEINT)) AS fair
    FROM gs ORDER BY t
    """,
)
def q_jain_fairness(spark, sf_dir):
    """JAIN'S FAIRNESS INDEX per event type over per-user spend —
    the resource-allocation equity gauge networking and scheduler
    audits use (J = (sum x)^2 / (n * sum x^2), 1 = perfectly fair,
    1/n = one user holds everything): per-user cents are exact; the
    squared sum crosses int64 at sf1 so sum x^2 accumulates in
    HUGEINT/DECIMAL(38,0) (the q_knee_detection precedent); J is one
    identical double chain over the exact group stats, and the J > 0.9
    verdict is decided EXACTLY as the integer inequality
    10*(sum x)^2 > 9*n*sumsq in 128-bit — a float never classifies.
    At 100 TB: two hash aggs (user-keyed, then type-keyed), both
    map-side combinable."""
    peruser = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("t"), "user_id")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    xd = F.col("x").cast("decimal(38,0)")
    gs = peruser.groupBy("t").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sum_cents"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sumsq"),
        F.max("x").cast("bigint").alias("max_cents"),
        F.min("x").cast("bigint").alias("min_cents"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return gs.select(
        "t",
        "n_users",
        "sum_cents",
        "sumsq",
        "max_cents",
        "min_cents",
        (
            (F.col("sum_cents").cast("double") * F.col("sum_cents").cast("double"))
            / (F.col("n_users").cast("double") * F.col("sumsq").cast("double"))
        ).alias("jain"),
        (
            dec(F.lit(10)) * dec(F.col("sum_cents")) * dec(F.col("sum_cents"))
            > dec(F.lit(9)) * dec(F.col("n_users")) * F.col("sumsq")
        ).alias("fair"),
    ).orderBy("t")


# =====================================================================
# Round-13 staged batch 8 — adaptive-gain filtering, Markov-chain
# information rate, and paired-comparison ranking.
# =====================================================================

_KF_STEP_SPARK = (
    " array("
    "  element_at(acc, 1) + ((element_at(acc, 2) + 4.0)"
    "   / (element_at(acc, 2) + 4.0 + 64.0))"
    "   * (element_at(x, 1) - element_at(acc, 1)),"
    "  (1.0 - ((element_at(acc, 2) + 4.0)"
    "   / (element_at(acc, 2) + 4.0 + 64.0)))"
    "   * (element_at(acc, 2) + 4.0))"
)

_KF_STEP_DUCK = (
    " [acc[1] + ((acc[2] + 4.0) / (acc[2] + 4.0 + 64.0))"
    "   * (x[1] - acc[1]),"
    "  (1.0 - ((acc[2] + 4.0) / (acc[2] + 4.0 + 64.0)))"
    "   * (acc[2] + 4.0)]"
)


@staged(
    "q_kalman_1d",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
    ),
    base AS (
      SELECT grid.t, grid.d,
             CAST(COALESCE(daily.cents, 0) AS DOUBLE) / 100.0 AS z
      FROM grid LEFT JOIN daily
        ON daily.t = grid.t AND daily.d = grid.d
    ),
    series AS (
      SELECT t, list([z, CAST(0.0 AS DOUBLE)] ORDER BY d) AS xs
      FROM base GROUP BY t
    ),
    filt AS (
      SELECT t, list_reduce(xs, (acc, x) -> {_KF_STEP_DUCK}) AS st
      FROM series
    )
    SELECT t, CAST(30 AS BIGINT) AS n_days,
           st[1] AS kf_level, st[2] AS kf_var
    FROM filt ORDER BY t
    """,
)
def q_kalman_1d(spark, sf_dir):
    """1-D KALMAN FILTER over each key's daily-revenue series — the
    ADAPTIVE-GAIN step beyond the fixed-coefficient smoothing ladder
    (q_ewma -> q_holt_smoothing -> q_holt_winters): the gain
    K = P1/(P1+R) is recomputed from the state covariance every step
    (P1 = P + Q, Q=4, R=64 — dyadic literals), so unlike Holt the
    update cannot be pre-expanded to constant coefficients; instead
    BOTH engines run the IDENTICAL written operation sequence (every
    op is +,-,*,/ — correctly rounded — so identical text => identical
    doubles; the q_holt_smoothing portability argument extended to
    data-dependent coefficients). Accumulator is the 2-element LIST
    [x, P] (simultaneous update — the pinned DuckDB struct-lambda
    quirk), seeded from the first measurement with P0 = 0 (first
    observation trusted). One dense 30-day grid and one fold per key —
    no window, no shuffle beyond the daily agg. At 100 TB: raw volume
    dies in the (key, day) agg."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("t"),
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("d"),
    ).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("cents")
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
    )
    base = grid.join(daily, ["t", "d"], "left").select(
        "t",
        "d",
        (
            F.coalesce("cents", F.lit(0)).cast("double") / 100.0
        ).alias("z"),
    )
    series = base.groupBy("t").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, z))),"
            " p -> array(p.z, CAST(0.0 AS DOUBLE)))"
        ).alias("xs")
    )
    filt = series.select(
        "t",
        F.expr(
            "aggregate(slice(xs, 2, 29), element_at(xs, 1),"
            f" (acc, x) -> {_KF_STEP_SPARK})"
        ).alias("st"),
    )
    return filt.select(
        "t",
        F.lit(30).cast("bigint").alias("n_days"),
        F.expr("element_at(st, 1)").alias("kf_level"),
        F.expr("element_at(st, 2)").alias("kf_var"),
    ).orderBy("t")


@staged(
    "q_transition_entropy",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    cells AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    margins AS (
      SELECT cur, CAST(SUM(c) AS BIGINT) AS ct FROM cells GROUP BY cur
    ),
    terms AS (
      SELECT cells.cur, cells.c,
             margins.ct,
             cells.c * CAST(floor(ln(CAST(margins.ct AS DOUBLE)
               / CAST(cells.c AS DOUBLE)) * 1000000000.0 + 0.5)
               AS BIGINT) AS nano
      FROM cells JOIN margins ON margins.cur = cells.cur
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_trans,
             CAST(SUM(nano) AS BIGINT) AS h_nano_n
      FROM terms
    )
    SELECT terms.cur AS cur, terms.ct AS c_cur,
           CAST(SUM(terms.nano) AS BIGINT) AS h_state_nano,
           CAST(SUM(terms.nano) AS DOUBLE)
             / (CAST(terms.ct AS DOUBLE) * 1000000000.0) AS h_state_nats,
           tot.n_trans, tot.h_nano_n,
           CAST(tot.h_nano_n AS DOUBLE)
             / (CAST(tot.n_trans AS DOUBLE) * 1000000000.0)
             AS h_cond_nats
    FROM terms CROSS JOIN tot
    GROUP BY terms.cur, terms.ct, tot.n_trans, tot.h_nano_n
    ORDER BY cur
    """,
)
def q_transition_entropy(spark, sf_dir):
    """CONDITIONAL ENTROPY of the event-type Markov chain — the
    information-rate summary on top of q_markov_transitions' matrix
    (H(next|cur) = sum p(x,y) ln(c_x/c_xy); also the chain's
    perplexity in log form): per-user sequences order by (ts,
    event_id) — one lead window per user — then the 25-cell transition
    agg kills raw volume. Every log term is materialized on the 1e-9
    lattice BEFORE count-weighted exact BIGINT sums (the q_mutual_info
    discipline): per-state H(next|cur=x) rows plus the exact global
    numerator attached by broadcast. ln(ct/c) >= 0 always (ct >= c),
    so the lattice is sign-stable. At 100 TB: one user-keyed window +
    one bounded agg."""
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    cells = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    margins = cells.groupBy("cur").agg(
        F.sum("c").cast("bigint").alias("ct")
    )
    terms = cells.join(F.broadcast(margins), "cur").select(
        "cur",
        "c",
        "ct",
        (
            F.col("c")
            * F.floor(
                F.log(
                    F.col("ct").cast("double") / F.col("c").cast("double")
                )
                * 1000000000.0
                + 0.5
            ).cast("bigint")
        ).alias("nano"),
    )
    terms = track_persist(terms)
    tot = terms.agg(
        F.sum("c").cast("bigint").alias("n_trans"),
        F.sum("nano").cast("bigint").alias("h_nano_n"),
    )
    return (
        terms.groupBy("cur", "ct")
        .agg(F.sum("nano").cast("bigint").alias("h_state_nano"))
        .crossJoin(F.broadcast(tot))
        .select(
            "cur",
            F.col("ct").alias("c_cur"),
            "h_state_nano",
            (
                F.col("h_state_nano").cast("double")
                / (F.col("ct").cast("double") * 1000000000.0)
            ).alias("h_state_nats"),
            "n_trans",
            "h_nano_n",
            (
                F.col("h_nano_n").cast("double")
                / (F.col("n_trans").cast("double") * 1000000000.0)
            ).alias("h_cond_nats"),
        )
        .orderBy("cur")
    )


_BT_TYPES = ("click", "error", "purchase", "signup", "view")
_BT_PAIRS = [
    (a, b)
    for i, a in enumerate(_BT_TYPES)
    for b in _BT_TYPES[i + 1 :]
]


def _bt_oracle() -> str:
    # single-row pivot: per unordered pair (a<b), match count n_a_b and
    # a's wins w_a_b (tie -> a, the lexicographically smaller)
    aggs = []
    for a, b in _BT_PAIRS:
        aggs.append(
            f"CAST(SUM(CASE WHEN t1 = '{a}' AND t2 = '{b}'"
            f" THEN 1 ELSE 0 END) AS BIGINT) AS n_{a}_{b}"
        )
        aggs.append(
            f"CAST(SUM(CASE WHEN t1 = '{a}' AND t2 = '{b}'"
            f" AND c1 >= c2 THEN 1 ELSE 0 END) AS BIGINT) AS w_{a}_{b}"
        )
    wins = []
    for t in _BT_TYPES:
        parts = []
        for a, b in _BT_PAIRS:
            if a == t:
                parts.append(f"w_{a}_{b}")
            elif b == t:
                parts.append(f"(n_{a}_{b} - w_{a}_{b})")
        wins.append(" + ".join(parts) + f" AS wins_{t}")

    def denom(t, pi):
        parts = []
        for a, b in _BT_PAIRS:
            if a == t:
                parts.append(
                    f"CAST(n_{a}_{b} AS DOUBLE) / ({pi}_{t} + {pi}_{b})"
                )
            elif b == t:
                parts.append(
                    f"CAST(n_{a}_{b} AS DOUBLE) / ({pi}_{t} + {pi}_{a})"
                )
        return " + ".join(parts)

    it1 = ", ".join(
        f"CAST(wins_{t} AS DOUBLE) / ({denom(t, 'pi0')}) AS pi1_{t}"
        for t in _BT_TYPES
    )
    it2 = ", ".join(
        f"CAST(wins_{t} AS DOUBLE) / ({denom(t, 'pi1')}) AS pi2_{t}"
        for t in _BT_TYPES
    )
    pi_sum = " + ".join(f"pi2_{t}" for t in _BT_TYPES)
    shares = ", ".join(
        f"CAST(floor(pi2_{t} * 1000000000.0 / ({pi_sum}) + 0.5)"
        f" AS BIGINT) AS share_{t}_nano"
        for t in _BT_TYPES
    )
    final_cols = ", ".join(
        [f"wins_{t}" for t in _BT_TYPES]
        + [f"pi2_{t}" for t in _BT_TYPES]
    )
    return f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, event_type AS t,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2, 3
    ),
    matches AS (
      SELECT a.t AS t1, b.t AS t2, a.cents AS c1, b.cents AS c2
      FROM daily a JOIN daily b
        ON a.user_id = b.user_id AND a.d = b.d AND a.t < b.t
    ),
    piv AS (SELECT {", ".join(aggs)} FROM matches),
    base AS (SELECT *, {", ".join(wins)},
             CAST(1.0 AS DOUBLE) AS pi0_click,
             CAST(1.0 AS DOUBLE) AS pi0_error,
             CAST(1.0 AS DOUBLE) AS pi0_purchase,
             CAST(1.0 AS DOUBLE) AS pi0_signup,
             CAST(1.0 AS DOUBLE) AS pi0_view
             FROM piv),
    i1 AS (SELECT *, {it1} FROM base),
    i2 AS (SELECT *, {it2} FROM i1)
    SELECT {final_cols}, {shares} FROM i2
    """


@staged("q_bradley_terry", oracle=_bt_oracle())
def q_bradley_terry(spark, sf_dir):
    """BRADLEY-TERRY paired-comparison ranking, 2 MM iterations — the
    ranking-from-pairwise-outcomes mechanism (match quality, LLM
    preference tuning, sports ratings): a 'match' is two event types
    co-occurring in one (user, day) cell, won by the larger exact
    daily cents (ties to the lexicographically smaller — decided on
    BIGINTs, never floats). The 10 unordered-pair (n, wins) counts
    pivot to ONE row; the Minorize-Maximize update pi'_i = W_i /
    sum_j n_ij/(pi_i + pi_j) runs 2 unrolled iterations as FIXED
    lexicographic 4-term chains — identical written order on both
    engines, so every double matches bit-exactly; final shares are
    re-latticed at 1e-9. Spark generates the algebra from the same
    Python pair list the oracle f-string uses — one source of truth
    for the term order. At 100 TB: the (user, day, type) agg kills
    raw volume; the pair join runs per (user, day) key; everything
    after is a 1-row readout."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            F.col("event_type").alias("t"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    a = daily.select(
        "user_id", "d", F.col("t").alias("t1"), F.col("cents").alias("c1")
    )
    b = daily.select(
        "user_id", "d", F.col("t").alias("t2"), F.col("cents").alias("c2")
    )
    matches = a.join(b, ["user_id", "d"]).filter(F.col("t1") < F.col("t2"))
    aggs = []
    for x, y in _BT_PAIRS:
        hit = (F.col("t1") == x) & (F.col("t2") == y)
        aggs.append(
            F.sum(F.when(hit, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{x}_{y}")
        )
        aggs.append(
            F.sum(F.when(hit & (F.col("c1") >= F.col("c2")), 1).otherwise(0))
            .cast("bigint")
            .alias(f"w_{x}_{y}")
        )
    piv = matches.agg(*aggs)
    wins_exprs = []
    for t in _BT_TYPES:
        parts = []
        for x, y in _BT_PAIRS:
            if x == t:
                parts.append(f"w_{x}_{y}")
            elif y == t:
                parts.append(f"(n_{x}_{y} - w_{x}_{y})")
        wins_exprs.append(F.expr(" + ".join(parts)).alias(f"wins_{t}"))
    base = piv.select(
        "*",
        *wins_exprs,
        *[
            F.lit(1.0).cast("double").alias(f"pi0_{t}")
            for t in _BT_TYPES
        ],
    )

    def denom(t, pi):
        parts = []
        for x, y in _BT_PAIRS:
            if x == t:
                parts.append(
                    f"CAST(n_{x}_{y} AS DOUBLE) / ({pi}_{t} + {pi}_{y})"
                )
            elif y == t:
                parts.append(
                    f"CAST(n_{x}_{y} AS DOUBLE) / ({pi}_{t} + {pi}_{x})"
                )
        return " + ".join(parts)

    i1 = base.select(
        "*",
        *[
            F.expr(
                f"CAST(wins_{t} AS DOUBLE) / ({denom(t, 'pi0')})"
            ).alias(f"pi1_{t}")
            for t in _BT_TYPES
        ],
    )
    i2 = i1.select(
        "*",
        *[
            F.expr(
                f"CAST(wins_{t} AS DOUBLE) / ({denom(t, 'pi1')})"
            ).alias(f"pi2_{t}")
            for t in _BT_TYPES
        ],
    )
    pi_sum = " + ".join(f"pi2_{t}" for t in _BT_TYPES)
    return i2.select(
        *[F.col(f"wins_{t}") for t in _BT_TYPES],
        *[F.col(f"pi2_{t}") for t in _BT_TYPES],
        *[
            F.expr(
                f"CAST(floor(pi2_{t} * 1000000000.0 / ({pi_sum}) + 0.5)"
                " AS BIGINT)"
            ).alias(f"share_{t}_nano")
            for t in _BT_TYPES
        ],
    )


# =====================================================================
# Round-13 staged batch 9 — robust decomposition, sequential testing,
# spectral analysis, long-memory detection.
# =====================================================================

import math as _math  # noqa: E402

# SPRT constants FROZEN on the 1e-9 lattice (the q_decay_activity
# discipline: no ln() at query time for chain constants). Test
# H1: p=0.55 vs H0: p=0.45, alpha = beta = 0.05.
_SPRT_STEP_NANO = _math.floor(_math.log(0.55 / 0.45) * 1e9 + 0.5)
_SPRT_A_NANO = _math.floor(_math.log(19.0) * 1e9 + 0.5)  # ln((1-b)/a)


@staged(
    "q_median_polish",
    oracle="""
    WITH cells0 AS (
      SELECT event_type AS t,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               % 7 AS BIGINT) AS dow,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.dow, CAST(COALESCE(c.v, 0) AS BIGINT) AS e
      FROM (SELECT DISTINCT t FROM cells0) tt
      CROSS JOIN (SELECT unnest(range(0, 7)) AS dow) dd
      LEFT JOIN cells0 c ON c.t = tt.t AND c.dow = dd.dow
    ),
    rm1 AS (
      SELECT t, list_sort(list(e))[4] AS m FROM grid GROUP BY t
    ),
    s1 AS (
      SELECT grid.t, grid.dow, grid.e - rm1.m AS e, rm1.m AS r_eff
      FROM grid JOIN rm1 ON rm1.t = grid.t
    ),
    cm1 AS (
      SELECT dow, list_sort(list(e))[3] AS m FROM s1 GROUP BY dow
    ),
    s2 AS (
      SELECT s1.t, s1.dow, s1.e - cm1.m AS e, s1.r_eff,
             cm1.m AS c_eff
      FROM s1 JOIN cm1 ON cm1.dow = s1.dow
    ),
    rm2 AS (
      SELECT t, list_sort(list(e))[4] AS m FROM s2 GROUP BY t
    ),
    s3 AS (
      SELECT s2.t, s2.dow, s2.e - rm2.m AS e,
             s2.r_eff + rm2.m AS r_eff, s2.c_eff
      FROM s2 JOIN rm2 ON rm2.t = s2.t
    ),
    cm2 AS (
      SELECT dow, list_sort(list(e))[3] AS m FROM s3 GROUP BY dow
    )
    SELECT s3.t AS t, s3.dow AS dow,
           CAST(s3.e - cm2.m AS BIGINT) AS resid,
           CAST(s3.r_eff AS BIGINT) AS row_eff,
           CAST(s3.c_eff + cm2.m AS BIGINT) AS col_eff
    FROM s3 JOIN cm2 ON cm2.dow = s3.dow
    ORDER BY t, dow
    """,
)
def q_median_polish(spark, sf_dir):
    """TUKEY MEDIAN POLISH of the (event_type x day-of-week) revenue
    table — the ROBUST two-way decomposition (value = row effect +
    column effect + residual by alternating median sweeps, immune to
    the outlier cells that wreck a mean-based ANOVA fit): two full
    row+column sweeps over the dense 5x7 cents grid. Both dimensions
    are ODD (7 dows, 5 types), so every median is an EXACT lattice
    element — list_sort(collect)[k] picks it with zero float
    arithmetic, and the residuals/effects stay exact BIGINTs through
    all four sweeps (the decomposition identity v = r + c + resid is
    witness-pinned cell by cell). dow = anchor-mod-7 (engine
    dayofweek conventions differ — the q_seasonal_strength pin). At
    100 TB: raw volume dies in the 35-cell agg; each sweep is one
    7-row or 5-row sorted-list agg + broadcast join."""
    cells0 = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            (
                F.datediff(
                    F.col("ts").cast("date"),
                    F.lit("2024-01-01").cast("date"),
                )
                % 7
            )
            .cast("bigint")
            .alias("dow"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    grid = (
        cells0.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(7).select(F.col("id").cast("bigint").alias("dow"))
            )
        )
        .join(F.broadcast(cells0), ["t", "dow"], "left")
        .select(
            "t", "dow", F.coalesce("v", F.lit(0)).cast("bigint").alias("e")
        )
    )
    med = lambda k: F.expr(  # noqa: E731
        f"element_at(array_sort(collect_list(e)), {k})"
    )
    rm1 = grid.groupBy("t").agg(med(4).alias("m"))
    s1 = grid.join(F.broadcast(rm1), "t").select(
        "t",
        "dow",
        (F.col("e") - F.col("m")).alias("e"),
        F.col("m").alias("r_eff"),
    )
    cm1 = s1.groupBy("dow").agg(med(3).alias("m"))
    s2 = s1.join(F.broadcast(cm1), "dow").select(
        "t",
        "dow",
        (F.col("e") - F.col("m")).alias("e"),
        "r_eff",
        F.col("m").alias("c_eff"),
    )
    rm2 = s2.groupBy("t").agg(med(4).alias("m"))
    s3 = s2.join(F.broadcast(rm2), "t").select(
        "t",
        "dow",
        (F.col("e") - F.col("m")).alias("e"),
        (F.col("r_eff") + F.col("m")).alias("r_eff"),
        "c_eff",
    )
    cm2 = s3.groupBy("dow").agg(med(3).alias("m"))
    return (
        s3.join(F.broadcast(cm2), "dow")
        .select(
            "t",
            "dow",
            (F.col("e") - F.col("m")).cast("bigint").alias("resid"),
            F.col("r_eff").cast("bigint").alias("row_eff"),
            (F.col("c_eff") + F.col("m")).cast("bigint").alias("col_eff"),
        )
        .orderBy("t", "dow")
    )


@staged(
    "q_sprt_boundary",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS t,
             row_number() OVER (PARTITION BY event_type
               ORDER BY ts, event_id) AS k,
             CAST(SUM(CASE WHEN round(value * 100) > 5000
               THEN 1 ELSE 0 END) OVER (PARTITION BY event_type
               ORDER BY ts, event_id) AS BIGINT) AS s
      FROM events
    ),
    llr AS (
      SELECT t, k, (2 * s - k) * {_SPRT_STEP_NANO} AS cum_nano FROM seq
    ),
    crossing AS (
      SELECT t,
        CAST(MIN(CASE WHEN cum_nano >= {_SPRT_A_NANO}
          OR cum_nano <= -{_SPRT_A_NANO} THEN k END) AS BIGINT)
          AS first_cross_k
      FROM llr GROUP BY t
    ),
    finals AS (
      SELECT t, CAST(MAX(k) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN k = (SELECT MAX(k) FROM llr l2
               WHERE l2.t = llr.t) THEN cum_nano END) AS BIGINT)
               AS llr_final_nano
      FROM llr GROUP BY t
    ),
    at_cross AS (
      SELECT llr.t, llr.cum_nano
      FROM llr JOIN crossing ON crossing.t = llr.t
        AND llr.k = crossing.first_cross_k
    )
    SELECT finals.t AS t, finals.n, crossing.first_cross_k,
           CASE WHEN crossing.first_cross_k IS NULL THEN 'CONTINUE'
                WHEN at_cross.cum_nano >= {_SPRT_A_NANO} THEN 'H1'
                ELSE 'H0' END AS decision,
           finals.llr_final_nano
    FROM finals
    JOIN crossing ON crossing.t = finals.t
    LEFT JOIN at_cross ON at_cross.t = finals.t
    ORDER BY t
    """,
)
def q_sprt_boundary(spark, sf_dir):
    """WALD'S SPRT — the continuous-monitoring counterpart of
    q_sequential_probe's five scheduled looks: the cumulative
    log-likelihood ratio for H1: p=0.55 vs H0: p=0.45 over each
    type's event stream (outcome = value > 50.00 on the exact cents
    lattice) crosses ln(19) to accept H1 or -ln(19) to accept H0.
    The Bernoulli LLR telescopes to (2*S_k - k) * ln(11/9), so the
    whole trajectory lives on an EXACT integer lattice: the step
    constant and boundary are FROZEN 1e-9 literals (no ln() at query
    time — the q_decay_activity discipline) and every comparison is
    BIGINT vs BIGINT; the first-crossing index and the H1/H0/CONTINUE
    verdict can never flip on a float. One ordered prefix-sum window
    per type + one agg. At 100 TB the per-key window is the only
    sort; everything downstream is O(keys)."""
    w = Window.partitionBy("t").orderBy("ts", "event_id")
    seq = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("t"),
            "ts",
            "event_id",
            F.expr(
                "CASE WHEN round(value * 100) > 5000 THEN 1 ELSE 0 END"
            ).alias("y"),
        )
        .select(
            "t",
            F.row_number().over(w).alias("k"),
            F.sum("y").over(w).cast("bigint").alias("s"),
        )
    )
    llr = seq.select(
        "t",
        "k",
        ((2 * F.col("s") - F.col("k")) * F.lit(_SPRT_STEP_NANO)).alias(
            "cum_nano"
        ),
    )
    llr = track_persist(llr)
    crossed = (
        F.col("cum_nano") >= _SPRT_A_NANO
    ) | (F.col("cum_nano") <= -_SPRT_A_NANO)
    crossing = llr.groupBy("t").agg(
        F.min(F.when(crossed, F.col("k"))).cast("bigint").alias(
            "first_cross_k"
        )
    )
    finals = llr.groupBy("t").agg(
        F.max("k").cast("bigint").alias("n"),
        F.max_by("cum_nano", "k").cast("bigint").alias("llr_final_nano"),
    )
    at_cross = (
        llr.join(F.broadcast(crossing), "t")
        .filter(F.col("k") == F.col("first_cross_k"))
        .select("t", F.col("cum_nano").alias("cross_nano"))
    )
    return (
        finals.join(F.broadcast(crossing), "t")
        .join(F.broadcast(at_cross), "t", "left")
        .select(
            "t",
            "n",
            "first_cross_k",
            F.when(F.col("first_cross_k").isNull(), "CONTINUE")
            .when(F.col("cross_nano") >= _SPRT_A_NANO, "H1")
            .otherwise("H0")
            .alias("decision"),
            "llr_final_nano",
        )
        .orderBy("t")
    )


# Frozen micro-lattice trig table for the 30-day periodogram at
# frequencies k = 1..4: identical literals on both engines, so the
# spectral dot products are exact integer arithmetic.
_PERIO_TRIG = [
    (
        k,
        t,
        _math.floor(_math.cos(2.0 * _math.pi * k * t / 30.0) * 1e6 + 0.5),
        _math.floor(_math.sin(2.0 * _math.pi * k * t / 30.0) * 1e6 + 0.5),
    )
    for k in range(1, 5)
    for t in range(30)
]

_PERIO_VALUES = ", ".join(
    f"({k}, {t}, {c}, {s})" for k, t, c, s in _PERIO_TRIG
)


@staged(
    "q_periodogram",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) // 100
               AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    trig AS (
      SELECT * FROM (VALUES {_PERIO_VALUES})
        AS v(k, tt, c_micro, s_micro)
    ),
    spec AS (
      SELECT grid.t, trig.k,
             CAST(SUM(grid.x * trig.c_micro) AS BIGINT) AS re_micro,
             CAST(SUM(grid.x * trig.s_micro) AS BIGINT) AS im_micro
      FROM grid JOIN trig ON trig.tt = grid.d
      GROUP BY grid.t, trig.k
    ),
    pw AS (
      SELECT t, k, re_micro, im_micro,
             CAST(CAST(re_micro AS HUGEINT) * CAST(re_micro AS HUGEINT)
               + CAST(im_micro AS HUGEINT) * CAST(im_micro AS HUGEINT)
               AS DECIMAL(38, 0)) AS power
      FROM spec
    ),
    best AS (
      SELECT t, MAX(power) AS bp FROM pw GROUP BY t
    )
    SELECT pw.t AS t, pw.k, pw.re_micro, pw.im_micro, pw.power,
           (pw.power = best.bp) AS dominant
    FROM pw JOIN best ON best.t = pw.t
    ORDER BY t, k
    """,
)
def q_periodogram(spark, sf_dir):
    """PERIODOGRAM of each key's 30-day revenue series at frequencies
    k = 1..4 cycles/month — the spectral seasonality screen
    (complements q_seasonal_strength's fixed weekly profile with a
    frequency SCAN, and q_autocorr's lag domain with the Fourier
    domain): the 240 cos/sin coefficients are FROZEN 1e-6 lattice
    literals (computed once in Python, identical on both engines — no
    trig at query time), so Re/Im are EXACT integer dot products over
    the dense 30-day dollar grid and the power re^2+im^2 is exact
    128-bit (HUGEINT / DECIMAL(38,0), the q_knee_detection
    precedent); the dominant-frequency flag is an exact integer
    comparison. Daily series uses dollars (cents div 100) so the
    products hold headroom to sf1 (documented: cents would overflow
    int64 at sf0.1). At 100 TB: raw volume dies in the (key, day)
    agg; the trig join fans 30 rows x 4 frequencies per key."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(round(value * 100) AS BIGINT)) div 100"
                " AS BIGINT)"
            ).alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    trig = spark.createDataFrame(
        _PERIO_TRIG, "k int, tt int, c_micro bigint, s_micro bigint"
    )
    spec = (
        grid.join(F.broadcast(trig), grid["d"] == trig["tt"])
        .groupBy("t", "k")
        .agg(
            F.sum(F.col("x") * F.col("c_micro"))
            .cast("bigint")
            .alias("re_micro"),
            F.sum(F.col("x") * F.col("s_micro"))
            .cast("bigint")
            .alias("im_micro"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pw = spec.select(
        "t",
        "k",
        "re_micro",
        "im_micro",
        (
            dec(F.col("re_micro")) * dec(F.col("re_micro"))
            + dec(F.col("im_micro")) * dec(F.col("im_micro"))
        )
        .cast("decimal(38,0)")
        .alias("power"),
    )
    pw = track_persist(pw)
    best = pw.groupBy("t").agg(F.max("power").alias("bp"))
    return (
        pw.join(F.broadcast(best), "t")
        .select(
            "t",
            "k",
            "re_micro",
            "im_micro",
            "power",
            (F.col("power") == F.col("bp")).alias("dominant"),
        )
        .orderBy("t", "k")
    )


@staged(
    "q_hurst_rs",
    oracle="""
    WITH daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) // 100
               AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    gs AS (
      SELECT t, CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS ss
      FROM grid GROUP BY t
    ),
    cum AS (
      SELECT grid.t,
             CAST(SUM(30 * grid.x - gs.s) OVER (PARTITION BY grid.t
               ORDER BY grid.d) AS BIGINT) AS c
      FROM grid JOIN gs ON gs.t = grid.t
    ),
    rng AS (
      SELECT t,
             CAST(GREATEST(MAX(c), 0) - LEAST(MIN(c), 0) AS BIGINT)
               AS r_lattice
      FROM cum GROUP BY t
    )
    SELECT rng.t AS t, CAST(30 AS BIGINT) AS n, rng.r_lattice,
           CAST(30 * gs.ss - gs.s * gs.s AS BIGINT) AS disc,
           CAST(rng.r_lattice AS DOUBLE)
             / sqrt(CAST(30 * gs.ss - gs.s * gs.s AS DOUBLE))
             AS rs_ratio,
           CAST(floor(ln(CAST(rng.r_lattice AS DOUBLE)
               / sqrt(CAST(30 * gs.ss - gs.s * gs.s AS DOUBLE)))
             / ln(15.0) * 1000000000.0 + 0.5) AS BIGINT) AS hurst_nano
    FROM rng JOIN gs ON gs.t = rng.t
    ORDER BY t
    """,
)
def q_hurst_rs(spark, sf_dir):
    """HURST RESCALED-RANGE (R/S) long-memory screen per key — does
    the daily series wander like a random walk (H~0.5), trend
    persistently (H>0.5) or mean-revert (H<0.5)? The classic
    estimator H = ln(R/S)/ln(n/2): cumulative deviations live on the
    x n lattice (dev = n*x - S, so no division touches the prefix
    sums — exact BIGINTs through the per-key 30-day window), the
    range R includes the zero anchor (GREATEST/LEAST vs 0), and the
    std discriminant n*SS - S^2 is exact integer (dollars, not cents
    — cents would overflow int64 at sf0.1; documented). R/S is
    int/sqrt(int) — one identical chain — and H lands on the 1e-9
    lattice. At 100 TB: raw volume dies in the (key, day) agg; the
    window runs over 30 bounded cells per key."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(round(value * 100) AS BIGINT)) div 100"
                " AS BIGINT)"
            ).alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    grid = track_persist(grid)
    gs = grid.groupBy("t").agg(
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    wcum = (
        Window.partitionBy("t")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.join(F.broadcast(gs), "t").select(
        "t",
        F.sum(30 * F.col("x") - F.col("s"))
        .over(wcum)
        .cast("bigint")
        .alias("c"),
    )
    rng = cum.groupBy("t").agg(
        (
            F.greatest(F.max("c"), F.lit(0))
            - F.least(F.min("c"), F.lit(0))
        )
        .cast("bigint")
        .alias("r_lattice")
    )
    disc = (30 * F.col("ss") - F.col("s") * F.col("s")).cast("bigint")
    rs = F.col("r_lattice").cast("double") / F.sqrt(
        F.col("disc").cast("double")
    )
    return (
        rng.join(F.broadcast(gs), "t")
        .select(
            "t",
            F.lit(30).cast("bigint").alias("n"),
            "r_lattice",
            disc.alias("disc"),
        )
        .select(
            "t",
            "n",
            "r_lattice",
            "disc",
            rs.alias("rs_ratio"),
            F.floor(F.log(rs) / F.log(F.lit(15.0)) * 1000000000.0 + 0.5)
            .cast("bigint")
            .alias("hurst_nano"),
        )
        .orderBy("t")
    )


# =====================================================================
# Round-12 staged batch 10 — statistical two-sample family completion
# (energy distance, Cramer-von Mises), LM smoothing (Good-Turing), and
# dose-response trend (Cochran-Armitage). Same contract as the rest of
# this file: exact DuckDB oracle at sf0.001 AND sf0.01, pure-Python
# witnesses, plan pins. Promotion target: round 13.
# =====================================================================


@staged(
    "q_good_turing",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t != '') AS t
      FROM documents
    ),
    occ AS (
      SELECT unnest(list_transform(generate_series(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      FROM toks WHERE len(t) >= 3
    ),
    freq AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY g),
    ff AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r
           FROM freq GROUP BY c),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_grams FROM occ),
    none AS (SELECT CAST(COALESCE(
               (SELECT n_r FROM ff WHERE r = 1), 0) AS BIGINT) AS n_1),
    grid AS (SELECT unnest(range(1, 9)) AS r)
    SELECT CAST(grid.r AS BIGINT) AS r,
           CAST(COALESCE(cur.n_r, 0) AS BIGINT) AS n_r,
           CAST(COALESCE(nxt.n_r, 0) AS BIGINT) AS n_next,
           CASE WHEN COALESCE(cur.n_r, 0) = 0 THEN 0.0
                ELSE CAST((grid.r + 1) * COALESCE(nxt.n_r, 0) AS DOUBLE)
                     / CAST(cur.n_r AS DOUBLE) END AS rstar,
           CASE WHEN COALESCE(cur.n_r, 0) = 0 THEN 0.0
                ELSE CAST((grid.r + 1) * COALESCE(nxt.n_r, 0) AS DOUBLE)
                     / CAST(cur.n_r AS DOUBLE)
                     / CAST(tot.n_grams AS DOUBLE) END AS p_gt,
           CAST(none.n_1 AS DOUBLE) / CAST(tot.n_grams AS DOUBLE) AS p0
    FROM grid LEFT JOIN ff cur ON cur.r = grid.r
              LEFT JOIN ff nxt ON nxt.r = grid.r + 1
              CROSS JOIN tot CROSS JOIN none
    ORDER BY r
    """,
)
def q_good_turing(spark, sf_dir):
    """GOOD-TURING frequency-of-frequencies smoothing over the corpus
    TRIGRAM model — the classic held-out mass estimator LM pipelines
    used before Kneser-Ney (Good 1953): N_r = #trigram types seen r
    times, the discounted count r* = (r+1)N_{r+1}/N_r, the smoothed
    probability p_GT = r*/N, and the unseen mass P0 = N_1/N.
    Trigrams, not unigrams: the fixture's unigram vocabulary is
    degenerate (every token ~900 occurrences, N_1..N_8 all zero —
    probed; same finding as q_set_cover_greedy), while the trigram
    histogram populates r = 1..8 at BOTH gate scales. The frequency
    table and its histogram are EXACT BIGINT; r*, p_GT and P0 are
    each ONE identical double chain over exact integers, and the
    8-row output lattice is a literal grid (schema-stable even where
    N_r = 0 — the zero case is decided by an integer, not a NaN; the
    N_1 scalar is an aggregate, so an N_1 = 0 corpus yields a row,
    not an empty frame). Completes the n-gram LM family next to
    q_ngram_lm / q_unigram_surprisal. At 100 TB: one posexplode +
    per-doc lead window (the q_dedup_minhash shingle discipline),
    one gram-keyed hash agg (map-side combined), one count-keyed agg
    whose output is |distinct frequencies| rows — tiny — then
    broadcast joins onto an 8-row literal grid."""
    docs = _t(spark, sf_dir, "documents")
    from ..operators import dedup as dd

    tok_rows = docs.select(
        "doc_id", F.posexplode(dd.tokens_col("text")).alias("pos", "t")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    occ = track_persist(
        tok_rows.select(
            F.concat_ws(
                " ",
                F.col("t"),
                F.lead("t", 1).over(wdoc),
                F.lead("t", 2).over(wdoc),
            ).alias("g"),
            F.lead("t", 2).over(wdoc).alias("t2"),
        )
        .filter(F.col("t2").isNotNull())
        .select("g")
    )
    freq = occ.groupBy("g").agg(F.count("*").cast("bigint").alias("c"))
    ff = track_persist(
        freq.groupBy(F.col("c").alias("r")).agg(
            F.count("*").cast("bigint").alias("n_r")
        )
    )
    tot = occ.agg(F.count("*").cast("bigint").alias("n_grams"))
    n1 = ff.agg(
        F.coalesce(
            F.max(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_1")
    )
    grid = spark.range(1, 9).select(F.col("id").cast("bigint").alias("r"))
    cur = ff.select("r", F.col("n_r").alias("nr_cur"))
    nxt = ff.select(
        (F.col("r") - 1).cast("bigint").alias("r"),
        F.col("n_r").alias("nr_next"),
    )
    joined = (
        grid.join(F.broadcast(cur), "r", "left")
        .join(F.broadcast(nxt), "r", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            F.coalesce("nr_cur", F.lit(0)).cast("bigint").alias("n_r"),
            F.coalesce("nr_next", F.lit(0)).cast("bigint").alias("n_next"),
            "n_grams",
            "n_1",
        )
    )
    rstar = F.when(F.col("n_r") == 0, F.lit(0.0)).otherwise(
        ((F.col("r") + 1) * F.col("n_next")).cast("double")
        / F.col("n_r").cast("double")
    )
    return joined.select(
        "r",
        "n_r",
        "n_next",
        rstar.alias("rstar"),
        F.when(F.col("n_r") == 0, F.lit(0.0))
        .otherwise(
            ((F.col("r") + 1) * F.col("n_next")).cast("double")
            / F.col("n_r").cast("double")
            / F.col("n_grams").cast("double")
        )
        .alias("p_gt"),
        (F.col("n_1").cast("double") / F.col("n_grams").cast("double")).alias(
            "p0"
        ),
    ).orderBy("r")


@staged(
    "q_energy_distance",
    oracle="""
    WITH hist AS (
      SELECT l_linestatus AS ls, l_returnflag AS fl,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
      GROUP BY 1, 2, 3
    ),
    ha AS (SELECT ls, q, c FROM hist WHERE fl = 'A'),
    hb AS (SELECT ls, q, c FROM hist WHERE fl = 'R'),
    sab AS (
      SELECT ha.ls, CAST(SUM(abs(ha.q - hb.q) * ha.c * hb.c) AS BIGINT) AS s
      FROM ha JOIN hb ON ha.ls = hb.ls GROUP BY ha.ls
    ),
    saa AS (
      SELECT x.ls, CAST(SUM(abs(x.q - y.q) * x.c * y.c) AS BIGINT) AS s
      FROM ha x JOIN ha y ON x.ls = y.ls GROUP BY x.ls
    ),
    sbb AS (
      SELECT x.ls, CAST(SUM(abs(x.q - y.q) * x.c * y.c) AS BIGINT) AS s
      FROM hb x JOIN hb y ON x.ls = y.ls GROUP BY x.ls
    ),
    ns AS (
      SELECT ls,
             CAST(SUM(CASE WHEN fl = 'A' THEN c ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN fl = 'R' THEN c ELSE 0 END) AS BIGINT) AS n_b
      FROM hist GROUP BY ls
    )
    SELECT ns.ls AS ls, ns.n_a, ns.n_b,
           sab.s AS s_ab, saa.s AS s_aa, sbb.s AS s_bb,
           2.0 * CAST(sab.s AS DOUBLE)
               / (CAST(ns.n_a AS DOUBLE) * CAST(ns.n_b AS DOUBLE))
             - CAST(saa.s AS DOUBLE)
               / (CAST(ns.n_a AS DOUBLE) * CAST(ns.n_a AS DOUBLE))
             - CAST(sbb.s AS DOUBLE)
               / (CAST(ns.n_b AS DOUBLE) * CAST(ns.n_b AS DOUBLE))
             AS energy
    FROM ns JOIN sab ON sab.ls = ns.ls
            JOIN saa ON saa.ls = ns.ls
            JOIN sbb ON sbb.ls = ns.ls
    ORDER BY ls
    """,
)
def q_energy_distance(spark, sf_dir):
    """EXACT 1-D ENERGY DISTANCE two-sample statistic (Szekely-Rizzo
    E-statistic) between the returnflag A and R quantity
    distributions per linestatus: D^2 = 2E|X-Y| - E|X-X'| - E|Y-Y'|.
    The metric-space twin of q_ks_drift / q_wasserstein_bucketed —
    sensitive to ALL moments, not just location. The pairwise
    expectation over two samples of millions of rows is computed
    EXACTLY without any pairwise row join: l_quantity lives on a
    50-value lattice, so each E-term is a 50x50 histogram outer
    product — sum |v-w| * c_v * c_w is an exact BIGINT (bounded by
    49 * n_a * n_b ~ 4e16 at sf1; sf10 would need DECIMAL —
    documented). The energy readout is ONE identical double chain.
    At 100 TB: raw volume dies in the (ls, fl, q) hash agg; the
    outer products join 50-row broadcast frames."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy(
            F.col("l_linestatus").alias("ls"),
            F.col("l_returnflag").alias("fl"),
            F.col("l_quantity").cast("bigint").alias("q"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    li = track_persist(li)
    ha = li.filter(F.col("fl") == "A").select("ls", "q", "c")
    hb = li.filter(F.col("fl") == "R").select("ls", "q", "c")

    def _pairsum(x, y, out):
        xx = x.select("ls", F.col("q").alias("qx"), F.col("c").alias("cx"))
        yy = y.select("ls", F.col("q").alias("qy"), F.col("c").alias("cy"))
        return (
            xx.join(F.broadcast(yy), "ls")
            .groupBy("ls")
            .agg(
                F.sum(
                    F.abs(F.col("qx") - F.col("qy"))
                    * F.col("cx")
                    * F.col("cy")
                )
                .cast("bigint")
                .alias(out)
            )
        )

    sab = _pairsum(ha, hb, "s_ab")
    saa = _pairsum(ha, ha, "s_aa")
    sbb = _pairsum(hb, hb, "s_bb")
    ns = li.groupBy("ls").agg(
        F.sum(F.when(F.col("fl") == "A", F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("fl") == "R", F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        ns.join(F.broadcast(sab), "ls")
        .join(F.broadcast(saa), "ls")
        .join(F.broadcast(sbb), "ls")
        .select(
            "ls",
            "n_a",
            "n_b",
            "s_ab",
            "s_aa",
            "s_bb",
            (
                2.0 * d("s_ab") / (d("n_a") * d("n_b"))
                - d("s_aa") / (d("n_a") * d("n_a"))
                - d("s_bb") / (d("n_b") * d("n_b"))
            ).alias("energy"),
        )
        .orderBy("ls")
    )


@staged(
    "q_cramer_von_mises",
    oracle="""
    WITH base AS (
      SELECT event_type AS t,
             CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN datediff('day', DATE '2024-01-01',
                                CAST(ts AS DATE)) % 7 IN (5, 6)
                  THEN 1 ELSE 0 END AS we
      FROM events
    ),
    grp AS (
      SELECT t, v,
             CAST(SUM(we) AS BIGINT) AS a,
             CAST(SUM(1 - we) AS BIGINT) AS b
      FROM base GROUP BY t, v
    ),
    cum AS (
      SELECT t, v, a, b,
             CAST(SUM(a) OVER (PARTITION BY t ORDER BY v) AS BIGINT)
               AS ca,
             CAST(SUM(b) OVER (PARTITION BY t ORDER BY v) AS BIGINT)
               AS cb
      FROM grp
    ),
    ns AS (
      SELECT t, CAST(SUM(a) AS BIGINT) AS n, CAST(SUM(b) AS BIGINT) AS m
      FROM grp GROUP BY t
    ),
    num AS (
      SELECT cum.t,
             CAST(SUM(
               CAST(ns.m * cum.ca - ns.n * cum.cb AS HUGEINT)
               * CAST(ns.m * cum.ca - ns.n * cum.cb AS HUGEINT)
               * CAST(cum.a + cum.b AS HUGEINT)
             ) AS DECIMAL(38, 0)) AS t_num
      FROM cum JOIN ns ON ns.t = cum.t
      GROUP BY cum.t
    )
    SELECT ns.t AS t, ns.n, ns.m, num.t_num,
           CAST(num.t_num AS DOUBLE)
             / (CAST(ns.n AS DOUBLE) * CAST(ns.m AS DOUBLE)
                * CAST(ns.n + ns.m AS DOUBLE)
                * CAST(ns.n + ns.m AS DOUBLE)) AS tstat,
           (CAST(1000 AS HUGEINT) * CAST(num.t_num AS HUGEINT)
            > CAST(461 AS HUGEINT) * CAST(ns.n AS HUGEINT)
              * CAST(ns.m AS HUGEINT)
              * CAST(ns.n + ns.m AS HUGEINT)
              * CAST(ns.n + ns.m AS HUGEINT)) AS reject
    FROM ns JOIN num ON num.t = ns.t
    ORDER BY t
    """,
)
def q_cramer_von_mises(spark, sf_dir):
    """CRAMER-VON MISES two-sample test per event type: does the
    weekend value distribution differ from the weekday one — the
    integrated-squared-ECDF-difference twin of q_ks_drift (KS reads
    the max gap, CvM the whole area, so it catches spread/shape
    shifts KS misses). The weekend flag uses the anchor-mod-7 idiom
    (engine dayofweek conventions differ; all fixture timestamps are
    >= the 2024-01-01 Monday anchor, so the mod is nonnegative).
    T = sum_z (m*A(z) - n*B(z))^2 * w_z / (n*m*(n+m)^2) with A,B the
    cumulative counts on the exact cents lattice: the numerator is
    summed in HUGEINT/DECIMAL(38,0) ((m*A)^2 crosses int64 far below
    sf1 — the q_jain_fairness precedent), the readout is ONE
    identical double chain, and the alpha=0.05 verdict (T > 0.461)
    is decided EXACTLY by the 128-bit integer inequality
    1000*num > 461*n*m*(n+m)^2 — a float never classifies.
    At 100 TB: raw volume dies in the (t, v) hash agg; the window
    runs per type over the bounded distinct-cents lattice."""
    ev = _t(spark, sf_dir, "events")
    we = (
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        % 7
    ).isin(5, 6)
    grp = (
        ev.select(
            F.col("event_type").alias("t"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
            F.when(we, F.lit(1)).otherwise(F.lit(0)).alias("we"),
        )
        .groupBy("t", "v")
        .agg(
            F.sum("we").cast("bigint").alias("a"),
            F.sum(1 - F.col("we")).cast("bigint").alias("b"),
        )
    )
    grp = track_persist(grp)
    wcum = (
        Window.partitionBy("t")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grp.select(
        "t",
        "a",
        "b",
        F.sum("a").over(wcum).cast("bigint").alias("ca"),
        F.sum("b").over(wcum).cast("bigint").alias("cb"),
    )
    ns = grp.groupBy("t").agg(
        F.sum("a").cast("bigint").alias("n"),
        F.sum("b").cast("bigint").alias("m"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    diff = dec(F.col("m") * F.col("ca") - F.col("n") * F.col("cb"))
    num = (
        cum.join(F.broadcast(ns), "t")
        .groupBy("t")
        .agg(
            F.sum(diff * diff * dec(F.col("a") + F.col("b")))
            .cast("decimal(38,0)")
            .alias("t_num")
        )
    )
    nm2 = (
        dec(F.col("n"))
        * dec(F.col("m"))
        * dec(F.col("n") + F.col("m"))
        * dec(F.col("n") + F.col("m"))
    )
    return (
        ns.join(F.broadcast(num), "t")
        .select(
            "t",
            "n",
            "m",
            "t_num",
            (
                F.col("t_num").cast("double")
                / (
                    F.col("n").cast("double")
                    * F.col("m").cast("double")
                    * (F.col("n") + F.col("m")).cast("double")
                    * (F.col("n") + F.col("m")).cast("double")
                )
            ).alias("tstat"),
            (dec(F.lit(1000)) * F.col("t_num") > dec(F.lit(461)) * nm2).alias(
                "reject"
            ),
        )
        .orderBy("t")
    )


@staged(
    "q_cochran_armitage",
    oracle="""
    WITH base AS (
      SELECT event_type AS t,
             CAST(hour(ts) // 5 AS BIGINT) AS w,
             CASE WHEN CAST(round(value * 100) AS BIGINT) > 5000
                  THEN 1 ELSE 0 END AS s
      FROM events
    ),
    cells AS (
      SELECT t, w, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(s) AS BIGINT) AS s_i
      FROM base GROUP BY t, w
    ),
    stats AS (
      SELECT t,
             CAST(SUM(n_i) AS BIGINT) AS n_total,
             CAST(SUM(s_i) AS BIGINT) AS s_total,
             CAST(SUM(w * n_i) AS BIGINT) AS sw_n,
             CAST(SUM(w * s_i) AS BIGINT) AS sw_s,
             CAST(SUM(w * w * n_i) AS BIGINT) AS sww_n
      FROM cells GROUP BY t
    ),
    parts AS (
      SELECT t, n_total, s_total,
             CAST(n_total * sw_s - s_total * sw_n AS BIGINT) AS trend_num,
             CAST(CAST(n_total AS HUGEINT)
                  * CAST(n_total * sw_s - s_total * sw_n AS HUGEINT)
                  * CAST(n_total * sw_s - s_total * sw_n AS HUGEINT)
               AS DECIMAL(38, 0)) AS z2_num,
             CAST(CAST(s_total AS HUGEINT)
                  * CAST(n_total - s_total AS HUGEINT)
                  * CAST(CAST(n_total AS HUGEINT) * CAST(sww_n AS HUGEINT)
                         - CAST(sw_n AS HUGEINT) * CAST(sw_n AS HUGEINT)
                    AS HUGEINT)
               AS DECIMAL(38, 0)) AS z2_den
      FROM stats
    )
    SELECT t, n_total, s_total, trend_num, z2_num, z2_den,
           CASE WHEN z2_den = 0 THEN 0.0
                ELSE CAST(z2_num AS DOUBLE) / CAST(z2_den AS DOUBLE)
           END AS z2,
           (CAST(10000 AS HUGEINT) * CAST(z2_num AS HUGEINT)
            > CAST(38416 AS HUGEINT) * CAST(z2_den AS HUGEINT)) AS reject
    FROM parts ORDER BY t
    """,
)
def q_cochran_armitage(spark, sf_dir):
    """COCHRAN-ARMITAGE trend test per event type: do high-value
    events (cents > 5000, an exact integer cut) become more or less
    frequent across ordered time-of-day doses (hour div 5 -> scores
    0..4)? The dose-response completion of the chi-square family —
    q_chi2_assoc asks 'associated at all?', this asks 'monotone in
    the ordered scores?', one extra power-relevant constraint.
    Everything that decides is integer: the trend numerator
    N*sum(w*s) - S*sum(w*n) is exact BIGINT, Z^2's numerator
    N*(trend)^2 and denominator S*(N-S)*(N*sum(w^2 n) - (sum w n)^2)
    are exact HUGEINT/DECIMAL(38,0) (the q_knee_detection
    precedent), the degenerate all-success/no-success case is
    decided by an integer = 0 (not a NaN), and the alpha=0.05
    verdict (Z^2 > 1.9600^2) is the exact 128-bit inequality
    10000*num > 38416*den — a float never classifies. At 100 TB:
    one (t, dose) hash agg kills the raw volume; 5 cells per type
    feed a second tiny agg."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("t"),
        (F.hour("ts") / F.lit(5)).cast("bigint").alias("w"),
        F.when(
            F.expr("CAST(round(value * 100) AS BIGINT)") > 5000, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("s"),
    )
    cells = base.groupBy("t", "w").agg(
        F.count("*").cast("bigint").alias("n_i"),
        F.sum("s").cast("bigint").alias("s_i"),
    )
    stats = cells.groupBy("t").agg(
        F.sum("n_i").cast("bigint").alias("n_total"),
        F.sum("s_i").cast("bigint").alias("s_total"),
        F.sum(F.col("w") * F.col("n_i")).cast("bigint").alias("sw_n"),
        F.sum(F.col("w") * F.col("s_i")).cast("bigint").alias("sw_s"),
        F.sum(F.col("w") * F.col("w") * F.col("n_i"))
        .cast("bigint")
        .alias("sww_n"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    trend = (
        F.col("n_total") * F.col("sw_s") - F.col("s_total") * F.col("sw_n")
    ).cast("bigint")
    parts = stats.select(
        "t",
        "n_total",
        "s_total",
        trend.alias("trend_num"),
        (dec(F.col("n_total")) * dec(trend) * dec(trend))
        .cast("decimal(38,0)")
        .alias("z2_num"),
        (
            dec(F.col("s_total"))
            * dec(F.col("n_total") - F.col("s_total"))
            * (
                dec(F.col("n_total")) * dec(F.col("sww_n"))
                - dec(F.col("sw_n")) * dec(F.col("sw_n"))
            )
        )
        .cast("decimal(38,0)")
        .alias("z2_den"),
    )
    return parts.select(
        "t",
        "n_total",
        "s_total",
        "trend_num",
        "z2_num",
        "z2_den",
        F.when(F.col("z2_den") == 0, F.lit(0.0))
        .otherwise(F.col("z2_num").cast("double") / F.col("z2_den").cast("double"))
        .alias("z2"),
        (dec(F.lit(10000)) * F.col("z2_num") > dec(F.lit(38416)) * F.col("z2_den")).alias(
            "reject"
        ),
    ).orderBy("t")


# =====================================================================
# Round-12 staged batch 11 — agreement (ICC), survival comparison
# (log-rank), errors-in-variables regression (Deming), and the median
# test (Mood). Promotion target: round 13.
# =====================================================================


@staged(
    "q_icc_oneway",
    oracle="""
    WITH daily AS (
      SELECT event_type AS rater,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) // 100
               AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT rr.rater, dd.d, CAST(COALESCE(daily.y, 0) AS BIGINT) AS y
      FROM (SELECT DISTINCT rater FROM daily) rr
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.rater = rr.rater AND daily.d = dd.d
    ),
    items AS (
      SELECT d, CAST(SUM(y) AS BIGINT) AS t_i,
             CAST(SUM(y * y) AS BIGINT) AS yy_i
      FROM grid GROUP BY d
    ),
    gs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(5 AS BIGINT) AS k,
             CAST(SUM(t_i) AS BIGINT) AS g,
             CAST(SUM(t_i * t_i) AS BIGINT) AS st2,
             CAST(SUM(yy_i) AS BIGINT) AS syy
      FROM items
    ),
    ab AS (
      SELECT n_items, k, g,
             CAST(n_items * st2 - g * g AS BIGINT) AS a,
             CAST(k * syy - st2 AS BIGINT) AS b
      FROM gs
    )
    SELECT n_items, k, a, b,
           CAST((k - 1) * a - (n_items - 1) * b AS BIGINT) AS p,
           CAST((k - 1) * (a + (n_items - 1) * b) AS BIGINT) AS q,
           CAST(a AS DOUBLE)
             / (CAST(n_items AS DOUBLE) * CAST(k AS DOUBLE)
                * CAST(n_items - 1 AS DOUBLE)) AS msb,
           CAST(b AS DOUBLE)
             / (CAST(k AS DOUBLE) * CAST(n_items AS DOUBLE)
                * CAST(k - 1 AS DOUBLE)) AS msw,
           CAST((k - 1) * a - (n_items - 1) * b AS DOUBLE)
             / CAST((k - 1) * (a + (n_items - 1) * b) AS DOUBLE) AS icc,
           (2 * CAST((k - 1) * a - (n_items - 1) * b AS HUGEINT)
            > CAST((k - 1) * (a + (n_items - 1) * b) AS HUGEINT))
             AS reliable
    FROM ab
    """,
)
def q_icc_oneway(spark, sf_dir):
    """INTRACLASS CORRELATION ICC(1,1) — the one-way random-effects
    reliability coefficient that completes the agreement family
    (q_judge_kappa / q_krippendorff_alpha / q_kendall_w / the staged
    q_fleiss_kappa rate CATEGORICAL agreement; ICC rates CONTINUOUS
    agreement): items are the 30 fixture days, 'raters' the 5 event
    types' daily dollar totals on the zero-filled complete grid (the
    q_hurst_rs lattice discipline; dollars, not cents — cents would
    push N*sum(T_i^2) past int64 at sf1, documented). The whole ANOVA
    decomposition reduces to TWO exact BIGINTs: A = N*sum(T_i^2)-G^2
    (= Nk(N-1)MSB) and B = k*sum(y^2)-sum(T_i^2) (= Nk(k-1)MSW), so
    ICC = ((k-1)A - (N-1)B)/((k-1)(A+(N-1)B)) is one division of
    exact integers and the ICC > 0.5 reliability verdict is the exact
    128-bit inequality 2P > Q — a float never classifies. At 100 TB:
    raw volume dies in the (rater, day) hash agg; everything after is
    a 150-cell lattice."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("rater"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(round(value * 100) AS BIGINT)) div 100"
                " AS BIGINT)"
            ).alias("y")
        )
    )
    grid = (
        daily.select("rater")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["rater", "d"], "left")
        .select(
            "rater",
            "d",
            F.coalesce("y", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    items = grid.groupBy("d").agg(
        F.sum("y").cast("bigint").alias("t_i"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("yy_i"),
    )
    gs = items.agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.lit(5).cast("bigint").alias("k"),
        F.sum("t_i").cast("bigint").alias("g"),
        F.sum(F.col("t_i") * F.col("t_i")).cast("bigint").alias("st2"),
        F.sum("yy_i").cast("bigint").alias("syy"),
    )
    ab = gs.select(
        "n_items",
        "k",
        (F.col("n_items") * F.col("st2") - F.col("g") * F.col("g"))
        .cast("bigint")
        .alias("a"),
        (F.col("k") * F.col("syy") - F.col("st2"))
        .cast("bigint")
        .alias("b"),
    )
    p = ((F.col("k") - 1) * F.col("a") - (F.col("n_items") - 1) * F.col("b")).cast(
        "bigint"
    )
    q = ((F.col("k") - 1) * (F.col("a") + (F.col("n_items") - 1) * F.col("b"))).cast(
        "bigint"
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return ab.select(
        "n_items",
        "k",
        "a",
        "b",
        p.alias("p"),
        q.alias("q"),
        (
            F.col("a").cast("double")
            / (
                F.col("n_items").cast("double")
                * F.col("k").cast("double")
                * (F.col("n_items") - 1).cast("double")
            )
        ).alias("msb"),
        (
            F.col("b").cast("double")
            / (
                F.col("k").cast("double")
                * F.col("n_items").cast("double")
                * (F.col("k") - 1).cast("double")
            )
        ).alias("msw"),
        (p.cast("double") / q.cast("double")).alias("icc"),
        (dec(F.lit(2)) * dec(p) > dec(q)).alias("reliable"),
    )


@staged(
    "q_log_rank",
    oracle="""
    WITH life AS (
      SELECT user_id,
             datediff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
               AS t,
             CASE WHEN user_id % 4 != 0 THEN 1 ELSE 0 END AS ev,
             CAST(CAST('0x' || substring(
               md5(CAST(user_id AS VARCHAR) || ':lr'), 1, 8) AS BIGINT)
               % 2 AS BIGINT) AS arm
      FROM events GROUP BY user_id
    ),
    bins AS (
      SELECT t, arm, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM life GROUP BY t, arm
    ),
    grid AS (
      SELECT tt.t, aa.arm,
             CAST(COALESCE(bins.d, 0) AS BIGINT) AS d,
             CAST(COALESCE(bins.c, 0) AS BIGINT) AS c
      FROM (SELECT DISTINCT t FROM bins) tt
      CROSS JOIN (SELECT unnest([0, 1]) AS arm) aa
      LEFT JOIN bins ON bins.t = tt.t AND bins.arm = aa.arm
    ),
    risk AS (
      SELECT t, arm, d,
             CAST(SUM(c) OVER (PARTITION BY arm ORDER BY t DESC)
               AS BIGINT) AS n_arm
      FROM grid
    ),
    tbl AS (
      SELECT t,
             CAST(SUM(CASE WHEN arm = 1 THEN d ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(SUM(d) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN arm = 1 THEN n_arm ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(n_arm) AS BIGINT) AS n
      FROM risk GROUP BY t
    ),
    terms AS (
      SELECT t,
             CAST(floor(CAST(n * d1 - d * n1 AS DOUBLE)
               / CAST(n AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT)
               AS u_nano,
             CASE WHEN n > 1 THEN
               CAST(floor(CAST(d * n1 * (n - n1) * (n - d) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * CAST(n - 1 AS DOUBLE)) * 1000000000.0 + 0.5)
                 AS BIGINT)
             ELSE 0 END AS v_nano
      FROM tbl WHERE d > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
           CAST(SUM(u_nano) AS BIGINT) AS u_nano,
           CAST(SUM(v_nano) AS BIGINT) AS v_nano,
           (CAST(SUM(u_nano) AS DOUBLE) / 1000000000.0)
             * (CAST(SUM(u_nano) AS DOUBLE) / 1000000000.0)
             / (CAST(SUM(v_nano) AS DOUBLE) / 1000000000.0) AS z2,
           (CAST(10000 AS HUGEINT)
              * CAST(SUM(u_nano) AS HUGEINT)
              * CAST(SUM(u_nano) AS HUGEINT)
            > CAST(38416 AS HUGEINT) * CAST(1000000000 AS HUGEINT)
              * CAST(SUM(v_nano) AS HUGEINT)) AS reject
    FROM terms
    """,
)
def q_log_rank(spark, sf_dir):
    """LOG-RANK (Mantel-Cox) two-group survival comparison — the
    hypothesis-test completion of the survival family (q_kaplan_meier
    draws the curves, q_hazard_rate the rates; log-rank decides
    whether two arms' curves DIFFER): per-user lifetimes and the
    25 % censoring rule are shared verbatim with q_kaplan_meier, arms
    assigned by the engine-portable md5 hash (the q_srm_check
    discipline). At each death time the O-E term (n*d1 - d*n1)/n and
    the hypergeometric variance d*n1*(n-n1)*(n-d)/(n^2*(n-1)) have
    EXACT BIGINT numerators (~n^4 ~ 2.5e16 at sf1 — sf10 would need
    DECIMAL, documented), are quantized to the 1e-9 lattice BEFORE
    summing (float sums are order-exact on the lattice), the n=1
    degenerate variance is decided by an integer guard, and the
    alpha=0.05 verdict is the exact 128-bit inequality
    10000*U^2 > 38416e9*V. At 100 TB: one user-keyed agg kills the
    raw volume; the risk-set window runs over the bounded 2x|day|
    zero-filled grid."""
    ev = _t(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":lr"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    life = ev.groupBy("user_id").agg(
        F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date")).alias(
            "t"
        ),
        F.when(F.col("user_id") % 4 != 0, 1).otherwise(0).alias("ev"),
    ).select("user_id", "t", "ev", arm.alias("arm"))
    bins = life.groupBy("t", "arm").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("c"),
    )
    bins = track_persist(bins)
    grid = (
        bins.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(2).select(F.col("id").cast("bigint").alias("arm"))
            )
        )
        .join(F.broadcast(bins), ["t", "arm"], "left")
        .select(
            "t",
            "arm",
            F.coalesce("d", F.lit(0)).cast("bigint").alias("d"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
        )
    )
    w_rev = (
        Window.partitionBy("arm")
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = grid.select(
        "t", "arm", "d", F.sum("c").over(w_rev).cast("bigint").alias("n_arm")
    )
    tbl = risk.groupBy("t").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("d")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum("d").cast("bigint").alias("d"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_arm")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum("n_arm").cast("bigint").alias("n"),
    )
    u_nano = F.floor(
        (F.col("n") * F.col("d1") - F.col("d") * F.col("n1")).cast("double")
        / F.col("n").cast("double")
        * 1000000000.0
        + 0.5
    ).cast("bigint")
    v_nano = (
        F.when(
            F.col("n") > 1,
            F.floor(
                (
                    F.col("d")
                    * F.col("n1")
                    * (F.col("n") - F.col("n1"))
                    * (F.col("n") - F.col("d"))
                ).cast("double")
                / (
                    F.col("n").cast("double")
                    * F.col("n").cast("double")
                    * (F.col("n") - 1).cast("double")
                )
                * 1000000000.0
                + 0.5
            ).cast("bigint"),
        )
        .otherwise(F.lit(0))
    )
    terms = tbl.filter(F.col("d") > 0).select(
        u_nano.alias("u_nano"), v_nano.alias("v_nano")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = terms.agg(
        F.count("*").cast("bigint").alias("n_times"),
        F.sum("u_nano").cast("bigint").alias("u_nano"),
        F.sum("v_nano").cast("bigint").alias("v_nano"),
    )
    return agg.select(
        "n_times",
        "u_nano",
        "v_nano",
        (
            (F.col("u_nano").cast("double") / 1000000000.0)
            * (F.col("u_nano").cast("double") / 1000000000.0)
            / (F.col("v_nano").cast("double") / 1000000000.0)
        ).alias("z2"),
        (
            dec(F.lit(10000)) * dec(F.col("u_nano")) * dec(F.col("u_nano"))
            > dec(F.lit(38416)) * dec(F.lit(1000000000)) * dec(F.col("v_nano"))
        ).alias("reject"),
    )


@staged(
    "q_deming_regression",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CASE WHEN event_type = 'click'
               THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) // 100
               AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'view'
               THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) // 100
               AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    gs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM daily
    ),
    abc AS (
      SELECT n, sx, sy,
             CAST(n * sxx - sx * sx AS BIGINT) AS bx,
             CAST(n * syy - sy * sy AS BIGINT) AS ay,
             CAST(n * sxy - sx * sy AS BIGINT) AS c
      FROM gs
    )
    SELECT n, bx, ay, c,
           CASE WHEN c = 0 THEN 0.0 ELSE
             (CAST(ay - bx AS DOUBLE)
              + sqrt(CAST(ay - bx AS DOUBLE) * CAST(ay - bx AS DOUBLE)
                     + 4.0 * CAST(c AS DOUBLE) * CAST(c AS DOUBLE)))
             / (2.0 * CAST(c AS DOUBLE)) END AS slope,
           CASE WHEN c = 0 THEN 0.0 ELSE
             (CAST(sy AS DOUBLE) - (CAST(ay - bx AS DOUBLE)
                + sqrt(CAST(ay - bx AS DOUBLE) * CAST(ay - bx AS DOUBLE)
                       + 4.0 * CAST(c AS DOUBLE) * CAST(c AS DOUBLE)))
               / (2.0 * CAST(c AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) END AS intercept,
           (c > 0) AS positively_associated
    FROM abc
    """,
)
def q_deming_regression(spark, sf_dir):
    """DEMING REGRESSION (errors-in-variables, delta = 1) of daily
    'view' dollars on daily 'click' dollars — the
    measurement-error completion of the regression family
    (q_trend_ols assumes x exact; Deming splits the noise between
    both axes, the method-comparison standard in lab medicine):
    slope = (Ay - Bx + sqrt((Ay-Bx)^2 + 4C^2)) / 2C over the three
    exact centered BIGINT moments Bx = n*Sxx-Sx^2, Ay = n*Syy-Sy^2,
    C = n*Sxy-SxSy (dollars lattice — cents would cross int64 at
    sf1, the q_icc_oneway bound). The slope/intercept are each ONE
    identical double chain whose operands are exact-int casts (both
    engines round the same integer to the same nearest double), the
    degenerate C = 0 case is decided by an integer = 0, and the
    association direction verdict is the exact integer sign of C —
    a float never classifies. At 100 TB: one day-keyed conditional
    hash agg kills the raw volume; the moments agg sees 30 rows."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d")
        )
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN event_type = 'click'"
                " THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)"
                " div 100 AS BIGINT)"
            ).alias("x"),
            F.expr(
                "CAST(SUM(CASE WHEN event_type = 'view'"
                " THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)"
                " div 100 AS BIGINT)"
            ).alias("y"),
        )
    )
    gs = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    abc = gs.select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("bx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("bigint")
        .alias("ay"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("bigint")
        .alias("c"),
    )
    diff = (F.col("ay") - F.col("bx")).cast("double")
    cd = F.col("c").cast("double")
    slope = (diff + F.sqrt(diff * diff + 4.0 * cd * cd)) / (2.0 * cd)
    return abc.select(
        "n",
        "bx",
        "ay",
        "c",
        F.when(F.col("c") == 0, F.lit(0.0)).otherwise(slope).alias("slope"),
        F.when(F.col("c") == 0, F.lit(0.0))
        .otherwise(
            (
                F.col("sy").cast("double")
                - slope * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        )
        .alias("intercept"),
        (F.col("c") > 0).alias("positively_associated"),
    )


@staged(
    "q_mood_median",
    oracle="""
    WITH base AS (
      SELECT event_type AS t,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    vh AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY v),
    med AS (
      SELECT CAST(MIN(v) AS BIGINT) AS med FROM (
        SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
               (SELECT SUM(c) FROM vh) AS n
        FROM vh
      ) WHERE cum >= (n + 1) // 2
    ),
    cells AS (
      SELECT t,
             CAST(COUNT(*) AS BIGINT) AS n_t,
             CAST(SUM(CASE WHEN v > (SELECT med FROM med)
               THEN 1 ELSE 0 END) AS BIGINT) AS above
      FROM base GROUP BY t
    ),
    tots AS (
      SELECT CAST(SUM(n_t) AS BIGINT) AS n,
             CAST(SUM(above) AS BIGINT) AS a
      FROM cells
    ),
    terms AS (
      SELECT cells.t, cells.n_t, cells.above,
             CAST(cells.n_t - cells.above AS BIGINT) AS below,
             CAST(floor(
               CAST(CAST(tots.n * cells.above - cells.n_t * tots.a
                      AS HUGEINT)
                    * CAST(tots.n * cells.above - cells.n_t * tots.a
                      AS HUGEINT) AS DOUBLE)
               / (CAST(cells.n_t AS DOUBLE) * CAST(tots.a AS DOUBLE)
                  * CAST(tots.n - tots.a AS DOUBLE))
               * 1000000000.0 + 0.5) AS BIGINT) AS cell_nano
      FROM cells CROSS JOIN tots
    )
    SELECT terms.t, terms.n_t, terms.above, terms.below,
           terms.cell_nano,
           (SELECT med FROM med) AS grand_median,
           (SELECT CAST(SUM(cell_nano) AS BIGINT) FROM terms) AS chi2_nano,
           ((SELECT SUM(cell_nano) FROM terms) > 9488000000) AS reject
    FROM terms ORDER BY t
    """,
)
def q_mood_median(spark, sf_dir):
    """MOOD'S MEDIAN TEST across the 5 event types — the robust
    k-group location test that completes the rank-test family
    (q_kruskal_wallis compares mean ranks; Mood only asks 'above or
    below the pooled median?', maximally outlier-proof): the grand
    median is selected EXACTLY by cumulative counting on the cents
    lattice (lower median at (N+1) div 2 — an integer pick, the
    q_levene_test discipline), the k x 2 above/below table is exact,
    and the chi-square collapses algebraically to
    sum_t (N*o_t - n_t*A)^2 / (n_t*A*(N-A)) (the above/below cell
    numerators are IDENTICAL squared integers — derived, so half the
    work), each term's numerator in HUGEINT/DECIMAL ((N*o)^2 crosses
    int64 at sf1), quantized to the 1e-9 lattice BEFORE the exact
    sum, with the df=4 alpha=0.05 verdict (crit 9.488) decided on
    that lattice by an integer compare. At 100 TB: one (v) hash agg
    + one bounded-lattice cumulative for the median, one (t) agg for
    the table; no data-scale window."""
    base = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    base = track_persist(base)
    vh = base.groupBy("v").agg(F.count("*").cast("bigint").alias("c"))
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ntot = vh.agg(F.sum("c").cast("bigint").alias("n"))
    med = (
        vh.select("v", F.sum("c").over(wcum).alias("cum"))
        .crossJoin(F.broadcast(ntot))
        .filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .agg(F.min("v").cast("bigint").alias("med"))
    )
    cells = (
        base.crossJoin(F.broadcast(med))
        .groupBy("t")
        .agg(
            F.count("*").cast("bigint").alias("n_t"),
            F.sum(F.when(F.col("v") > F.col("med"), 1).otherwise(0))
            .cast("bigint")
            .alias("above"),
            F.max("med").cast("bigint").alias("grand_median"),
        )
    )
    tots = cells.agg(
        F.sum("n_t").cast("bigint").alias("n"),
        F.sum("above").cast("bigint").alias("a"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = dec(F.col("n") * F.col("above") - F.col("n_t") * F.col("a"))
    terms = cells.crossJoin(F.broadcast(tots)).select(
        "t",
        "n_t",
        "above",
        (F.col("n_t") - F.col("above")).cast("bigint").alias("below"),
        F.floor(
            (num * num).cast("double")
            / (
                F.col("n_t").cast("double")
                * F.col("a").cast("double")
                * (F.col("n") - F.col("a")).cast("double")
            )
            * 1000000000.0
            + 0.5
        )
        .cast("bigint")
        .alias("cell_nano"),
        "grand_median",
    )
    terms = track_persist(terms)
    chi2 = terms.agg(F.sum("cell_nano").cast("bigint").alias("chi2_nano"))
    return (
        terms.crossJoin(F.broadcast(chi2))
        .select(
            "t",
            "n_t",
            "above",
            "below",
            "cell_nano",
            "grand_median",
            "chi2_nano",
            (F.col("chi2_nano") > F.lit(9488000000)).alias("reject"),
        )
        .orderBy("t")
    )


# =====================================================================
# Round-12 staged batch 12 — exact sequential-fold / DP mechanisms:
# 0/1 knapsack DP (vs an EXHAUSTIVE-enumeration oracle), Elo rating
# fold (frozen logistic table), Croston intermittent-demand fold.
# Promotion target: round 13.
# =====================================================================


@staged(
    "q_knapsack_dp",
    oracle="""
    WITH items AS (
      SELECT c_nationkey AS nk, c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS v,
             CAST(1 + c_custkey % 7 AS BIGINT) AS w,
             row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY round(c_acctbal * 100) DESC, c_custkey
             ) AS rn
      FROM customer WHERE c_acctbal > 0
    ),
    top AS (SELECT * FROM items WHERE rn <= 10),
    masks AS (SELECT unnest(range(0, 1024)) AS m),
    subsets AS (
      SELECT top.nk, masks.m,
             CAST(SUM(top.v) AS BIGINT) AS sv,
             CAST(SUM(top.w) AS BIGINT) AS sw
      FROM top JOIN masks ON ((masks.m >> (top.rn - 1)) & 1) = 1
      GROUP BY top.nk, masks.m
    ),
    best AS (
      SELECT nk, CAST(MAX(sv) AS BIGINT) AS best_value
      FROM subsets WHERE sw <= 15 GROUP BY nk
    ),
    counts AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(v) AS BIGINT) AS total_value
      FROM top GROUP BY nk
    )
    SELECT counts.nk AS nk, counts.n_items, counts.total_value,
           CAST(COALESCE(best.best_value, 0) AS BIGINT) AS best_value,
           CAST(15 AS BIGINT) AS capacity
    FROM counts LEFT JOIN best ON best.nk = counts.nk
    ORDER BY nk
    """,
)
def q_knapsack_dp(spark, sf_dir):
    """0/1 KNAPSACK solved EXACTLY by dynamic programming — the
    optimal completion of q_knapsack_greedy (greedy by density is
    unboundedly suboptimal; DP is exact): per nation, the top-10
    positive-balance customers are items (value = cents, weight =
    1 + custkey % 7, capacity 15), and the Bellman table lives in a
    16-element BIGINT array folded item-by-item inside ONE
    F.aggregate (state[c] = best value using capacity <= c; the
    q_amortization_schedule fold shape — no shuffle, no window,
    map-only per group). THE ORACLE IS NOT A REPLAY: DuckDB solves
    the same instances by EXHAUSTIVE 2^10 subset enumeration
    (bitmask join), so DP-vs-brute-force is a genuinely independent
    cross-check of optimality, not two copies of one recurrence.
    All values/weights exact BIGINT; ties in value are irrelevant
    (max is over values only). At 100 TB: item selection is one
    windowed top-k per nation; the fold is O(10 x 16) per group."""
    w_rank = Window.partitionBy("nk").orderBy(
        F.desc("v"), F.col("c_custkey")
    )
    items = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(
            F.col("c_nationkey").cast("bigint").alias("nk"),
            "c_custkey",
            F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("v"),
            F.expr("CAST(1 + c_custkey % 7 AS BIGINT)").alias("w"),
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 10)
    )
    per = items.groupBy("nk").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("v").cast("bigint").alias("total_value"),
        F.array_sort(F.collect_list(F.struct("rn", "v", "w"))).alias(
            "its"
        ),
    )
    dp = F.expr(
        "element_at(aggregate(its,"
        " array_repeat(CAST(0 AS BIGINT), 16),"
        " (acc, it) -> transform(acc, (x, c) ->"
        "   CASE WHEN c >= it.w"
        "        THEN greatest(x, element_at(acc, CAST(c - it.w + 1 AS INT))"
        "                         + it.v)"
        "        ELSE x END)), 16)"
    )
    return per.select(
        "nk",
        "n_items",
        "total_value",
        dp.cast("bigint").alias("best_value"),
        F.lit(15).cast("bigint").alias("capacity"),
    ).orderBy("nk")


# Frozen Elo expectation table: E_permille[idx] for rating-diff bucket
# idx = (clamp(R_b - R_a, +-400000 milli) + 400000) div 25000, i.e.
# d_elo = idx*25 - 400; E = round(1000 / (1 + 10^(d_elo/400))).
# Literals (not pow() at query time) — the q_decay_activity discipline.
_ELO_E = [
    909, 896, 882, 867, 849, 830, 808, 785, 760, 733, 703,
    673, 640, 606, 571, 536, 500, 464, 429, 394, 360, 327,
    297, 267, 240, 215, 192, 170, 151, 133, 118, 104, 91,
]
_ELO_PLAYERS = ["click", "error", "purchase", "signup", "view"]
_ELO_E_SQL = "CASE idx " + " ".join(
    f"WHEN {i} THEN {e}" for i, e in enumerate(_ELO_E)
) + " END"


def _elo_oracle() -> str:
    e_case_of = lambda expr: "CASE ((greatest(least(" + expr + (  # noqa: E731
        ", 400000), -400000) + 400000) // 25000) "
        + " ".join(f"WHEN {i} THEN {e}" for i, e in enumerate(_ELO_E))
        + " END"
    )
    delta = (
        "16 * (1000 * g.sa - "
        + e_case_of("rec.rs[g.ib + 1] - rec.rs[g.ia + 1]")
        + ")"
    )
    players_sql = "[" + ", ".join(f"'{p}'" for p in _ELO_PLAYERS) + "]"
    idx_case = (
        "CASE tt.t "
        + " ".join(f"WHEN '{p}' THEN {i}" for i, p in enumerate(_ELO_PLAYERS))
        + " END"
    )
    return f"""
    WITH RECURSIVE daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, CAST({idx_case} AS BIGINT) AS i, dd.d,
             CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    games AS (
      SELECT a.d, a.i AS ia, b.i AS ib,
             CASE WHEN a.x >= b.x THEN 1 ELSE 0 END AS sa,
             row_number() OVER (ORDER BY a.d, a.i, b.i) AS gn
      FROM grid a JOIN grid b ON a.d = b.d AND a.i < b.i
    ),
    rec AS (
      SELECT 0 AS k,
             CAST([1500000, 1500000, 1500000, 1500000, 1500000]
               AS BIGINT[]) AS rs
      UNION ALL
      SELECT k + 1,
             list_transform(range(1, 6), i ->
               CASE WHEN i = g.ia + 1 THEN rec.rs[i] + ({delta})
                    WHEN i = g.ib + 1 THEN rec.rs[i] - ({delta})
                    ELSE rec.rs[i] END)
      FROM rec JOIN games g ON g.gn = rec.k + 1
      WHERE rec.k < (SELECT COUNT(*) FROM games)
    ),
    final AS (
      SELECT rs FROM rec ORDER BY k DESC LIMIT 1
    ),
    wins AS (
      SELECT winner, CAST(COUNT(*) AS BIGINT) AS n_wins FROM (
        SELECT CASE WHEN sa = 1 THEN ia ELSE ib END AS winner FROM games
      ) GROUP BY winner
    )
    SELECT {players_sql}[p.i + 1] AS player,
           CAST(final.rs[p.i + 1] AS BIGINT) AS rating_milli,
           CAST(COALESCE(wins.n_wins, 0) AS BIGINT) AS n_wins,
           CAST((SELECT COUNT(*) FROM games) // 10 * 4 AS BIGINT)
             AS n_games
    FROM (SELECT unnest(range(0, 5)) AS i) p
    CROSS JOIN final
    LEFT JOIN wins ON wins.winner = p.i
    ORDER BY player
    """


@staged("q_elo_ratings", oracle=_elo_oracle())
def q_elo_ratings(spark, sf_dir):
    """ELO RATINGS as an EXACT INTEGER SEQUENTIAL FOLD — the online
    paired-comparison ladder that completes the ranking family
    (q_bradley_terry fits the same model in BATCH by MM; Elo replays
    the games one by one, order-sensitive, the way matchmaking
    actually runs): the 5 event types play a daily round-robin (10
    games/day, winner = larger exact daily cents, ties to the
    lexicographic smaller — the q_bradley_terry tie discipline) and
    ratings update R_a += K*(S_a - E_a) through ONE global
    F.aggregate fold over the (day, pair)-sorted game array.
    Everything is integer: ratings in milli-Elo, K = 16, and the
    logistic expectation comes from a 33-bucket FROZEN permille
    table (d_elo = idx*25 - 400 — literals, no pow() at query time,
    the q_decay_activity discipline); the bucket index shifts the
    clamped diff nonneg BEFORE integer div (negative div semantics
    differ across engines — documented trap). The fold is zero-sum
    by construction (witness-pinned: ratings sum to 5*1500000). The
    oracle replays the identical fold as a bounded RECURSIVE CTE
    over a list state. At 100 TB: raw volume dies in the (type, day)
    hash agg; the fold is 300 games x 5-element state, driver-free
    and bounded by the day domain, not the data."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    idx_case = "CASE t " + " ".join(
        f"WHEN '{p}' THEN {i}" for i, p in enumerate(_ELO_PLAYERS)
    ) + " END"
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            F.expr(f"CAST(({idx_case}) AS BIGINT)").alias("i"),
            "d",
            F.coalesce("x", F.lit(0)).cast("bigint").alias("x"),
        )
    )
    grid = track_persist(grid)
    a = grid.alias("a")
    b = grid.alias("b")
    games = a.join(
        F.broadcast(b),
        (F.col("a.d") == F.col("b.d")) & (F.col("a.i") < F.col("b.i")),
    ).select(
        F.col("a.d").alias("d"),
        F.col("a.i").alias("ia"),
        F.col("b.i").alias("ib"),
        F.when(F.col("a.x") >= F.col("b.x"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("sa"),
    )
    games = track_persist(games)
    e_arr = "array(" + ", ".join(str(e) for e in _ELO_E) + ")"
    fold = F.expr(
        "aggregate(gs,"
        " array_repeat(CAST(1500000 AS BIGINT), 5),"
        " (acc, g) -> transform(acc, (r, i) ->"
        "   CASE"
        "   WHEN i = g.ia THEN r + 16 * (1000 * g.sa - element_at("
        + e_arr
        + ", CAST((greatest(least(element_at(acc, CAST(g.ib + 1 AS INT))"
        "  - element_at(acc, CAST(g.ia + 1 AS INT)), 400000), -400000)"
        "  + 400000) div 25000 + 1 AS INT)))"
        "   WHEN i = g.ib THEN r - 16 * (1000 * g.sa - element_at("
        + e_arr
        + ", CAST((greatest(least(element_at(acc, CAST(g.ib + 1 AS INT))"
        "  - element_at(acc, CAST(g.ia + 1 AS INT)), 400000), -400000)"
        "  + 400000) div 25000 + 1 AS INT)))"
        "   ELSE r END))"
    )
    folded = games.agg(
        F.array_sort(F.collect_list(F.struct("d", "ia", "ib", "sa"))).alias(
            "gs"
        ),
        F.count("*").cast("bigint").alias("n_games_total"),
    ).select(fold.alias("ratings"), "n_games_total")
    wins = games.groupBy(
        F.when(F.col("sa") == 1, F.col("ia"))
        .otherwise(F.col("ib"))
        .alias("winner")
    ).agg(F.count("*").cast("bigint").alias("n_wins"))
    players_arr = "array(" + ", ".join(f"'{p}'" for p in _ELO_PLAYERS) + ")"
    per = folded.select(
        F.posexplode("ratings").alias("i", "rating_milli"),
        "n_games_total",
    ).select(
        F.col("i").cast("bigint").alias("i"),
        F.expr(f"element_at({players_arr}, CAST(i + 1 AS INT))").alias(
            "player"
        ),
        F.col("rating_milli").cast("bigint").alias("rating_milli"),
        F.expr("CAST(n_games_total div 10 * 4 AS BIGINT)").alias("n_games"),
    )
    return (
        per.join(F.broadcast(wins), per["i"] == wins["winner"], "left")
        .select(
            "player",
            "rating_milli",
            F.coalesce("n_wins", F.lit(0)).cast("bigint").alias("n_wins"),
            "n_games",
        )
        .orderBy("player")
    )


@staged(
    "q_croston",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT CAST(user_id % 8 AS BIGINT) AS bk,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
      FROM events WHERE event_type = 'signup' GROUP BY 1, 2
    ),
    grid AS (
      SELECT bb.bk, dd.d, CAST(COALESCE(daily.q, 0) AS BIGINT) AS q
      FROM (SELECT unnest(range(0, 8)) AS bk) bb
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.bk = bb.bk AND daily.d = dd.d
    ),
    rec AS (
      SELECT CAST(bk AS BIGINT) AS bk, -1 AS k, 0 AS seen,
             CAST(0 AS BIGINT) AS z, CAST(0 AS BIGINT) AS i,
             CAST(0 AS BIGINT) AS since
      FROM (SELECT unnest(range(0, 8)) AS bk)
      UNION ALL
      SELECT rec.bk, rec.k + 1,
             CASE WHEN g.q > 0 THEN 1 ELSE rec.seen END,
             CASE WHEN g.q = 0 THEN rec.z
                  WHEN rec.seen = 0 THEN g.q
                  ELSE (3 * g.q + 7 * rec.z) // 10 END,
             CASE WHEN g.q = 0 THEN rec.i
                  WHEN rec.seen = 0 THEN (rec.since + 1) * 1000
                  ELSE (3 * (rec.since + 1) * 1000 + 7 * rec.i) // 10 END,
             CASE WHEN g.q > 0 THEN 0 ELSE rec.since + 1 END
      FROM rec JOIN grid g ON g.bk = rec.bk AND g.d = rec.k + 1
      WHERE rec.k < 29
    ),
    final AS (
      SELECT bk, z, i FROM rec WHERE k = 29
    ),
    nd AS (
      SELECT bk, CAST(SUM(CASE WHEN q > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_demands
      FROM grid GROUP BY bk
    )
    SELECT final.bk AS bk, nd.n_demands,
           CAST(final.z AS BIGINT) AS z_cents,
           CAST(final.i AS BIGINT) AS i_milli,
           CASE WHEN final.i = 0 THEN 0.0
                ELSE CAST(final.z AS DOUBLE) * 1000.0
                     / CAST(final.i AS DOUBLE) END AS forecast
    FROM final JOIN nd ON nd.bk = final.bk
    ORDER BY bk
    """,
)
def q_croston(spark, sf_dir):
    """CROSTON'S METHOD for intermittent demand — the supply-chain
    forecaster for sparse series (separate EWMAs over the nonzero
    demand SIZES and the INTERVALS between them; plain EWMA biases
    toward zero on sparse series, Croston's ratio z/i does not):
    8 user-bucket series of daily signup cents over the zero-filled
    30-day grid, folded day-by-day in ONE F.aggregate per series
    (the q_stream_ewma fold discipline). Both EWMAs use the exact
    integer form new = (3x + 7old) div 10 with ALL operands
    nonnegative (negative integer division rounds differently
    across engines — the q_elo_ratings shift trap, avoided by
    construction here); intervals carry milli-day units so the
    smoothing keeps resolution. First demand initializes (the
    standard Croston start), demandless series read forecast 0 via
    an integer guard. The oracle replays the identical fold as a
    bounded RECURSIVE CTE (30 steps x 8 parallel series). At
    100 TB: raw volume dies in the (bucket, day) hash agg; the fold
    is 30 steps over a 4-field state per series."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    daily = ev.groupBy(
        F.expr("CAST(user_id % 8 AS BIGINT)").alias("bk"),
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("d"),
    ).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("q")
    )
    grid = (
        spark.range(8)
        .select(F.col("id").cast("bigint").alias("bk"))
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["bk", "d"], "left")
        .select(
            "bk", "d", F.coalesce("q", F.lit(0)).cast("bigint").alias("q")
        )
    )
    per = grid.groupBy("bk").agg(
        F.array_sort(F.collect_list(F.struct("d", "q"))).alias("days"),
        F.sum(F.when(F.col("q") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_demands"),
    )
    fold = F.expr(
        "aggregate(days,"
        " struct(CAST(0 AS INT) AS seen, CAST(0 AS BIGINT) AS z,"
        "        CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS since),"
        " (acc, g) -> struct("
        "   CASE WHEN g.q > 0 THEN 1 ELSE acc.seen END AS seen,"
        "   CASE WHEN g.q = 0 THEN acc.z"
        "        WHEN acc.seen = 0 THEN g.q"
        "        ELSE (3 * g.q + 7 * acc.z) div 10 END AS z,"
        "   CASE WHEN g.q = 0 THEN acc.i"
        "        WHEN acc.seen = 0 THEN (acc.since + 1) * 1000"
        "        ELSE (3 * (acc.since + 1) * 1000 + 7 * acc.i) div 10"
        "        END AS i,"
        "   CASE WHEN g.q > 0 THEN CAST(0 AS BIGINT)"
        "        ELSE acc.since + 1 END AS since))"
    )
    return (
        per.select("bk", "n_demands", fold.alias("st"))
        .select(
            "bk",
            "n_demands",
            F.col("st")["z"].cast("bigint").alias("z_cents"),
            F.col("st")["i"].cast("bigint").alias("i_milli"),
            F.when(F.col("st")["i"] == 0, F.lit(0.0))
            .otherwise(
                F.col("st")["z"].cast("double")
                * 1000.0
                / F.col("st")["i"].cast("double")
            )
            .alias("forecast"),
        )
        .orderBy("bk")
    )


# =====================================================================
# Round-12 staged batch 13 — robust estimation (Hodges-Lehmann via
# histogram self-convolution), ordered-alternative rank test (Page's
# L), and directed-motif counting (cyclic vs transitive triangles).
# Promotion target: round 13.
# =====================================================================


@staged(
    "q_hodges_lehmann",
    oracle="""
    WITH hist AS (
      SELECT l_returnflag AS fl, CAST(l_quantity AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    pairsums AS (
      SELECT x.fl, CAST(x.v + y.v AS BIGINT) AS s,
             CAST(SUM(CASE WHEN x.v < y.v THEN x.c * y.c
                           WHEN x.v = y.v THEN x.c * (x.c + 1) // 2
                           ELSE 0 END) AS BIGINT) AS m
      FROM hist x JOIN hist y ON x.fl = y.fl
      GROUP BY x.fl, x.v + y.v
    ),
    nz AS (SELECT fl, s, m FROM pairsums WHERE m > 0),
    tot AS (
      SELECT fl, CAST(SUM(m) AS BIGINT) AS m_pairs FROM nz GROUP BY fl
    ),
    cum AS (
      SELECT nz.fl, nz.s,
             SUM(nz.m) OVER (PARTITION BY nz.fl ORDER BY nz.s) AS cm,
             tot.m_pairs
      FROM nz JOIN tot ON tot.fl = nz.fl
    ),
    pick AS (
      SELECT fl, CAST(MIN(s) AS BIGINT) AS s_star
      FROM cum WHERE cm >= (m_pairs + 1) // 2 GROUP BY fl
    ),
    ns AS (
      SELECT fl, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY fl
    )
    SELECT ns.fl AS fl, ns.n, tot.m_pairs, pick.s_star,
           CAST(pick.s_star AS DOUBLE) / 2.0 AS hl_estimate
    FROM ns JOIN tot ON tot.fl = ns.fl JOIN pick ON pick.fl = ns.fl
    ORDER BY fl
    """,
)
def q_hodges_lehmann(spark, sf_dir):
    """HODGES-LEHMANN pseudomedian per returnflag — the rank-based
    robust location estimator (median of all n(n+1)/2 Walsh averages
    (x_i+x_j)/2, i<=j; 29% breakdown, ~95% Gaussian efficiency — the
    estimator behind the Wilcoxon CI, completing q_wilcoxon_signed /
    q_trimmed_mean / q_weighted_median): the quadratic pair set is
    NEVER materialized — l_quantity lives on a 50-value lattice, so
    the Walsh-average multiset is an exact HISTOGRAM SELF-CONVOLUTION
    (i<j pairs c_v*c_w, diagonal c_v(c_v+1)/2 — exact BIGINTs,
    ~n^2/4 <= 1e13 at sf1), and the median of ~99 sum-lattice cells
    is picked EXACTLY by cumulative counting at (M+1) div 2 (integer
    div — the q_mood_median discipline). HL = s*/2 is the only
    division, at readout. At 100 TB: raw volume dies in the
    (fl, v) hash agg; the convolution joins 50-row broadcast frames;
    the cumulative runs over 99 cells per group."""
    hist = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("fl"),
            F.col("l_quantity").cast("bigint").alias("v"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    hist = track_persist(hist)
    x = hist.select("fl", F.col("v").alias("vx"), F.col("c").alias("cx"))
    y = hist.select("fl", F.col("v").alias("vy"), F.col("c").alias("cy"))
    pairsums = (
        x.join(F.broadcast(y), "fl")
        .groupBy("fl", (F.col("vx") + F.col("vy")).cast("bigint").alias("s"))
        .agg(
            F.sum(
                F.when(
                    F.col("vx") < F.col("vy"), F.col("cx") * F.col("cy")
                )
                .when(
                    F.col("vx") == F.col("vy"),
                    F.expr("cx * (cx + 1) div 2"),
                )
                .otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("m")
        )
        .filter(F.col("m") > 0)
    )
    pairsums = track_persist(pairsums)
    tot = pairsums.groupBy("fl").agg(
        F.sum("m").cast("bigint").alias("m_pairs")
    )
    wcum = (
        Window.partitionBy("fl")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pick = (
        pairsums.select("fl", "s", F.sum("m").over(wcum).alias("cm"))
        .join(F.broadcast(tot), "fl")
        .filter(F.col("cm") >= F.expr("(m_pairs + 1) div 2"))
        .groupBy("fl")
        .agg(F.min("s").cast("bigint").alias("s_star"))
    )
    ns = hist.groupBy("fl").agg(F.sum("c").cast("bigint").alias("n"))
    return (
        ns.join(F.broadcast(tot), "fl")
        .join(F.broadcast(pick), "fl")
        .select(
            "fl",
            "n",
            "m_pairs",
            "s_star",
            (F.col("s_star").cast("double") / 2.0).alias("hl_estimate"),
        )
        .orderBy("fl")
    )


@staged(
    "q_page_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x,
             CASE tt.t WHEN 'click' THEN 1 WHEN 'error' THEN 2
                       WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
                       WHEN 'view' THEN 5 END AS j
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    ranked AS (
      SELECT a.t, a.j,
             CAST(SUM(CASE WHEN b.x < a.x THEN 2
                           WHEN b.x = a.x THEN 1 ELSE 0 END) + 1
               AS BIGINT) AS r2
      FROM grid a JOIN grid b ON a.d = b.d
      GROUP BY a.t, a.j, a.d
    ),
    sums AS (
      SELECT t, j, CAST(SUM(r2) AS BIGINT) AS r2_sum
      FROM ranked GROUP BY t, j
    ),
    l AS (
      SELECT CAST(SUM(j * r2_sum) AS BIGINT) AS l2 FROM sums
    )
    SELECT sums.t AS t, sums.j, sums.r2_sum, l.l2,
           (CAST(l.l2 AS DOUBLE) / 2.0 - 30.0 * 5.0 * 36.0 / 4.0)
             / sqrt(30.0 * 25.0 * 36.0 * 4.0 / 144.0) AS z,
           (CAST(l.l2 AS DOUBLE) / 2.0
            > 30.0 * 5.0 * 36.0 / 4.0
              + 1.6449
                * sqrt(30.0 * 25.0 * 36.0 * 4.0 / 144.0)) AS increasing
    FROM sums CROSS JOIN l
    ORDER BY t
    """,
)
def q_page_trend(spark, sf_dir):
    """PAGE'S L TEST for ordered alternatives — the trend-powered
    refinement of q_friedman_test (Friedman asks 'any treatment
    difference across blocks?'; Page asks 'monotone in the
    HYPOTHESIZED order?' — here the frozen lexicographic type order,
    scores j = 1..5): within each of the 30 day-blocks the 5 types'
    exact daily cents are rank-scored with DOUBLED midranks (2x
    keeps ties on the integer lattice — the q_kruskal_wallis
    discipline; zero-filled cells CAN tie at zero), built by
    COUNTING comparisons on the 5x5 per-day join (no sort), and
    L2 = sum_j j*R2_j is an exact BIGINT. The z readout and the
    one-sided alpha=0.05 'increasing' call are identical double
    chains over frozen constants (b=30, k=5 -> E[L]=1350,
    sigma^2=750). At 100 TB: raw volume dies in the (type, day) hash
    agg; ranking joins 150-row broadcast frames."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    jcase = (
        "CASE t WHEN 'click' THEN 1 WHEN 'error' THEN 2"
        " WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4"
        " WHEN 'view' THEN 5 END"
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t",
            "d",
            F.coalesce("x", F.lit(0)).cast("bigint").alias("x"),
            F.expr(f"CAST(({jcase}) AS BIGINT)").alias("j"),
        )
    )
    grid = track_persist(grid)
    a = grid.alias("a")
    b = grid.alias("b")
    ranked = (
        a.join(F.broadcast(b), F.col("a.d") == F.col("b.d"))
        .groupBy(
            F.col("a.t").alias("t"), F.col("a.j").alias("j"), F.col("a.d")
        )
        .agg(
            (
                F.sum(
                    F.when(F.col("b.x") < F.col("a.x"), 2)
                    .when(F.col("b.x") == F.col("a.x"), 1)
                    .otherwise(0)
                )
                + 1
            )
            .cast("bigint")
            .alias("r2")
        )
    )
    sums = ranked.groupBy("t", "j").agg(
        F.sum("r2").cast("bigint").alias("r2_sum")
    )
    sums = track_persist(sums)
    l2 = sums.agg(
        F.sum(F.col("j") * F.col("r2_sum")).cast("bigint").alias("l2")
    )
    e_l = 30.0 * 5.0 * 36.0 / 4.0
    sd = "sqrt(30.0 * 25.0 * 36.0 * 4.0 / 144.0)"
    return (
        sums.crossJoin(F.broadcast(l2))
        .select(
            "t",
            "j",
            "r2_sum",
            "l2",
            F.expr(
                f"(CAST(l2 AS DOUBLE) / 2.0 - {e_l!r}) / {sd}"
            ).alias("z"),
            F.expr(
                f"CAST(l2 AS DOUBLE) / 2.0 > {e_l!r} + 1.6449 * {sd}"
            ).alias("increasing"),
        )
        .orderBy("t")
    )


@staged(
    "q_triad_motifs",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT CAST(user_id % 97 AS BIGINT) AS src,
             CAST((2 * user_id + event_id) % 97 AS BIGINT) AS dst
      FROM events
      WHERE user_id % 97 != (2 * user_id + event_id) % 97
    ),
    mut AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_recip
      FROM edges e JOIN edges r ON r.src = e.dst AND r.dst = e.src
    ),
    p2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_path2
      FROM edges e1 JOIN edges e2 ON e2.src = e1.dst
      WHERE e2.dst != e1.src
    ),
    cyc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cyclic3
      FROM edges e1
      JOIN edges e2 ON e2.src = e1.dst
      JOIN edges e3 ON e3.src = e2.dst AND e3.dst = e1.src
      WHERE e1.src < e1.dst AND e1.src < e2.dst
    ),
    tra AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_trans3
      FROM edges e1
      JOIN edges e2 ON e2.src = e1.dst
      JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
      WHERE e2.dst != e1.src
    ),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
    SELECT ne.n_edges, CAST(mut.n_recip // 2 AS BIGINT) AS n_mutual_pairs,
           p2.n_path2, cyc.n_cyclic3, tra.n_trans3,
           CAST((tra.n_trans3 * 1000000) // p2.n_path2 AS BIGINT)
             AS closure_micro,
           CAST(tra.n_trans3 AS DOUBLE) / CAST(p2.n_path2 AS DOUBLE)
             AS closure
    FROM ne CROSS JOIN mut CROSS JOIN p2 CROSS JOIN cyc CROSS JOIN tra
    """,
)
def q_triad_motifs(spark, sf_dir):
    """DIRECTED TRIAD MOTIF COUNTS over the mod-97 interaction graph
    — the directed completion of q_triangle_count /
    q_clustering_coeff (undirected triangles can't tell feed-forward
    from feedback; the cyclic-vs-transitive split is THE
    motif-finding result on regulatory/information networks):
    2-paths u->v->w, CYCLIC triangles (u->v->w->u, counted once via
    the min-node rotation anchor u < v AND u < w — an exact integer
    canonicalization, no division by 3), and TRANSITIVE pattern
    occurrences (u->v->w plus the u->w shortcut, identified uniquely
    by their ordered 2-path). The edge projection is shared verbatim
    with q_reciprocity (mod-97, so the node set — and every join
    below — is lattice-bounded regardless of data scale). All counts
    exact BIGINT; the feed-forward closure ratio rides the
    integer-micro lattice plus one identical double division. At
    100 TB: raw volume dies in the distinct-edge projection; the
    triangle joins co-partition on the 97-node key space."""
    ev = _t(spark, sf_dir, "events")
    src = F.col("user_id") % 97
    dst = (F.lit(2) * F.col("user_id") + F.col("event_id")) % 97
    edges = (
        ev.select(
            src.cast("bigint").alias("src"), dst.cast("bigint").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    edges = track_persist(edges)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    mut = (
        e1.join(
            F.broadcast(e2),
            (F.col("e2.src") == F.col("e1.dst"))
            & (F.col("e2.dst") == F.col("e1.src")),
        )
        .agg(F.count("*").cast("bigint").alias("n_recip"))
        .select(
            F.expr("CAST(n_recip div 2 AS BIGINT)").alias("n_mutual_pairs")
        )
    )
    p2 = (
        e1.join(F.broadcast(e2), F.col("e2.src") == F.col("e1.dst"))
        .filter(F.col("e2.dst") != F.col("e1.src"))
        .agg(F.count("*").cast("bigint").alias("n_path2"))
    )
    cyc = (
        e1.join(F.broadcast(e2), F.col("e2.src") == F.col("e1.dst"))
        .join(
            F.broadcast(e3),
            (F.col("e3.src") == F.col("e2.dst"))
            & (F.col("e3.dst") == F.col("e1.src")),
        )
        .filter(
            (F.col("e1.src") < F.col("e1.dst"))
            & (F.col("e1.src") < F.col("e2.dst"))
        )
        .agg(F.count("*").cast("bigint").alias("n_cyclic3"))
    )
    tra = (
        e1.join(F.broadcast(e2), F.col("e2.src") == F.col("e1.dst"))
        .filter(F.col("e2.dst") != F.col("e1.src"))
        .join(
            F.broadcast(e3),
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count("*").cast("bigint").alias("n_trans3"))
    )
    ne = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    return (
        ne.crossJoin(F.broadcast(mut))
        .crossJoin(F.broadcast(p2))
        .crossJoin(F.broadcast(cyc))
        .crossJoin(F.broadcast(tra))
        .select(
            "n_edges",
            "n_mutual_pairs",
            "n_path2",
            "n_cyclic3",
            "n_trans3",
            F.expr(
                "CAST((n_trans3 * 1000000) div n_path2 AS BIGINT)"
            ).alias("closure_micro"),
            (
                F.col("n_trans3").cast("double")
                / F.col("n_path2").cast("double")
            ).alias("closure"),
        )
    )


def _dtw_cells():
    """The 49 DTW DP cell expressions in dependency order, shared
    textually by both engines (generated from one loop — the
    q_bradley_terry discipline). Cell names d{i}_{j}; inputs xa0..xa6,
    xb0..xb6."""
    cells = []
    for i in range(7):
        for j in range(7):
            cost = f"abs(xa{i} - xb{j})"
            if i == 0 and j == 0:
                e = cost
            elif i == 0:
                e = f"{cost} + d0_{j - 1}"
            elif j == 0:
                e = f"{cost} + d{i - 1}_0"
            else:
                e = (
                    f"{cost} + least(d{i - 1}_{j}, d{i}_{j - 1},"
                    f" d{i - 1}_{j - 1})"
                )
            cells.append((f"d{i}_{j}", e))
    return cells


def _dtw_oracle() -> str:
    lateral = ",\n             ".join(
        f"{e} AS {n}" for n, e in _dtw_cells()
    )
    l1 = " + ".join(f"abs(xa{k} - xb{k})" for k in range(7))
    prof_cells = ", ".join(
        f"CAST(SUM(CASE WHEN dow = {k} THEN c ELSE 0 END) // 100"
        f" AS BIGINT) AS p{k}"
        for k in range(7)
    )
    return f"""
    WITH base AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
               AS dow,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    prof AS (
      SELECT t, {prof_cells} FROM base GROUP BY t
    ),
    pairs AS (
      SELECT a.t AS ta, b.t AS tb,
             a.p0 AS xa0, a.p1 AS xa1, a.p2 AS xa2, a.p3 AS xa3,
             a.p4 AS xa4, a.p5 AS xa5, a.p6 AS xa6,
             b.p0 AS xb0, b.p1 AS xb1, b.p2 AS xb2, b.p3 AS xb3,
             b.p4 AS xb4, b.p5 AS xb5, b.p6 AS xb6
      FROM prof a JOIN prof b ON a.t < b.t
    ),
    dp AS (
      SELECT ta, tb,
             {lateral},
             CAST({l1} AS BIGINT) AS l1_diag
      FROM pairs
    )
    SELECT ta, tb, CAST(d6_6 AS BIGINT) AS dtw, l1_diag
    FROM dp ORDER BY ta, tb
    """


@staged("q_dtw_distance", oracle=_dtw_oracle())
def q_dtw_distance(spark, sf_dir):
    """DYNAMIC TIME WARPING distance between every pair of event
    types' weekly profiles — the elastic-alignment similarity measure
    (two series with the same shape shifted by a day should be NEAR;
    every lockstep metric in the catalog — q_cross_corr,
    q_source_similarity, the staged q_burrows_delta — calls them
    far): profiles are the 7 FIXED day-of-week conditional dollar
    aggregates (anchor-mod-7, the q_seasonal_strength discipline),
    and the full 7x7 Bellman table is UNROLLED into 49 integer cell
    expressions generated from ONE Python loop for both engines
    (Spark chained column projections, DuckDB lateral column
    aliases) — every |x_i - y_j| cost and every
    least(up, left, diag) recurrence is exact BIGINT end to end; no
    float ever enters. The witness pins DTW <= the lockstep L1
    diagonal (warping can only help) and DTW >= |sum x - sum y|
    intuition is NOT claimed (false in general). At 100 TB: raw
    volume dies in the per-type dow agg; the DP is 49 scalar
    expressions over a 10-row broadcast pair frame."""
    base = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        (
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
            % 7
        ).alias("dow"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
    )
    prof = base.groupBy("t").agg(
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN dow = {k} THEN c ELSE 0 END) div 100"
                f" AS BIGINT)"
            ).alias(f"p{k}")
            for k in range(7)
        ]
    )
    prof = track_persist(prof)
    a = prof.alias("a")
    b = prof.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.t") < F.col("b.t")
    ).select(
        F.col("a.t").alias("ta"),
        F.col("b.t").alias("tb"),
        *[F.col(f"a.p{k}").alias(f"xa{k}") for k in range(7)],
        *[F.col(f"b.p{k}").alias(f"xb{k}") for k in range(7)],
    )
    dp = pairs
    for name, expr in _dtw_cells():
        dp = dp.withColumn(name, F.expr(expr))
    l1 = " + ".join(f"abs(xa{k} - xb{k})" for k in range(7))
    return dp.select(
        "ta",
        "tb",
        F.col("d6_6").cast("bigint").alias("dtw"),
        F.expr(f"CAST({l1} AS BIGINT)").alias("l1_diag"),
    ).orderBy("ta", "tb")


# =====================================================================
# Round-12 staged batch 14 — stratified association (Mantel-Haenszel),
# cumulative hazard (Nelson-Aalen), queueing identity audit (Little's
# law, sweep-vs-direct exact cross-check), and optimal coding cost
# (Huffman fold). Promotion target: round 13.
# =====================================================================


@staged(
    "q_mantel_haenszel",
    oracle="""
    WITH base AS (
      SELECT event_type AS t,
             CAST(CAST('0x' || substring(
               md5(CAST(user_id AS VARCHAR) || ':mh'), 1, 8) AS BIGINT)
               % 2 AS BIGINT) AS exposed,
             CASE WHEN CAST(round(value * 100) AS BIGINT) > 5000
                  THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    cells AS (
      SELECT t,
             CAST(SUM(CASE WHEN exposed = 1 AND hit = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
             CAST(SUM(CASE WHEN exposed = 1 AND hit = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS b,
             CAST(SUM(CASE WHEN exposed = 0 AND hit = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(SUM(CASE WHEN exposed = 0 AND hit = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS d
      FROM base GROUP BY t
    ),
    terms AS (
      SELECT t, a, b, c, d,
             CAST(a + b + c + d AS BIGINT) AS n,
             CAST(floor(CAST(a * d AS DOUBLE) / CAST(a + b + c + d
               AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT) AS r_nano,
             CAST(floor(CAST(b * c AS DOUBLE) / CAST(a + b + c + d
               AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT) AS s_nano
      FROM cells
    ),
    tot AS (
      SELECT CAST(SUM(r_nano) AS BIGINT) AS num_nano,
             CAST(SUM(s_nano) AS BIGINT) AS den_nano
      FROM terms
    )
    SELECT terms.t AS t, terms.a, terms.b, terms.c, terms.d,
           terms.r_nano, terms.s_nano,
           tot.num_nano, tot.den_nano,
           CAST(tot.num_nano AS DOUBLE) / CAST(tot.den_nano AS DOUBLE)
             AS or_mh,
           (tot.num_nano > tot.den_nano) AS harmful
    FROM terms CROSS JOIN tot
    ORDER BY t
    """,
)
def q_mantel_haenszel(spark, sf_dir):
    """MANTEL-HAENSZEL common odds ratio across the 5 event-type
    strata — the confounder-adjusted completion of the staged
    q_odds_ratio (a pooled 2x2 table can reverse the true effect —
    q_simpson_paradox DETECTS that inversion; MH estimates the
    stratum-adjusted effect that survives it):
    OR_MH = sum_i(a_i d_i/n_i) / sum_i(b_i c_i/n_i) with md5-portable
    exposure arms (the q_srm_check discipline) and the exact-cut
    outcome shared with q_cochran_armitage. Every per-stratum
    product a*d, b*c is exact BIGINT; the per-stratum ratio is
    quantized to the 1e-9 lattice BEFORE the exact integer sums
    (the q_log_rank discipline), OR_MH is one division of exact
    lattice integers, and the OR > 1 'harmful' verdict is the exact
    integer compare num_nano > den_nano — a float never classifies.
    At 100 TB: one (stratum, arm, outcome) hash agg kills the raw
    volume; 5 strata feed a scalar reduce."""
    ev = _t(spark, sf_dir, "events")
    exposed = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":mh"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    hit = F.when(
        F.expr("CAST(round(value * 100) AS BIGINT)") > 5000, 1
    ).otherwise(0)
    base = ev.select(
        F.col("event_type").alias("t"),
        exposed.alias("exposed"),
        hit.alias("hit"),
    )
    cells = base.groupBy("t").agg(
        F.sum(F.when((F.col("exposed") == 1) & (F.col("hit") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("exposed") == 1) & (F.col("hit") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("exposed") == 0) & (F.col("hit") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("exposed") == 0) & (F.col("hit") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("bigint")
    terms = cells.select(
        "t",
        "a",
        "b",
        "c",
        "d",
        F.floor(
            (F.col("a") * F.col("d")).cast("double")
            / n.cast("double")
            * 1000000000.0
            + 0.5
        )
        .cast("bigint")
        .alias("r_nano"),
        F.floor(
            (F.col("b") * F.col("c")).cast("double")
            / n.cast("double")
            * 1000000000.0
            + 0.5
        )
        .cast("bigint")
        .alias("s_nano"),
    )
    terms = track_persist(terms)
    tot = terms.agg(
        F.sum("r_nano").cast("bigint").alias("num_nano"),
        F.sum("s_nano").cast("bigint").alias("den_nano"),
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .select(
            "t",
            "a",
            "b",
            "c",
            "d",
            "r_nano",
            "s_nano",
            "num_nano",
            "den_nano",
            (
                F.col("num_nano").cast("double")
                / F.col("den_nano").cast("double")
            ).alias("or_mh"),
            (F.col("num_nano") > F.col("den_nano")).alias("harmful"),
        )
        .orderBy("t")
    )


@staged(
    "q_nelson_aalen",
    oracle="""
    WITH life AS (
      SELECT user_id,
             datediff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
               AS t,
             CASE WHEN user_id % 4 != 0 THEN 1 ELSE 0 END AS ev
      FROM events GROUP BY user_id
    ),
    bins AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM life GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             CAST(SUM(c) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
      FROM bins
    ),
    steps AS (
      SELECT t, d, n_risk,
             CAST(floor(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
               * 1000000000.0 + 0.5) AS BIGINT) AS h_nano
      FROM risk WHERE d > 0
    )
    SELECT t AS t_days, d AS n_events, n_risk, h_nano,
           CAST(SUM(h_nano) OVER (ORDER BY t) AS BIGINT) AS hcum_nano,
           CAST(SUM(h_nano) OVER (ORDER BY t) AS DOUBLE) / 1000000000.0
             AS h_cum
    FROM steps ORDER BY t
    """,
)
def q_nelson_aalen(spark, sf_dir):
    """NELSON-AALEN cumulative hazard estimator H(t) = sum_{s<=t}
    d(s)/n(s) — the additive twin of q_kaplan_meier's multiplicative
    survival product (KM multiplies survival factors; NA sums hazard
    increments, better-behaved for small risk sets, and H = -ln S
    asymptotically — the LOG-form survival curve, kept in log form
    because exp() is 1-ulp non-portable across engines, the
    q_pythagorean_means finding): lifetime construction and the
    deterministic 25% censoring rule shared verbatim with
    q_kaplan_meier, per-step hazard d/n quantized to the 1e-9
    lattice, and the cumulative is an EXACT integer prefix sum over
    death times — no float accumulates. At 100 TB: one user-keyed
    agg kills the raw volume; both windows run over the bounded day
    domain; needs a BOUNDED_UNPARTITIONED_WINDOW allowlist row at
    promotion (day-domain cums, the q_kaplan_meier precedent)."""
    ev = _t(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date")).alias(
            "t"
        ),
        F.when(F.col("user_id") % 4 != 0, 1).otherwise(0).alias("ev"),
    )
    bins = life.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("c"),
    )
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = bins.select(
        "t", "d", F.sum("c").over(w_rev).cast("bigint").alias("n_risk")
    ).filter(F.col("d") > 0)
    steps = risk.select(
        "t",
        "d",
        "n_risk",
        F.floor(
            F.col("d").cast("double")
            / F.col("n_risk").cast("double")
            * 1000000000.0
            + 0.5
        )
        .cast("bigint")
        .alias("h_nano"),
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return steps.select(
        F.col("t").alias("t_days"),
        F.col("d").alias("n_events"),
        "n_risk",
        "h_nano",
        F.sum("h_nano").over(w_cum).cast("bigint").alias("hcum_nano"),
        (F.sum("h_nano").over(w_cum).cast("double") / 1000000000.0).alias(
            "h_cum"
        ),
    ).orderBy("t_days")


@staged(
    "q_little_law",
    oracle="""
    WITH sess AS (
      SELECT user_id,
             CAST(epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS arr,
             CAST(epoch_us(MAX(ts)) // 1000000 AS BIGINT) AS dep
      FROM events GROUP BY user_id
    ),
    direct AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(dep - arr) AS BIGINT) AS total_wait_s,
             CAST(MIN(arr) AS BIGINT) AS t0,
             CAST(MAX(dep) AS BIGINT) AS t1
      FROM sess
    ),
    pts AS (
      SELECT arr AS ts, CAST(1 AS BIGINT) AS delta FROM sess
      UNION ALL
      SELECT dep AS ts, CAST(-1 AS BIGINT) AS delta FROM sess
    ),
    tl AS (
      SELECT ts, CAST(SUM(delta) AS BIGINT) AS d
      FROM pts GROUP BY ts
    ),
    sweep AS (
      SELECT ts,
             CAST(SUM(d) OVER (ORDER BY ts) AS BIGINT) AS active,
             CAST(LEAD(ts) OVER (ORDER BY ts) - ts AS BIGINT) AS span
      FROM tl
    ),
    area AS (
      SELECT CAST(SUM(active * span) AS BIGINT) AS area_s
      FROM sweep WHERE span IS NOT NULL
    )
    SELECT direct.n_users, direct.total_wait_s, area.area_s,
           CAST(direct.t1 - direct.t0 AS BIGINT) AS horizon_s,
           (direct.total_wait_s = area.area_s) AS identity_exact,
           CAST(direct.n_users AS DOUBLE) * 3600.0
             / CAST(direct.t1 - direct.t0 AS DOUBLE) AS lambda_per_hr,
           CAST(direct.total_wait_s AS DOUBLE)
             / CAST(direct.n_users AS DOUBLE) AS w_mean_s,
           CAST(area.area_s AS DOUBLE)
             / CAST(direct.t1 - direct.t0 AS DOUBLE) AS l_avg
    FROM direct CROSS JOIN area
    """,
)
def q_little_law(spark, sf_dir):
    """LITTLE'S LAW AUDIT (L = lambda * W) over user sessions — the
    queueing-theory conservation identity every capacity model rests
    on, checked the strong way: the time-average number-in-system L
    is computed TWICE by genuinely different routes — (1) directly
    as sum of session durations / horizon, and (2) by the +-1
    TIMELINE SWEEP (arrival/departure deltas, cumulative active
    count, exact active*span integral — the q_temporal_sum_timeline
    machinery used as an auditor). Both are exact integer SECONDS,
    so the identity_exact column is an integer EQUALITY, not an
    epsilon test (the q_knapsack_dp two-routes discipline — sweep
    vs direct is a real cross-check, not a replay; Little's identity
    telescopes only because every interval is counted once, which
    the sweep verifies structurally). lambda, W-bar and L are one
    identical double chain each. At 100 TB: one user-keyed agg
    kills the raw volume; the sweep runs over the distinct
    arrival/departure second lattice — needs a
    BOUNDED_UNPARTITIONED_WINDOW allowlist row at promotion (the
    cum runs over |distinct seconds| <= 2*|users| rows)."""
    sess = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("CAST(unix_micros(MIN(ts)) div 1000000 AS BIGINT)").alias(
                "arr"
            ),
            F.expr("CAST(unix_micros(MAX(ts)) div 1000000 AS BIGINT)").alias(
                "dep"
            ),
        )
    )
    sess = track_persist(sess)
    direct = sess.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum(F.col("dep") - F.col("arr")).cast("bigint").alias(
            "total_wait_s"
        ),
        F.min("arr").cast("bigint").alias("t0"),
        F.max("dep").cast("bigint").alias("t1"),
    )
    pts = sess.select(
        F.col("arr").alias("ts"), F.lit(1).cast("bigint").alias("delta")
    ).unionAll(
        sess.select(
            F.col("dep").alias("ts"), F.lit(-1).cast("bigint").alias("delta")
        )
    )
    tl = pts.groupBy("ts").agg(F.sum("delta").cast("bigint").alias("d"))
    w_ord = Window.orderBy("ts")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sweep = tl.select(
        "ts",
        F.sum("d").over(w_cum).cast("bigint").alias("active"),
        (F.lead("ts").over(w_ord) - F.col("ts")).cast("bigint").alias(
            "span"
        ),
    )
    area = sweep.filter(F.col("span").isNotNull()).agg(
        F.sum(F.col("active") * F.col("span")).cast("bigint").alias("area_s")
    )
    return direct.crossJoin(F.broadcast(area)).select(
        "n_users",
        "total_wait_s",
        "area_s",
        (F.col("t1") - F.col("t0")).cast("bigint").alias("horizon_s"),
        (F.col("total_wait_s") == F.col("area_s")).alias("identity_exact"),
        (
            F.col("n_users").cast("double")
            * 3600.0
            / (F.col("t1") - F.col("t0")).cast("double")
        ).alias("lambda_per_hr"),
        (
            F.col("total_wait_s").cast("double")
            / F.col("n_users").cast("double")
        ).alias("w_mean_s"),
        (
            F.col("area_s").cast("double")
            / (F.col("t1") - F.col("t0")).cast("double")
        ).alias("l_avg"),
    )


@staged(
    "q_huffman_cost",
    oracle="""
    WITH RECURSIVE weights AS (
      SELECT CAST(user_id % 8 AS BIGINT) AS sym,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM events GROUP BY 1
    ),
    init AS (
      SELECT 0 AS k, list_sort(list(w)) AS ws, CAST(0 AS BIGINT) AS cost
      FROM weights
    ),
    merged AS (
      SELECT k, ws, cost FROM init
      UNION ALL
      SELECT k + 1,
             list_sort(list_append(ws[3:], ws[1] + ws[2])),
             cost + ws[1] + ws[2]
      FROM merged WHERE k < 7
    )
    SELECT CAST(8 AS BIGINT) AS n_symbols,
           (SELECT CAST(SUM(w) AS BIGINT) FROM weights) AS total_weight,
           CAST(cost AS BIGINT) AS huffman_cost,
           CAST(cost AS DOUBLE)
             / (SELECT CAST(SUM(w) AS DOUBLE) FROM weights) AS avg_bits
    FROM merged WHERE k = 7
    """,
)
def q_huffman_cost(spark, sf_dir):
    """HUFFMAN OPTIMAL PREFIX-CODE COST over the 8 user-bucket symbol
    weights — the information-theory floor for any entropy coder
    (q_entropy gives the Shannon LOWER bound; Huffman is the
    achievable integer-bit optimum; q_postings_compression /
    q_encoding_advisor pick codecs — this prices the best possible
    one): the classic greedy (merge the two lightest subtrees, cost
    += merged weight, 7 merges for 8 symbols) runs as ONE
    F.aggregate fold over a SORTED-LIST state — total cost depends
    only on the weight MULTISET (tie-order between equal weights
    provably cannot change the sum of merged weights), so
    re-sorting each round is a deterministic canonicalization, not
    a tie gamble. All weights and costs exact BIGINT. The oracle
    replays the fold as a 7-step recursive CTE on a DuckDB list
    state; the WITNESS solves it independently with a Python heap
    (heapq Huffman — the textbook implementation, a genuinely
    different algorithmic route). At 100 TB: one hash agg to 8
    weights; the fold is 7 steps over an 8-element array."""
    weights = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(user_id % 8 AS BIGINT)").alias("sym"))
        .agg(F.count("*").cast("bigint").alias("w"))
    )
    folded = weights.agg(
        F.array_sort(F.collect_list("w")).alias("ws"),
        F.sum("w").cast("bigint").alias("total_weight"),
    ).select(
        "total_weight",
        F.expr(
            "aggregate(sequence(1, 7),"
            " struct(ws AS ws, CAST(0 AS BIGINT) AS cost),"
            " (acc, k) -> struct("
            "   array_sort(array_append(slice(acc.ws, 3, size(acc.ws) - 2),"
            "     element_at(acc.ws, 1) + element_at(acc.ws, 2))) AS ws,"
            "   acc.cost + element_at(acc.ws, 1) + element_at(acc.ws, 2)"
            "     AS cost))"
        ).alias("st"),
    )
    return folded.select(
        F.lit(8).cast("bigint").alias("n_symbols"),
        "total_weight",
        F.col("st")["cost"].cast("bigint").alias("huffman_cost"),
        (
            F.col("st")["cost"].cast("double")
            / F.col("total_weight").cast("double")
        ).alias("avg_bits"),
    )


# =====================================================================
# Round-12 staged batch 15 — OR / matching / text-mining mechanisms:
# northwest-corner transportation start, Gale-Shapley stable matching
# (stability verified independently), RAKE keyword extraction.
# Promotion target: round 13.
# =====================================================================


@staged(
    "q_transportation_nw",
    oracle="""
    WITH RECURSIVE sup AS (
      SELECT dense_rank() OVER (ORDER BY c.c_mktsegment) - 1 AS i,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS s
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment
    ),
    dem AS (
      SELECT dense_rank() OVER (ORDER BY o.o_orderpriority) - 1 AS j,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS d
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderpriority
    ),
    init AS (
      SELECT 0 AS k, 0 AS ci, 0 AS cj,
             (SELECT list(s ORDER BY i) FROM sup) AS si,
             (SELECT list(d ORDER BY j) FROM dem) AS dj,
             CAST([] AS STRUCT(i INT, j INT, q BIGINT)[]) AS allocs
    ),
    steps AS (
      SELECT * FROM init
      UNION ALL
      SELECT k + 1,
             CASE WHEN least(si[ci + 1], dj[cj + 1]) = si[ci + 1]
                   AND ci < 4 THEN ci + 1 ELSE ci END,
             CASE WHEN least(si[ci + 1], dj[cj + 1]) = si[ci + 1]
                   AND ci < 4 THEN cj
                  WHEN cj < 4 THEN cj + 1 ELSE cj END,
             list_transform(range(1, 6), x ->
               CASE WHEN x = ci + 1
                    THEN si[x] - least(si[ci + 1], dj[cj + 1])
                    ELSE si[x] END),
             list_transform(range(1, 6), x ->
               CASE WHEN x = cj + 1
                    THEN dj[x] - least(si[ci + 1], dj[cj + 1])
                    ELSE dj[x] END),
             list_append(allocs,
               {'i': ci, 'j': cj,
                'q': least(si[ci + 1], dj[cj + 1])})
      FROM steps WHERE k < 9
    ),
    final AS (SELECT allocs FROM steps WHERE k = 9),
    cells AS (
      SELECT final.allocs[nn.n].i AS i, final.allocs[nn.n].j AS j,
             final.allocs[nn.n].q AS q, CAST(nn.n AS BIGINT) AS step
      FROM final CROSS JOIN (SELECT unnest(range(1, 10)) AS n) nn
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(q AS BIGINT) AS alloc, step
    FROM cells WHERE q > 0 ORDER BY step
    """,
)
def q_transportation_nw(spark, sf_dir):
    """NORTHWEST-CORNER initial solution to the balanced
    transportation problem — the classic OR starting tableau
    (supplies = quantity by customer segment, demands = quantity by
    order priority: TWO PARTITIONS OF THE SAME LINEITEM TOTAL, so
    the instance is exactly balanced BY CONSTRUCTION, no slack
    fudge): walk the 5x5 tableau from the NW corner, ship
    min(supply_i, demand_j), advance the exhausted side (supply
    first on simultaneous exhaustion — a deterministic degeneracy
    rule shared by both engines), 9 steps total (i+j goes 0 to 8).
    The whole walk is ONE F.aggregate fold over sequence(1,9) with a
    (supplies, demands, cursor, allocations) state — exact BIGINT
    quantities throughout. The witness replays in Python AND pins
    the feasibility invariants (row sums = supplies, column sums =
    demands, at most m+n-1 positive cells). At 100 TB: two hash
    aggs (segment, priority) kill the raw volume; the fold is 9
    steps over 5-element arrays."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    cs = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = li.select(
        "l_orderkey", F.col("l_quantity").cast("bigint").alias("q")
    ).join(
        F.broadcast(od), F.col("l_orderkey") == F.col("o_orderkey")
    )
    sup = (
        joined.join(F.broadcast(cs), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.sum("q").cast("bigint").alias("s"))
        .select(
            (F.dense_rank().over(Window.orderBy("c_mktsegment")) - 1).alias(
                "i"
            ),
            "s",
        )
    )
    dem = (
        joined.groupBy("o_orderpriority")
        .agg(F.sum("q").cast("bigint").alias("d"))
        .select(
            (
                F.dense_rank().over(Window.orderBy("o_orderpriority")) - 1
            ).alias("j"),
            "d",
        )
    )
    si = sup.agg(
        F.expr("transform(array_sort(collect_list(struct(i, s))), x -> x.s)")
        .alias("si")
    )
    dj = dem.agg(
        F.expr("transform(array_sort(collect_list(struct(j, d))), x -> x.d)")
        .alias("dj")
    )
    fold = F.expr(
        "aggregate(sequence(1, 9),"
        " struct(CAST(0 AS INT) AS ci, CAST(0 AS INT) AS cj,"
        "        si AS si, dj AS dj,"
        "        CAST(array() AS"
        "          ARRAY<STRUCT<i: INT, j: INT, q: BIGINT>>) AS allocs),"
        " (acc, k) -> struct("
        "   CASE WHEN least(element_at(acc.si, acc.ci + 1),"
        "                   element_at(acc.dj, acc.cj + 1))"
        "             = element_at(acc.si, acc.ci + 1)"
        "         AND acc.ci < 4 THEN acc.ci + 1 ELSE acc.ci END AS ci,"
        "   CASE WHEN least(element_at(acc.si, acc.ci + 1),"
        "                   element_at(acc.dj, acc.cj + 1))"
        "             = element_at(acc.si, acc.ci + 1)"
        "         AND acc.ci < 4 THEN acc.cj"
        "        WHEN acc.cj < 4 THEN acc.cj + 1 ELSE acc.cj END AS cj,"
        "   transform(acc.si, (x, xi) ->"
        "     CASE WHEN xi = acc.ci"
        "          THEN x - least(element_at(acc.si, acc.ci + 1),"
        "                         element_at(acc.dj, acc.cj + 1))"
        "          ELSE x END) AS si,"
        "   transform(acc.dj, (x, xi) ->"
        "     CASE WHEN xi = acc.cj"
        "          THEN x - least(element_at(acc.si, acc.ci + 1),"
        "                         element_at(acc.dj, acc.cj + 1))"
        "          ELSE x END) AS dj,"
        "   array_append(acc.allocs, struct(acc.ci AS i, acc.cj AS j,"
        "     least(element_at(acc.si, acc.ci + 1),"
        "           element_at(acc.dj, acc.cj + 1)) AS q)) AS allocs))"
        ".allocs"
    )
    folded = si.crossJoin(F.broadcast(dj)).select(fold.alias("allocs"))
    return (
        folded.select(F.posexplode("allocs").alias("pos", "a"))
        .select(
            F.col("a")["i"].cast("bigint").alias("i"),
            F.col("a")["j"].cast("bigint").alias("j"),
            F.col("a")["q"].cast("bigint").alias("alloc"),
            (F.col("pos") + 1).cast("bigint").alias("step"),
        )
        .filter(F.col("alloc") > 0)
        .orderBy("step")
    )


_GS_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"]
_GS_PRIS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"]


def _gs_step(d: str) -> dict:
    """Gale-Shapley single-proposal step expressions for dialect d in
    {'spark', 'duck'} — generated from one template so the two engines
    cannot drift. State: nx (next-preference index per man), cur
    (engaged man per woman, -1 = free); constants pmf (man-preference
    woman indices, flattened 4x4) and wrf (woman's rank of man,
    flattened 4x4)."""
    if d == "spark":
        el = lambda a, i: f"element_at({a}, CAST({i} + 1 AS INT))"  # noqa: E731
        flt = "filter(sequence(0, 3), i -> NOT array_contains(acc.cur, i)"
        flt += " AND element_at(acc.nx, CAST(i + 1 AS INT)) < 4)"
        m = f"try_element_at({flt}, 1)"
        nx, cur = "acc.nx", "acc.cur"
    else:
        el = lambda a, i: f"{a}[({i}) + 1]"  # noqa: E731
        flt = (
            "list_filter(range(0, 4), i -> NOT list_contains(rec.cur, i)"
            " AND rec.nx[i + 1] < 4)"
        )
        m = f"({flt})[1]"
        nx, cur = "rec.nx", "rec.cur"
    j = el("pmf", f"{m} * 4 + {el(nx, m)}")
    curj = el(cur, j)
    engage = (
        f"CASE WHEN {curj} = -1 THEN TRUE"
        f" ELSE {el('wrf', f'{j} * 4 + {m}')}"
        f" < {el('wrf', f'{j} * 4 + {curj}')} END"
    )
    if d == "spark":
        new_nx = (
            f"CASE WHEN {m} IS NULL THEN acc.nx ELSE"
            f" transform(acc.nx, (x, i) ->"
            f" CASE WHEN i = {m} THEN x + 1 ELSE x END) END"
        )
        new_cur = (
            f"CASE WHEN {m} IS NULL THEN acc.cur"
            f" WHEN {engage} THEN transform(acc.cur, (x, i) ->"
            f" CASE WHEN i = {j} THEN {m} ELSE x END)"
            f" ELSE acc.cur END"
        )
    else:
        new_nx = (
            f"CASE WHEN {m} IS NULL THEN rec.nx ELSE"
            f" list_transform(range(0, 4), i ->"
            f" CASE WHEN i = {m} THEN rec.nx[i + 1] + 1"
            f" ELSE rec.nx[i + 1] END) END"
        )
        new_cur = (
            f"CASE WHEN {m} IS NULL THEN rec.cur"
            f" WHEN {engage} THEN list_transform(range(0, 4), i ->"
            f" CASE WHEN i = {j} THEN {m} ELSE rec.cur[i + 1] END)"
            f" ELSE rec.cur END"
        )
    return {"nx": new_nx, "cur": new_cur}


def _gs_oracle() -> str:
    st = _gs_step("duck")
    segs = ", ".join(f"'{s}'" for s in _GS_SEGS)
    pris = ", ".join(f"'{p}'" for p in _GS_PRIS)
    return f"""
    WITH RECURSIVE aff AS (
      SELECT list_position([{segs}], c.c_mktsegment) - 1 AS i,
             list_position([{pris}], o.o_orderpriority) - 1 AS j,
             CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS a
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ({segs})
        AND o.o_orderpriority IN ({pris})
      GROUP BY 1, 2
    ),
    pm AS (
      SELECT i, list(j ORDER BY a DESC, j) AS prefs
      FROM aff GROUP BY i
    ),
    wr AS (
      SELECT j, i,
             row_number() OVER (PARTITION BY j ORDER BY a DESC, i) AS rk
      FROM aff
    ),
    const AS (
      SELECT
        (SELECT flatten(list(prefs ORDER BY i)) FROM pm) AS pmf,
        (SELECT list(rk ORDER BY j, i) FROM wr) AS wrf
    ),
    rec AS (
      SELECT 0 AS k, [0, 0, 0, 0] AS nx, [-1, -1, -1, -1] AS cur
      UNION ALL
      SELECT rec.k + 1, {st['nx']}, {st['cur']}
      FROM rec CROSS JOIN const WHERE rec.k < 16
    ),
    final AS (SELECT cur FROM rec WHERE k = 16),
    out AS (
      SELECT jj.j AS j, final.cur[jj.j + 1] AS m
      FROM final CROSS JOIN (SELECT unnest(range(0, 4)) AS j) jj
    )
    SELECT [{pris}][out.j + 1] AS acceptor,
           [{segs}][out.m + 1] AS proposer,
           CAST(aff.a AS BIGINT) AS affinity_cents,
           CAST((SELECT rk FROM wr WHERE wr.j = out.j AND wr.i = out.m)
             AS BIGINT) AS acceptor_rank_of_match,
           CAST(list_position((SELECT prefs FROM pm WHERE pm.i = out.m),
             out.j) AS BIGINT) AS proposer_rank_of_match
    FROM out JOIN aff ON aff.i = out.m AND aff.j = out.j
    ORDER BY acceptor
    """


@staged("q_gale_shapley", oracle=_gs_oracle())
def q_gale_shapley(spark, sf_dir):
    """GALE-SHAPLEY STABLE MATCHING between the 4 lex-first customer
    segments (proposers) and 4 lex-first order priorities
    (acceptors), preferences from exact order-cents affinities —
    the deferred-acceptance mechanism (the 2012 Nobel algorithm;
    q_local_matching is greedy and can leave BLOCKING PAIRS, GS
    provably cannot): the serial single-proposal loop runs as ONE
    F.aggregate fold over sequence(1,16) (n^2 proposals bounds
    termination for n=4) with a (next-index[4], engaged[4]) state;
    the step expression — lowest free proposer, his next choice,
    the acceptor's exact-rank trade-up test — is GENERATED FROM ONE
    PYTHON TEMPLATE for both engines (_gs_step — the q_dtw_distance
    discipline), preferences and ranks are exact-integer-derived
    (affinity desc, index tiebreak), and the no-proposer-left step
    is an explicit NULL-guarded no-op (try_element_at / DuckDB
    out-of-range NULL — same semantics, test-pinned). The WITNESS
    does not replay: it independently verifies STABILITY (no
    blocking pair exists) and man-optimality vs textbook Python GS.
    At 100 TB: one (segment, priority) hash agg kills the raw
    volume; the fold is 16 steps over two 4-element arrays."""
    st = _gs_step("spark")
    segs_sql = ", ".join(f"'{s}'" for s in _GS_SEGS)
    pris_sql = ", ".join(f"'{p}'" for p in _GS_PRIS)
    od = _t(spark, sf_dir, "orders")
    cs = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    aff = (
        od.join(F.broadcast(cs), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            F.col("c_mktsegment").isin(*_GS_SEGS)
            & F.col("o_orderpriority").isin(*_GS_PRIS)
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("a")
        )
        .select(
            (
                F.expr(f"array_position(array({segs_sql}), c_mktsegment)")
                - 1
            )
            .cast("int")
            .alias("i"),
            (
                F.expr(f"array_position(array({pris_sql}), o_orderpriority)")
                - 1
            )
            .cast("int")
            .alias("j"),
            "a",
        )
    )
    aff = track_persist(aff)
    w_pm = Window.partitionBy("i").orderBy(F.desc("a"), "j")
    pm = (
        aff.select("i", "j", F.row_number().over(w_pm).alias("k"))
        .groupBy("i")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(k, j))),"
                " x -> x.j)"
            ).alias("prefs")
        )
    )
    w_wr = Window.partitionBy("j").orderBy(F.desc("a"), "i")
    wr = aff.select(
        "j", "i", F.row_number().over(w_wr).cast("int").alias("rk")
    )
    wr = track_persist(wr)
    pmf = pm.agg(
        F.expr(
            "flatten(transform(array_sort(collect_list(struct(i, prefs))),"
            " x -> x.prefs))"
        ).alias("pmf")
    )
    wrf = wr.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(j, i, rk))),"
            " x -> x.rk)"
        ).alias("wrf")
    )
    fold = F.expr(
        "aggregate(sequence(1, 16),"
        " struct(array(0, 0, 0, 0) AS nx,"
        "        array(-1, -1, -1, -1) AS cur),"
        f" (acc, k) -> struct(({st['nx']}) AS nx, ({st['cur']}) AS cur))"
        ".cur"
    )
    final = pmf.crossJoin(F.broadcast(wrf)).select(fold.alias("cur"))
    out = final.select(F.posexplode("cur").alias("oj", "om"))
    aff2 = aff.select(
        F.col("i").alias("ai"), F.col("j").alias("aj"), "a"
    )
    wr2 = wr.select(
        F.col("j").alias("wj"), F.col("i").alias("wi"),
        F.col("rk").alias("w_rk"),
    )
    pm2 = pm.select(F.col("i").alias("pi"), "prefs")
    return (
        out.join(
            F.broadcast(aff2),
            (F.col("ai") == F.col("om")) & (F.col("aj") == F.col("oj")),
        )
        .join(
            F.broadcast(wr2),
            (F.col("wj") == F.col("oj")) & (F.col("wi") == F.col("om")),
        )
        .join(F.broadcast(pm2), F.col("pi") == F.col("om"))
        .select(
            F.expr(
                f"element_at(array({pris_sql}), CAST(oj + 1 AS INT))"
            ).alias("acceptor"),
            F.expr(
                f"element_at(array({segs_sql}), CAST(om + 1 AS INT))"
            ).alias("proposer"),
            F.col("a").cast("bigint").alias("affinity_cents"),
            F.col("w_rk").cast("bigint").alias("acceptor_rank_of_match"),
            F.expr("CAST(array_position(prefs, oj) AS BIGINT)").alias(
                "proposer_rank_of_match"
            ),
        )
        .orderBy("acceptor")
    )


@staged(
    "q_rake_keywords",
    oracle="""
    WITH tok AS (
      SELECT doc_id, CAST(p.n AS BIGINT) AS pos, p.t AS t
      FROM (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x != '')
                 AS ts
        FROM documents
      ) d, (SELECT unnest(range(1, 2001)) AS n) nn,
      LATERAL (SELECT nn.n AS n, d.ts[nn.n] AS t) p
      WHERE nn.n <= len(d.ts)
    ),
    flagged AS (
      SELECT doc_id, pos, t,
             CASE WHEN t IN ('a', 'the') THEN 1 ELSE 0 END AS stop,
             SUM(CASE WHEN t IN ('a', 'the') THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM tok
    ),
    phr AS (
      SELECT doc_id, isl,
             list_aggregate(list(t ORDER BY pos), 'string_agg', ' ')
               AS phrase,
             list(t ORDER BY pos) AS words,
             CAST(len(list(t)) AS BIGINT) AS plen
      FROM flagged WHERE stop = 0 GROUP BY doc_id, isl
    ),
    wstat AS (
      SELECT w.t AS t, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(phr.plen) AS BIGINT) AS deg
      FROM phr, LATERAL (SELECT unnest(phr.words) AS t) w
      GROUP BY w.t
    ),
    wscore AS (
      SELECT t, CAST(floor(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)
               * 1000000000.0 + 0.5) AS BIGINT) AS s_nano
      FROM wstat
    ),
    ptype AS (
      SELECT phrase, words, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM phr GROUP BY phrase, words
    ),
    scored AS (
      SELECT p.phrase, p.n_occurrences,
             CAST(len(p.words) AS BIGINT) AS n_words,
             CAST(SUM(ws.s_nano) AS BIGINT) AS score_nano
      FROM ptype p, LATERAL (SELECT unnest(p.words) AS t) w
      JOIN wscore ws ON ws.t = w.t
      GROUP BY p.phrase, p.n_occurrences, p.words
    )
    SELECT phrase, n_words, n_occurrences, score_nano,
           CAST(score_nano AS DOUBLE) / 1000000000.0 AS score
    FROM scored ORDER BY score_nano DESC, phrase LIMIT 10
    """,
)
def q_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (Rapid Automatic Keyword Extraction,
    Rose et al. 2010) over the corpus — the phrase-level keyword
    scorer that completes the text-mining family (q_tfidf ranks
    single terms by document discrimination; RAKE ranks STOPWORD-
    DELIMITED PHRASES by internal co-occurrence degree/frequency):
    candidate phrases are maximal non-stopword runs (frozen
    stopwords {'a','the'} — the fixture's function words), carved
    relationally with the gaps-islands cumulative-stopword-count
    window (the q_gaps_islands discipline, per-doc partitions); word
    degree (sum of host-phrase lengths) and frequency are exact
    BIGINTs over phrase OCCURRENCES; the deg/freq word score is
    quantized to the 1e-9 lattice BEFORE phrase-level exact sums
    (the q_log_rank discipline), so the top-10 ranking and its
    (score desc, phrase asc) tiebreak are decided on exact
    integers — a float never orders the output. At 100 TB: one
    posexplode + per-doc window, two token-keyed hash aggs, a
    phrase-type agg bounded by the phrase-type space, and a
    TakeOrdered(10) — no global sort of the corpus."""
    docs = _t(spark, sf_dir, "documents")
    from ..operators import dedup as dd

    tok = docs.select(
        "doc_id", F.posexplode(dd.tokens_col("text")).alias("pos", "t")
    )
    stop = F.col("t").isin("a", "the")
    w_isl = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = tok.select(
        "doc_id",
        "pos",
        "t",
        F.when(stop, 1).otherwise(0).alias("stop"),
        F.sum(F.when(stop, 1).otherwise(0)).over(w_isl).alias("isl"),
    )
    phr = (
        flagged.filter(F.col("stop") == 0)
        .groupBy("doc_id", "isl")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, t))),"
                " x -> x.t)"
            ).alias("words")
        )
        .select(
            F.concat_ws(" ", F.col("words")).alias("phrase"),
            "words",
            F.size("words").cast("bigint").alias("plen"),
        )
    )
    phr = track_persist(phr)
    wstat = (
        phr.select(F.explode("words").alias("t"), "plen")
        .groupBy("t")
        .agg(
            F.count("*").cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
    )
    wscore = wstat.select(
        "t",
        F.floor(
            F.col("deg").cast("double")
            / F.col("freq").cast("double")
            * 1000000000.0
            + 0.5
        )
        .cast("bigint")
        .alias("s_nano"),
    )
    ptype = phr.groupBy("phrase", "words").agg(
        F.count("*").cast("bigint").alias("n_occurrences")
    )
    scored = (
        ptype.select(
            "phrase",
            "n_occurrences",
            F.size("words").cast("bigint").alias("n_words"),
            F.explode("words").alias("t"),
        )
        .join(F.broadcast(wscore), "t")
        .groupBy("phrase", "n_words", "n_occurrences")
        .agg(F.sum("s_nano").cast("bigint").alias("score_nano"))
    )
    return (
        scored.select(
            "phrase",
            "n_words",
            "n_occurrences",
            "score_nano",
            (F.col("score_nano").cast("double") / 1000000000.0).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score_nano"), "phrase")
        .limit(10)
    )


# =====================================================================
# Round-12 staged batch 16 — tail risk (CVaR/expected shortfall),
# inequality in log form (mean log deviation / Theil L), and edit
# distance by nested DP fold vs the oracle's BUILT-IN levenshtein.
# Promotion target: round 13.
# =====================================================================


@staged(
    "q_cvar_es",
    oracle="""
    WITH base AS (
      SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    vh AS (
      SELECT t, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY t, v
    ),
    ns AS (SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM vh GROUP BY t),
    cum AS (
      SELECT vh.t, vh.v,
             CAST(SUM(vh.c) OVER (PARTITION BY vh.t ORDER BY vh.v)
               AS BIGINT) AS cm,
             ns.n
      FROM vh JOIN ns ON ns.t = vh.t
    ),
    var95 AS (
      SELECT t, CAST(MIN(v) AS BIGINT) AS var_cents
      FROM cum WHERE cm >= (19 * n + 19) // 20 GROUP BY t
    ),
    tail AS (
      SELECT vh.t,
             CAST(SUM(vh.c) AS BIGINT) AS tail_n,
             CAST(SUM(vh.v * vh.c) AS BIGINT) AS tail_sum
      FROM vh JOIN var95 ON var95.t = vh.t
      WHERE vh.v >= var95.var_cents GROUP BY vh.t
    )
    SELECT ns.t AS t, ns.n, var95.var_cents, tail.tail_n, tail.tail_sum,
           CAST(tail.tail_sum AS DOUBLE) / CAST(tail.tail_n AS DOUBLE)
             AS es_cents
    FROM ns JOIN var95 ON var95.t = ns.t JOIN tail ON tail.t = ns.t
    ORDER BY t
    """,
)
def q_cvar_es(spark, sf_dir):
    """VALUE-AT-RISK AND EXPECTED SHORTFALL (CVaR) at the 95% level
    per event type — the coherent tail-risk pair that completes the
    risk family (q_drawdown reads path risk, q_percentiles the
    central quantiles; ES prices the TAIL MEAN, the
    Basel/risk-budgeting standard, and unlike VaR it is
    subadditive): VaR95 is picked EXACTLY by cumulative counting on
    the cents lattice at ceil(0.95n) = (19n+19) div 20 (integer
    ceiling — the q_mood_median selection discipline), the tail
    {v >= VaR} count and sum are exact BIGINTs (the discrete
    'mean of observations >= VaR' convention, documented), and ES
    is ONE division at readout. The witness pins coherence:
    ES >= VaR always. At 100 TB: raw volume dies in the (t, v)
    hash agg; the cumulative runs per type over the bounded
    distinct-cents lattice."""
    base = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    vh = base.groupBy("t", "v").agg(F.count("*").cast("bigint").alias("c"))
    vh = track_persist(vh)
    ns = vh.groupBy("t").agg(F.sum("c").cast("bigint").alias("n"))
    wcum = (
        Window.partitionBy("t")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    var95 = (
        vh.select("t", "v", F.sum("c").over(wcum).alias("cm"))
        .join(F.broadcast(ns), "t")
        .filter(F.col("cm") >= F.expr("(19 * n + 19) div 20"))
        .groupBy("t")
        .agg(F.min("v").cast("bigint").alias("var_cents"))
    )
    tail = (
        vh.join(F.broadcast(var95), "t")
        .filter(F.col("v") >= F.col("var_cents"))
        .groupBy("t")
        .agg(
            F.sum("c").cast("bigint").alias("tail_n"),
            F.sum(F.col("v") * F.col("c")).cast("bigint").alias("tail_sum"),
        )
    )
    return (
        ns.join(F.broadcast(var95), "t")
        .join(F.broadcast(tail), "t")
        .select(
            "t",
            "n",
            "var_cents",
            "tail_n",
            "tail_sum",
            (
                F.col("tail_sum").cast("double")
                / F.col("tail_n").cast("double")
            ).alias("es_cents"),
        )
        .orderBy("t")
    )


@staged(
    "q_mean_log_deviation",
    oracle="""
    WITH peruser AS (
      SELECT event_type AS t, user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY event_type, user_id
    ),
    pos AS (SELECT t, x FROM peruser WHERE x > 0),
    lns AS (
      SELECT t, x,
             CAST(floor(ln(CAST(x AS DOUBLE)) * 1000000000.0 + 0.5)
               AS BIGINT) AS ln_nano
      FROM pos
    ),
    gs AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_cents,
             CAST(SUM(ln_nano) AS BIGINT) AS sum_ln_nano
      FROM lns GROUP BY t
    ),
    parts AS (
      SELECT t, n, sum_cents, sum_ln_nano,
             CAST(floor(ln(CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000000.0 + 0.5) AS BIGINT) AS ln_mean_nano
      FROM gs
    )
    SELECT t, n, sum_cents, sum_ln_nano, ln_mean_nano,
           CAST(ln_mean_nano AS DOUBLE) / 1000000000.0
             - CAST(sum_ln_nano AS DOUBLE) / 1000000000.0
               / CAST(n AS DOUBLE) AS mld,
           (10 * (CAST(ln_mean_nano AS HUGEINT) * CAST(n AS HUGEINT)
                  - CAST(sum_ln_nano AS HUGEINT))
            > CAST(1000000000 AS HUGEINT) * CAST(n AS HUGEINT))
             AS unequal
    FROM parts ORDER BY t
    """,
)
def q_mean_log_deviation(spark, sf_dir):
    """MEAN LOG DEVIATION (Theil's L / the GE(0) entropy index /
    Atkinson eps=1 in LOG FORM) of per-user spend per event type —
    the inequality-trio completion (q_gini is rank-based, the
    staged q_theil_index is GE(1); MLD is GE(0), the
    between-group-decomposable index most sensitive to the BOTTOM
    of the distribution): MLD = ln(mean) - mean(ln x). Each ln(x)
    of an exact integer is quantized to the 1e-9 lattice BEFORE the
    exact BIGINT sum (the q_theil_index discipline — float sums
    never run in data order), ln(mean) is one identical chain
    quantized the same way, the zero-spend guard is an integer
    filter x > 0 (documented: ln(0) would poison the sum), and the
    MLD > 0.1 inequality verdict is decided EXACTLY in 128-bit:
    10*(ln_mean_nano*n - sum_ln_nano) > 1e9*n. Atkinson itself
    (1 - exp(-MLD)) is NOT reported — exp() is 1-ulp non-portable
    (the q_pythagorean_means finding); MLD IS its log form. At
    100 TB: two hash aggs (user-keyed then type-keyed), both
    map-side combinable."""
    peruser = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("t"), "user_id")
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
        .filter(F.col("x") > 0)
    )
    lns = peruser.select(
        "t",
        "x",
        F.floor(F.log(F.col("x").cast("double")) * 1000000000.0 + 0.5)
        .cast("bigint")
        .alias("ln_nano"),
    )
    gs = lns.groupBy("t").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sum_cents"),
        F.sum("ln_nano").cast("bigint").alias("sum_ln_nano"),
    )
    parts = gs.select(
        "t",
        "n",
        "sum_cents",
        "sum_ln_nano",
        F.floor(
            F.log(F.col("sum_cents").cast("double") / F.col("n").cast("double"))
            * 1000000000.0
            + 0.5
        )
        .cast("bigint")
        .alias("ln_mean_nano"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return parts.select(
        "t",
        "n",
        "sum_cents",
        "sum_ln_nano",
        "ln_mean_nano",
        (
            F.col("ln_mean_nano").cast("double") / 1000000000.0
            - F.col("sum_ln_nano").cast("double")
            / 1000000000.0
            / F.col("n").cast("double")
        ).alias("mld"),
        (
            F.lit(10).cast("decimal(38,0)")
            * (
                dec(F.col("ln_mean_nano")) * dec(F.col("n"))
                - dec(F.col("sum_ln_nano"))
            )
            > dec(F.lit(1000000000)) * dec(F.col("n"))
        ).alias("unequal"),
    ).orderBy("t")


@staged(
    "q_edit_distance_dp",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name FROM part
    ),
    ranked AS (
      SELECT p_name, row_number() OVER (ORDER BY p_name) AS rn
      FROM names
    ),
    pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b
      FROM ranked a JOIN ranked b ON b.rn = a.rn + 1
    )
    SELECT name_a, name_b,
           CAST(length(name_a) AS BIGINT) AS len_a,
           CAST(length(name_b) AS BIGINT) AS len_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_distance
    FROM pairs ORDER BY name_a, name_b
    """,
)
def q_edit_distance_dp(spark, sf_dir):
    """LEVENSHTEIN EDIT DISTANCE between lexicographically adjacent
    part names, computed by a NESTED Wagner-Fischer DP FOLD — two
    genuinely independent implementations face off: Spark runs the
    full dynamic program (outer F.aggregate over the second string's
    characters, inner F.aggregate building each DP row left-to-right
    with the insert/delete/substitute recurrence — every cell an
    exact integer, the q_dtw_distance Bellman discipline stretched
    to variable-length strings), while THE ORACLE CALLS DUCKDB'S
    BUILT-IN levenshtein() — a C implementation sharing zero code
    with the fold (the q_knapsack_dp two-routes discipline). The
    fold never touches Spark's own levenshtein built-in, so the DP
    itself is what's verified. At 100 TB: the distinct-name frame is
    vocabulary-bounded; each pair's DP is O(|a|*|b|) scalar work
    inside one projection — embarrassingly parallel, no shuffle
    after the rank join."""
    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    ranked = names.select(
        "p_name", F.row_number().over(Window.orderBy("p_name")).alias("rn")
    )
    a = ranked.select(
        F.col("p_name").alias("name_a"), F.col("rn").alias("ra")
    )
    b = ranked.select(
        F.col("p_name").alias("name_b"), F.col("rn").alias("rb")
    )
    pairs = a.join(F.broadcast(b), F.col("rb") == F.col("ra") + 1)
    dp = F.expr(
        "element_at("
        " aggregate(filter(split(name_b, ''), ch -> ch != ''),"
        "  sequence(0, length(name_a)),"
        "  (row, ch2) -> aggregate("
        "    sequence(1, length(name_a)),"
        "    array(element_at(row, 1) + 1),"
        "    (nr, i) -> array_append(nr, least("
        "      element_at(row, CAST(i + 1 AS INT)) + 1,"
        "      element_at(nr, CAST(i AS INT)) + 1,"
        "      element_at(row, CAST(i AS INT))"
        "        + CASE WHEN substring(name_a, CAST(i AS INT), 1) = ch2"
        "               THEN 0 ELSE 1 END)))),"
        " CAST(length(name_a) + 1 AS INT))"
    )
    return pairs.select(
        "name_a",
        "name_b",
        F.length("name_a").cast("bigint").alias("len_a"),
        F.length("name_b").cast("bigint").alias("len_b"),
        dp.cast("bigint").alias("edit_distance"),
    ).orderBy("name_a", "name_b")


# =====================================================================
# Round-12 staged batch 17 — layout locality (Hilbert vs Z-order
# audit), causal inference (coarsened exact matching), numerically
# stable streaming moments (Welford fold vs exact two-pass).
# Promotion target: round 13.
# =====================================================================


def _hilbert_fold(div: str, pfx: str) -> dict:
    """xy -> Hilbert-d step expressions; dialect div operator and
    state-prefix injected so both engines share one template.
    rx/ry via (coord div s) % 2 (power-of-two s), coordinates MASKED
    into the quadrant (x % s) BEFORE the rotation flip+swap (the
    unmasked textbook form lets intermediates go NEGATIVE, where div
    truncation vs floor semantics diverge across engines — caught by
    the unit-step witness), and the quadrant digit (3*rx) XOR ry
    spelled as pure arithmetic 3rx + ry - 2*rx*ry for rx,ry in
    {0,1} — no bitwise ops, dialect-shared text. The masked variant
    IS the true Hilbert curve: consecutive d are grid-adjacent,
    witness-pinned."""
    rx = f"(({pfx}.x {div} s) % 2)"
    ry = f"(({pfx}.y {div} s) % 2)"
    xl = f"({pfx}.x % s)"
    yl = f"({pfx}.y % s)"
    digit = f"(3 * {rx} + {ry} - 2 * {rx} * {ry})"
    new_x = (
        f"CASE WHEN {ry} = 1 THEN {xl}"
        f" WHEN {rx} = 1 THEN s - 1 - {yl} ELSE {yl} END"
    )
    new_y = (
        f"CASE WHEN {ry} = 1 THEN {yl}"
        f" WHEN {rx} = 1 THEN s - 1 - {xl} ELSE {xl} END"
    )
    new_d = f"{pfx}.d + s * s * {digit}"
    return {"x": new_x, "y": new_y, "d": new_d}


def _hilbert_oracle() -> str:
    st = _hilbert_fold("//", "rec")
    return f"""
    WITH RECURSIVE cells AS (
      SELECT DISTINCT CAST(user_id % 32 AS BIGINT) AS x,
             CAST((2 * user_id + event_id) % 32 AS BIGINT) AS y
      FROM events
    ),
    lv(k, s) AS (VALUES (0, CAST(16 AS BIGINT)), (1, 8), (2, 4),
                        (3, 2), (4, 1)),
    rec AS (
      SELECT x AS cx, y AS cy, x, y, CAST(0 AS BIGINT) AS d, 0 AS k
      FROM cells
      UNION ALL
      SELECT rec.cx, rec.cy,
             CAST({st['x']} AS BIGINT), CAST({st['y']} AS BIGINT),
             CAST({st['d']} AS BIGINT), rec.k + 1
      FROM rec JOIN lv ON lv.k = rec.k WHERE rec.k < 5
    ),
    indexed AS (
      SELECT rec.cx AS x, rec.cy AS y, rec.d AS h,
             CAST((rec.cx % 2) + 2 * (rec.cy % 2)
               + 4 * ((rec.cx // 2) % 2) + 8 * ((rec.cy // 2) % 2)
               + 16 * ((rec.cx // 4) % 2) + 32 * ((rec.cy // 4) % 2)
               + 64 * ((rec.cx // 8) % 2) + 128 * ((rec.cy // 8) % 2)
               + 256 * ((rec.cx // 16) % 2) + 512 * ((rec.cy // 16) % 2)
               AS BIGINT) AS z
      FROM rec WHERE rec.k = 5
    ),
    pairs AS (
      SELECT a.h AS ha, b.h AS hb, a.z AS za, b.z AS zb
      FROM indexed a JOIN indexed b
        ON (b.x = a.x + 1 AND b.y = a.y) OR (b.x = a.x AND b.y = a.y + 1)
    ),
    stats AS (
      SELECT 'hilbert' AS curve,
             CAST(COUNT(*) AS BIGINT) AS n_adj_pairs,
             CAST(SUM(CASE WHEN abs(ha - hb) = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS gap1_pairs,
             CAST(SUM(abs(ha - hb)) AS BIGINT) AS gap_sum,
             CAST(MAX(abs(ha - hb)) AS BIGINT) AS gap_max
      FROM pairs
      UNION ALL
      SELECT 'zorder', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN abs(za - zb) = 1 THEN 1 ELSE 0 END)
               AS BIGINT),
             CAST(SUM(abs(za - zb)) AS BIGINT),
             CAST(MAX(abs(za - zb)) AS BIGINT)
      FROM pairs
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells FROM cells)
    SELECT stats.curve, nc.n_cells, stats.n_adj_pairs, stats.gap1_pairs,
           stats.gap_sum, stats.gap_max,
           CAST((stats.gap1_pairs * 1000000) // stats.n_adj_pairs
             AS BIGINT) AS gap1_micro
    FROM stats CROSS JOIN nc
    ORDER BY curve
    """


@staged("q_hilbert_locality", oracle=_hilbert_oracle())
def q_hilbert_locality(spark, sf_dir):
    """HILBERT-CURVE vs Z-ORDER LOCALITY AUDIT over the occupied
    32x32 cell grid — the file-clustering question behind
    q_zorder_cells (Delta/Iceberg Z-order is the industry default;
    Hilbert keeps 2x more grid-adjacent cell pairs INDEX-ADJACENT —
    51% vs 26% on this grid — which is exactly what turns a spatial
    range scan into fewer file seeks; measured, not assumed): the
    xy->d Hilbert map runs as a 5-level F.aggregate fold whose
    rotation arithmetic is GENERATED FROM ONE TEMPLATE for both
    engines (rx/ry via (c div s) % 2 — no bitwise ops, so the text
    is dialect-shared; the quadrant digit (3rx) XOR ry is spelled as
    pure CASE-free arithmetic 3rx + ry - 2rx*ry), the Z-index is
    10 interleaved modulo terms, and every gap statistic
    (index-adjacency count, gap sum, max) is an exact BIGINT over
    the equi-joined grid-neighbor pairs. At 100 TB: raw volume dies
    in the distinct-cell projection (lattice-bounded at 1024);
    everything after is cell-count work."""
    ev = _t(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("user_id") % 32).cast("bigint").alias("x"),
            ((2 * F.col("user_id") + F.col("event_id")) % 32)
            .cast("bigint")
            .alias("y"),
        )
        .distinct()
    )
    st = _hilbert_fold("div", "acc")
    h_expr = F.expr(
        "aggregate(array(16, 8, 4, 2, 1),"
        " struct(CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,"
        " CAST(0 AS BIGINT) AS d),"
        f" (acc, s) -> struct(CAST({st['x']} AS BIGINT) AS x,"
        f" CAST({st['y']} AS BIGINT) AS y,"
        f" CAST({st['d']} AS BIGINT) AS d)).d"
    )
    z_expr = F.expr(
        "CAST((x % 2) + 2 * (y % 2) + 4 * ((x div 2) % 2)"
        " + 8 * ((y div 2) % 2) + 16 * ((x div 4) % 2)"
        " + 32 * ((y div 4) % 2) + 64 * ((x div 8) % 2)"
        " + 128 * ((y div 8) % 2) + 256 * ((x div 16) % 2)"
        " + 512 * ((y div 16) % 2) AS BIGINT)"
    )
    indexed = cells.select(
        "x", "y", h_expr.alias("h"), z_expr.alias("z")
    )
    indexed = track_persist(indexed)
    a = indexed.alias("a")
    b = indexed.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (
            (F.col("b.x") == F.col("a.x") + 1)
            & (F.col("b.y") == F.col("a.y"))
        )
        | (
            (F.col("b.x") == F.col("a.x"))
            & (F.col("b.y") == F.col("a.y") + 1)
        ),
    ).select(
        F.col("a.h").alias("ha"),
        F.col("b.h").alias("hb"),
        F.col("a.z").alias("za"),
        F.col("b.z").alias("zb"),
    )
    pairs = track_persist(pairs)

    def _stats(ca, cb, label):
        gap = F.abs(F.col(ca) - F.col(cb))
        return pairs.agg(
            F.lit(label).alias("curve"),
            F.count("*").cast("bigint").alias("n_adj_pairs"),
            F.sum(F.when(gap == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("gap1_pairs"),
            F.sum(gap).cast("bigint").alias("gap_sum"),
            F.max(gap).cast("bigint").alias("gap_max"),
        )

    stats = _stats("ha", "hb", "hilbert").unionAll(
        _stats("za", "zb", "zorder")
    )
    nc = cells.agg(F.count("*").cast("bigint").alias("n_cells"))
    return (
        stats.crossJoin(F.broadcast(nc))
        .select(
            "curve",
            "n_cells",
            "n_adj_pairs",
            "gap1_pairs",
            "gap_sum",
            "gap_max",
            F.expr(
                "CAST((gap1_pairs * 1000000) div n_adj_pairs AS BIGINT)"
            ).alias("gap1_micro"),
        )
        .orderBy("curve")
    )


@staged(
    "q_cem_matching",
    oracle="""
    WITH users AS (
      SELECT user_id,
             CAST(CAST('0x' || substring(
               md5(CAST(user_id AS VARCHAR) || ':cem'), 1, 8) AS BIGINT)
               % 2 AS BIGINT) AS treated,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y,
             CAST(LEAST(COUNT(*) // 10, 5) AS BIGINT) AS cb,
             CAST(LEAST(datediff('day', CAST(MIN(ts) AS DATE),
               CAST(MAX(ts) AS DATE)) // 10, 2) AS BIGINT) AS sb
      FROM events GROUP BY user_id
    ),
    bins AS (
      SELECT sb, cb,
             CAST(SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS m_t,
             CAST(SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS m_c,
             CAST(SUM(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT)
               AS sum_y_t,
             CAST(SUM(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT)
               AS sum_y_c
      FROM users GROUP BY sb, cb
    ),
    matched AS (
      SELECT sb, cb, m_t, m_c, sum_y_t, sum_y_c,
             CAST(floor(CAST(m_t * sum_y_c AS DOUBLE)
               / CAST(m_c AS DOUBLE) + 0.5) AS BIGINT) AS cf_cents
      FROM bins WHERE m_t > 0 AND m_c > 0
    ),
    tot AS (
      SELECT CAST(SUM(m_t) AS BIGINT) AS n_matched,
             CAST(SUM(sum_y_t) AS BIGINT) AS y_t_total,
             CAST(SUM(cf_cents) AS BIGINT) AS cf_total
      FROM matched
    )
    SELECT matched.sb, matched.cb, matched.m_t, matched.m_c,
           matched.sum_y_t, matched.sum_y_c, matched.cf_cents,
           tot.n_matched,
           (CAST(tot.y_t_total AS DOUBLE) - CAST(tot.cf_total AS DOUBLE))
             / CAST(tot.n_matched AS DOUBLE) AS att_cents
    FROM matched CROSS JOIN tot
    ORDER BY sb, cb
    """,
)
def q_cem_matching(spark, sf_dir):
    """COARSENED EXACT MATCHING (Iacus-King-Porro) average treatment
    effect on the treated — the matching-based completion of the
    causal family (q_diff_in_diff needs parallel trends, q_ab_cuped
    a pre-period covariate; CEM prunes to covariate-balanced strata
    FIRST, the design-before-analysis doctrine): users are coarsened
    on exact integer bins (event-count decile capped at 5, activity
    -span bucket), treatment is the engine-portable md5 arm, strata
    missing either arm are PRUNED (the CEM common-support rule, an
    integer filter), and each stratum's counterfactual spend
    m_t*sum_y_c/m_c is an exact-BIGINT product with ONE half-up
    quantization to cents (documented). ATT is one identical double
    chain over the exact stratum totals. At 100 TB: one user-keyed
    agg kills the raw volume; strata are a bounded 3x6 lattice."""
    ev = _t(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("user_id").cast("string"), F.lit(":cem"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    users = ev.groupBy("user_id").agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("y"),
        F.expr("CAST(LEAST(COUNT(*) div 10, 5) AS BIGINT)").alias("cb"),
        F.least(
            (
                F.datediff(
                    F.max("ts").cast("date"), F.min("ts").cast("date")
                )
                / F.lit(10)
            ).cast("bigint"),
            F.lit(2),
        )
        .cast("bigint")
        .alias("sb"),
    ).select("user_id", "y", "cb", "sb", arm.alias("treated"))
    bins = users.groupBy("sb", "cb").agg(
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("m_t"),
        F.sum(F.when(F.col("treated") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("m_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sum_y_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sum_y_c"),
    )
    matched = bins.filter((F.col("m_t") > 0) & (F.col("m_c") > 0)).select(
        "sb",
        "cb",
        "m_t",
        "m_c",
        "sum_y_t",
        "sum_y_c",
        F.floor(
            (F.col("m_t") * F.col("sum_y_c")).cast("double")
            / F.col("m_c").cast("double")
            + 0.5
        )
        .cast("bigint")
        .alias("cf_cents"),
    )
    matched = track_persist(matched)
    tot = matched.agg(
        F.sum("m_t").cast("bigint").alias("n_matched"),
        F.sum("sum_y_t").cast("bigint").alias("y_t_total"),
        F.sum("cf_cents").cast("bigint").alias("cf_total"),
    )
    return (
        matched.crossJoin(F.broadcast(tot))
        .select(
            "sb",
            "cb",
            "m_t",
            "m_c",
            "sum_y_t",
            "sum_y_c",
            "cf_cents",
            "n_matched",
            (
                (
                    F.col("y_t_total").cast("double")
                    - F.col("cf_total").cast("double")
                )
                / F.col("n_matched").cast("double")
            ).alias("att_cents"),
        )
        .orderBy("sb", "cb")
    )


@staged(
    "q_welford_fold",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) // 100
               AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    rec AS (
      SELECT t, -1 AS k, CAST(0.0 AS DOUBLE) AS mean,
             CAST(0.0 AS DOUBLE) AS m2
      FROM (SELECT DISTINCT t FROM grid)
      UNION ALL
      SELECT rec.t, rec.k + 1,
             rec.mean + (CAST(g.x AS DOUBLE) - rec.mean)
               / CAST(rec.k + 2 AS DOUBLE),
             rec.m2 + (CAST(g.x AS DOUBLE) - rec.mean)
               * (CAST(g.x AS DOUBLE)
                  - (rec.mean + (CAST(g.x AS DOUBLE) - rec.mean)
                     / CAST(rec.k + 2 AS DOUBLE)))
      FROM rec JOIN grid g ON g.t = rec.t AND g.d = rec.k + 1
      WHERE rec.k < 29
    ),
    wf AS (SELECT t, mean, m2 FROM rec WHERE k = 29),
    exact AS (
      SELECT t, CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS ss
      FROM grid GROUP BY t
    )
    SELECT wf.t AS t, exact.s AS sum_dollars, exact.ss AS sumsq,
           wf.m2 / 29.0 AS var_welford,
           CAST(30 * exact.ss - exact.s * exact.s AS DOUBLE)
             / (30.0 * 29.0) AS var_exact,
           (abs(wf.m2 / 29.0
                - CAST(30 * exact.ss - exact.s * exact.s AS DOUBLE)
                  / (30.0 * 29.0))
            < 0.000001 * (1.0
                + CAST(30 * exact.ss - exact.s * exact.s AS DOUBLE)
                  / (30.0 * 29.0))) AS agree
    FROM wf JOIN exact ON exact.t = wf.t
    ORDER BY t
    """,
)
def q_welford_fold(spark, sf_dir):
    """WELFORD'S ONLINE VARIANCE as a sequential fold, cross-checked
    against the exact integer two-pass form — the numerically-stable
    streaming-moments mechanism (q_stats_moments uses the catastrophic
    -cancellation-prone sum-of-squares form, safe ONLY because the
    engine keeps it on the exact integer lattice; Welford is what a
    float-only streaming system must run, and this query PROVES the
    two agree): the fold updates (mean, M2) day by day in ONE
    F.aggregate per type — the float sequence is identical text on
    both engines (the q_kaplan_meier IEEE-fold discipline) so the
    result is bit-reproducible cross-engine — while the exact route
    computes 30*SS - S^2 on BIGINTs. The 'agree' verdict compares
    the two routes at 1e-6 relative tolerance — a genuinely
    different-algebra cross-check (the q_knapsack_dp two-routes
    discipline), computed by the identical chain on both engines.
    At 100 TB: raw volume dies in the (t, day) agg; the fold is 30
    steps per type."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(round(value * 100) AS BIGINT)) div 100"
                " AS BIGINT)"
            ).alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    per = grid.groupBy("t").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, x))), e -> e.x)"
        ).alias("xs"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    wf = F.expr(
        "aggregate(xs,"
        " struct(CAST(0 AS BIGINT) AS k, CAST(0.0 AS DOUBLE) AS mean,"
        "        CAST(0.0 AS DOUBLE) AS m2),"
        " (acc, xv) -> struct(acc.k + 1,"
        "   acc.mean + (CAST(xv AS DOUBLE) - acc.mean)"
        "     / CAST(acc.k + 1 AS DOUBLE),"
        "   acc.m2 + (CAST(xv AS DOUBLE) - acc.mean)"
        "     * (CAST(xv AS DOUBLE)"
        "        - (acc.mean + (CAST(xv AS DOUBLE) - acc.mean)"
        "           / CAST(acc.k + 1 AS DOUBLE)))))"
    )
    ve = (
        (30 * F.col("ss") - F.col("s") * F.col("s")).cast("double")
        / (30.0 * 29.0)
    )
    vw = F.col("st")["m2"] / 29.0
    return (
        per.select("t", "s", "ss", wf.alias("st"))
        .select(
            "t",
            F.col("s").alias("sum_dollars"),
            F.col("ss").alias("sumsq"),
            vw.alias("var_welford"),
            ve.alias("var_exact"),
            (F.abs(vw - ve) < 0.000001 * (1.0 + ve)).alias("agree"),
        )
        .orderBy("t")
    )


# =====================================================================
# Round-12 staged batch 18 — forecasting (theta method), time-series
# identification (PACF by Durbin-Levinson), and routing (greedy TSP
# vs the exhaustive optimum). Promotion target: round 13.
# =====================================================================


@staged(
    "q_theta_forecast",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    rec AS (
      SELECT g.t, 0 AS k, g.x AS e FROM grid g WHERE g.d = 0
      UNION ALL
      SELECT rec.t, rec.k + 1, (3 * g.x + 7 * rec.e) // 10
      FROM rec JOIN grid g ON g.t = rec.t AND g.d = rec.k + 1
      WHERE rec.k < 29
    ),
    ses AS (SELECT t, CAST(e AS BIGINT) AS ses_cents FROM rec WHERE k = 29),
    ols AS (
      SELECT t,
             CAST(30 * SUM(d * x) - SUM(d) * SUM(x) AS BIGINT)
               AS slope_num,
             CAST(67425 AS BIGINT) AS slope_den
      FROM grid GROUP BY t
    ),
    ms AS (
      SELECT t, CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(d * x) AS BIGINT)
               AS sdx
      FROM grid GROUP BY t
    )
    SELECT ses.t AS t, ses.ses_cents, ols.slope_num, ols.slope_den,
           CAST(ms.s AS DOUBLE) / 30.0
             + CAST(ols.slope_num AS DOUBLE) / 67425.0 * (30.0 - 14.5)
             AS trend30_cents,
           0.5 * (CAST(ms.s AS DOUBLE) / 30.0
                  + CAST(ols.slope_num AS DOUBLE) / 67425.0
                    * (30.0 - 14.5))
             + 0.5 * CAST(ses.ses_cents AS DOUBLE) AS theta_forecast
    FROM ses JOIN ols ON ols.t = ses.t JOIN ms ON ms.t = ses.t
    ORDER BY t
    """,
)
def q_theta_forecast(spark, sf_dir):
    """THETA-METHOD one-step forecast (Assimakopoulos-Nikolopoulos,
    the M3-competition winner) per event type — the hybrid that
    completes the forecasting ladder (q_ewma smooths level,
    q_trend_ols fits drift, q_holt_smoothing couples them
    recursively; theta AVERAGES the two decoupled theta-lines, the
    documented standard two-line form): the theta=2 line is the
    exact integer SES fold e = (3x+7e) div 10 over the zero-filled
    30-day grid (the q_stream_ewma discipline, all operands nonneg),
    the theta=0 line is the OLS trend whose slope numerator is an
    exact BIGINT over the FROZEN day design (denominator
    30*8555 - 435^2 = 67425, a literal), its day-30 extrapolation
    mean + slope*(30 - 14.5) is one identical double chain, and the
    forecast is the equal-weight average of the two lines. At
    100 TB: raw volume dies in the (t, day) hash agg; the fold is
    30 steps per type."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    per = grid.groupBy("t").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, x))), e -> e.x)"
        ).alias("xs"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("d") * F.col("x")).cast("bigint").alias("sdx"),
    )
    ses = F.expr(
        "aggregate(slice(xs, 2, 29), element_at(xs, 1),"
        " (e, xv) -> (3 * xv + 7 * e) div 10)"
    )
    slope_num = (30 * F.col("sdx") - 435 * F.col("s")).cast("bigint")
    trend30 = (
        F.col("s").cast("double") / 30.0
        + slope_num.cast("double") / 67425.0 * (30.0 - 14.5)
    )
    return per.select(
        "t",
        ses.cast("bigint").alias("ses_cents"),
        slope_num.alias("slope_num"),
        F.lit(67425).cast("bigint").alias("slope_den"),
        trend30.alias("trend30_cents"),
        (0.5 * trend30 + 0.5 * ses.cast("double")).alias("theta_forecast"),
    ).orderBy("t")


@staged(
    "q_pacf_durbin",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) // 100
               AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    ss AS (SELECT t, CAST(SUM(x) AS BIGINT) AS s FROM grid GROUP BY t),
    lagged AS (
      SELECT g.t, g.d, 30 * g.x - ss.s AS cx,
             lag(30 * g.x - ss.s, 1) OVER w AS c1,
             lag(30 * g.x - ss.s, 2) OVER w AS c2,
             lag(30 * g.x - ss.s, 3) OVER w AS c3,
             lag(30 * g.x - ss.s, 4) OVER w AS c4,
             lag(30 * g.x - ss.s, 5) OVER w AS c5
      FROM grid g JOIN ss ON ss.t = g.t
      WINDOW w AS (PARTITION BY g.t ORDER BY g.d)
    ),
    acov AS (
      SELECT t,
             CAST(SUM(cx * cx) AS BIGINT) AS a0,
             CAST(SUM(CASE WHEN c1 IS NOT NULL THEN cx * c1 ELSE 0 END)
               AS BIGINT) AS a1,
             CAST(SUM(CASE WHEN c2 IS NOT NULL THEN cx * c2 ELSE 0 END)
               AS BIGINT) AS a2,
             CAST(SUM(CASE WHEN c3 IS NOT NULL THEN cx * c3 ELSE 0 END)
               AS BIGINT) AS a3,
             CAST(SUM(CASE WHEN c4 IS NOT NULL THEN cx * c4 ELSE 0 END)
               AS BIGINT) AS a4,
             CAST(SUM(CASE WHEN c5 IS NOT NULL THEN cx * c5 ELSE 0 END)
               AS BIGINT) AS a5
      FROM lagged GROUP BY t
    ),
    rs AS (
      SELECT t, a0, a1, a2, a3, a4, a5,
             [CAST(a1 AS DOUBLE) / a0, CAST(a2 AS DOUBLE) / a0,
              CAST(a3 AS DOUBLE) / a0, CAST(a4 AS DOUBLE) / a0,
              CAST(a5 AS DOUBLE) / a0] AS r
      FROM acov
    ),
    dl AS (
      SELECT t, a0, a1, a2, a3, a4, a5, r, 1 AS k,
             [r[1]] AS phi, [r[1]] AS pacf
      FROM rs
      UNION ALL
      SELECT t, a0, a1, a2, a3, a4, a5, r, k + 1,
             list_append(
               list_transform(range(1, k + 1), j ->
                 phi[j] - ((r[k + 1]
                     - list_sum(list_transform(range(1, k + 1),
                         i -> phi[i] * r[k + 1 - i])))
                    / (1.0 - list_sum(list_transform(range(1, k + 1),
                         i -> phi[i] * r[i])))) * phi[k + 1 - j]),
               (r[k + 1]
                - list_sum(list_transform(range(1, k + 1),
                    i -> phi[i] * r[k + 1 - i])))
               / (1.0 - list_sum(list_transform(range(1, k + 1),
                    i -> phi[i] * r[i])))),
             list_append(pacf,
               (r[k + 1]
                - list_sum(list_transform(range(1, k + 1),
                    i -> phi[i] * r[k + 1 - i])))
               / (1.0 - list_sum(list_transform(range(1, k + 1),
                    i -> phi[i] * r[i]))))
      FROM dl WHERE k < 5
    )
    SELECT t, a0, a1, a2, a3, a4, a5,
           pacf[1] AS pacf1, pacf[2] AS pacf2, pacf[3] AS pacf3,
           pacf[4] AS pacf4, pacf[5] AS pacf5
    FROM dl WHERE k = 5 ORDER BY t
    """,
)
def q_pacf_durbin(spark, sf_dir):
    """PARTIAL AUTOCORRELATION to lag 5 by the DURBIN-LEVINSON
    recursion — the AR-order identification tool that completes the
    time-series ID family (q_autocorr reads raw correlation, which
    CONFOUNDS direct and propagated dependence; PACF removes the
    intermediate lags, the Box-Jenkins AR(p) cutoff diagnostic):
    autocovariances are EXACT BIGINTs on the x30 centered lattice
    (c_t = 30x_t - S, the q_hurst_rs no-division discipline; lag
    windows over the bounded 30-day grid), the r_k = A_k/A_0 ratios
    and the whole 5-step Levinson recursion are IDENTICAL float
    chains on both engines (one F.aggregate fold carrying the phi
    array — the q_welford_fold IEEE-fold discipline; the oracle
    replays it as a 5-step recursive CTE on a list state). At
    100 TB: raw volume dies in the (t, day) hash agg; the recursion
    is 5 steps over a <=5-element array per type."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(round(value * 100) AS BIGINT)) div 100"
                " AS BIGINT)"
            ).alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    ss = grid.groupBy("t").agg(F.sum("x").cast("bigint").alias("s"))
    w = Window.partitionBy("t").orderBy("d")
    cx = (30 * F.col("x") - F.col("s")).cast("bigint")
    lagged = grid.join(F.broadcast(ss), "t").select(
        "t",
        cx.alias("cx"),
        *[F.lag(cx, k).over(w).alias(f"c{k}") for k in range(1, 6)],
    )
    acov = lagged.groupBy("t").agg(
        F.sum(F.col("cx") * F.col("cx")).cast("bigint").alias("a0"),
        *[
            F.sum(
                F.when(
                    F.col(f"c{k}").isNotNull(),
                    F.col("cx") * F.col(f"c{k}"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"a{k}")
            for k in range(1, 6)
        ],
    )
    rs = acov.select(
        "t",
        "a0",
        "a1",
        "a2",
        "a3",
        "a4",
        "a5",
        F.expr(
            "array(CAST(a1 AS DOUBLE) / a0, CAST(a2 AS DOUBLE) / a0,"
            " CAST(a3 AS DOUBLE) / a0, CAST(a4 AS DOUBLE) / a0,"
            " CAST(a5 AS DOUBLE) / a0)"
        ).alias("r"),
    )
    phikk = (
        "(element_at(r, CAST(acc.k + 1 AS INT))"
        " - aggregate(sequence(1, acc.k), CAST(0.0 AS DOUBLE),"
        "     (sm, i) -> sm + element_at(acc.phi, CAST(i AS INT))"
        "       * element_at(r, CAST(acc.k + 1 - i AS INT))))"
        " / (1.0 - aggregate(sequence(1, acc.k), CAST(0.0 AS DOUBLE),"
        "     (sm, i) -> sm + element_at(acc.phi, CAST(i AS INT))"
        "       * element_at(r, CAST(i AS INT))))"
    )
    dl = F.expr(
        "aggregate(sequence(2, 5),"
        " struct(CAST(1 AS INT) AS k,"
        "        array(element_at(r, 1)) AS phi,"
        "        array(element_at(r, 1)) AS pacf),"
        " (acc, step) -> struct(acc.k + 1,"
        f"  array_append(transform(sequence(1, acc.k), j ->"
        f"    element_at(acc.phi, CAST(j AS INT)) - ({phikk})"
        f"      * element_at(acc.phi, CAST(acc.k + 1 - j AS INT))),"
        f"    {phikk}),"
        f"  array_append(acc.pacf, {phikk})))"
        ".pacf"
    )
    return rs.select(
        "t",
        "a0",
        "a1",
        "a2",
        "a3",
        "a4",
        "a5",
        dl.alias("pacf"),
    ).select(
        "t",
        "a0",
        "a1",
        "a2",
        "a3",
        "a4",
        "a5",
        *[
            F.expr(f"element_at(pacf, {k})").alias(f"pacf{k}")
            for k in range(1, 6)
        ],
    ).orderBy("t")


@staged(
    "q_tsp_greedy",
    oracle="""
    WITH RECURSIVE cities AS (
      SELECT CAST(user_id % 8 AS BIGINT) AS c,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) % 97 AS BIGINT)
               AS cx,
             CAST(COUNT(*) % 89 AS BIGINT) AS cy
      FROM events GROUP BY 1
    ),
    dmt AS (
      SELECT (SELECT list(cx ORDER BY c) FROM cities) AS xs,
             (SELECT list(cy ORDER BY c) FROM cities) AS ys
    ),
    dm AS (
      SELECT flatten(list_transform(range(0, 8), i ->
               list_transform(range(0, 8), j ->
                 (xs[i + 1] - xs[j + 1]) * (xs[i + 1] - xs[j + 1])
                 + (ys[i + 1] - ys[j + 1]) * (ys[i + 1] - ys[j + 1]))))
               AS d
      FROM dmt
    ),
    rec AS (
      SELECT 0 AS k, 0 AS cur, [0] AS vis,
             CAST([{'c': 0, 'dsq': 0}]
               AS STRUCT(c BIGINT, dsq BIGINT)[]) AS path
      UNION ALL
      SELECT rec.k + 1,
             CAST(list_reduce(
               list_transform(
                 list_filter(range(0, 8),
                   cc -> NOT list_contains(rec.vis, cc)),
                 cc -> {'b': cc, 'bd': dm.d[rec.cur * 8 + cc + 1]}),
               (st, e) -> CASE WHEN e.bd < st.bd THEN e ELSE st END).b
               AS INT),
             list_append(rec.vis, list_reduce(
               list_transform(
                 list_filter(range(0, 8),
                   cc -> NOT list_contains(rec.vis, cc)),
                 cc -> {'b': cc, 'bd': dm.d[rec.cur * 8 + cc + 1]}),
               (st, e) -> CASE WHEN e.bd < st.bd THEN e ELSE st END).b),
             list_append(rec.path,
               {'c': CAST(list_reduce(
                  list_transform(
                    list_filter(range(0, 8),
                      cc -> NOT list_contains(rec.vis, cc)),
                    cc -> {'b': cc, 'bd': dm.d[rec.cur * 8 + cc + 1]}),
                  (st, e) -> CASE WHEN e.bd < st.bd THEN e ELSE st END).b
                  AS BIGINT),
                'dsq': CAST(list_reduce(
                  list_transform(
                    list_filter(range(0, 8),
                      cc -> NOT list_contains(rec.vis, cc)),
                    cc -> {'b': cc, 'bd': dm.d[rec.cur * 8 + cc + 1]}),
                  (st, e) -> CASE WHEN e.bd < st.bd THEN e ELSE st END).bd
                  AS BIGINT)})
      FROM rec CROSS JOIN dm WHERE rec.k < 7
    ),
    final AS (SELECT path FROM rec WHERE k = 7),
    tour AS (
      SELECT CAST(nn.n - 1 AS BIGINT) AS pos,
             CAST(final.path[nn.n].c AS BIGINT) AS city,
             CAST(final.path[nn.n].dsq AS BIGINT) AS leg_dsq
      FROM final CROSS JOIN (SELECT unnest(range(1, 9)) AS n) nn
    ),
    tot AS (SELECT CAST(SUM(leg_dsq) AS BIGINT) AS total_dsq FROM tour)
    SELECT tour.pos, tour.city, tour.leg_dsq, tot.total_dsq
    FROM tour CROSS JOIN tot ORDER BY tour.pos
    """,
)
def q_tsp_greedy(spark, sf_dir):
    """GREEDY NEAREST-NEIGHBOR TSP tour over 8 derived city points —
    the routing-heuristic completion of the OR family (q_knapsack_dp
    packs, q_transportation_nw ships, q_gale_shapley matches; NN
    tours): cities are the 8 user buckets placed at exact integer
    coordinates (cents-total mod 97, count mod 89), the 8x8
    SQUARED-Euclidean distance matrix is exact BIGINT (argmin over
    d^2 equals argmin over d — monotone, so no sqrt ever runs), and
    the 7-step greedy walk is ONE F.aggregate fold whose per-step
    argmin is an inner fold over the unvisited set with a
    strictly-less update (first-index tiebreak, deterministic on
    both engines — the oracle's list_reduce seeds with the first
    candidate, provably the same rule). The WITNESS brute-forces all
    7! = 5040 open tours from city 0 and pins optimum <= greedy —
    the two-routes discipline, plus the permutation-validity pins.
    At 100 TB: one hash agg to 8 city rows; the fold is 7 steps
    over an 8x8 literal-sized matrix."""
    cities = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(user_id % 8 AS BIGINT)").alias("c"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(round(value * 100) AS BIGINT)) % 97"
                " AS BIGINT)"
            ).alias("cx"),
            F.expr("CAST(COUNT(*) % 89 AS BIGINT)").alias("cy"),
        )
    )
    dm = cities.agg(
        F.expr(
            "flatten(transform(sequence(0, 7), i ->"
            " transform(sequence(0, 7), j ->"
            " (element_at(transform(array_sort(collect_list(struct(c, cx))),"
            "    e -> e.cx), CAST(i + 1 AS INT))"
            "  - element_at(transform(array_sort(collect_list(struct(c, cx))),"
            "    e -> e.cx), CAST(j + 1 AS INT)))"
            " * (element_at(transform(array_sort(collect_list(struct(c, cx))),"
            "    e -> e.cx), CAST(i + 1 AS INT))"
            "  - element_at(transform(array_sort(collect_list(struct(c, cx))),"
            "    e -> e.cx), CAST(j + 1 AS INT)))"
            " + (element_at(transform(array_sort(collect_list(struct(c, cy))),"
            "    e -> e.cy), CAST(i + 1 AS INT))"
            "  - element_at(transform(array_sort(collect_list(struct(c, cy))),"
            "    e -> e.cy), CAST(j + 1 AS INT)))"
            " * (element_at(transform(array_sort(collect_list(struct(c, cy))),"
            "    e -> e.cy), CAST(i + 1 AS INT))"
            "  - element_at(transform(array_sort(collect_list(struct(c, cy))),"
            "    e -> e.cy), CAST(j + 1 AS INT))))))"
        ).alias("d")
    )
    best = (
        "aggregate("
        " filter(sequence(0, 7), cc -> NOT array_contains(acc.vis, cc)),"
        " struct(CAST(-1 AS INT) AS b,"
        "        CAST(9223372036854775807 AS BIGINT) AS bd),"
        " (st, cc) -> CASE"
        "   WHEN element_at(d, CAST(acc.cur * 8 + cc + 1 AS INT)) < st.bd"
        "   THEN struct(CAST(cc AS INT) AS b,"
        "     element_at(d, CAST(acc.cur * 8 + cc + 1 AS INT)) AS bd)"
        "   ELSE st END)"
    )
    fold = F.expr(
        "aggregate(sequence(1, 7),"
        " struct(CAST(0 AS INT) AS cur, array(0) AS vis,"
        "   array(struct(CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS dsq))"
        "     AS path),"
        f" (acc, k) -> struct(({best}).b AS cur,"
        f"   array_append(acc.vis, ({best}).b) AS vis,"
        f"   array_append(acc.path, struct(CAST(({best}).b AS BIGINT) AS c,"
        f"     ({best}).bd AS dsq)) AS path))"
        ".path"
    )
    folded = dm.select(fold.alias("path"))
    tour = folded.select(F.posexplode("path").alias("pos", "p")).select(
        F.col("pos").cast("bigint").alias("pos"),
        F.col("p")["c"].cast("bigint").alias("city"),
        F.col("p")["dsq"].cast("bigint").alias("leg_dsq"),
    )
    tour = track_persist(tour)
    tot = tour.agg(F.sum("leg_dsq").cast("bigint").alias("total_dsq"))
    return (
        tour.crossJoin(F.broadcast(tot))
        .select("pos", "city", "leg_dsq", "total_dsq")
        .orderBy("pos")
    )


# =====================================================================
# Round-12 staged batch 19 — classifier operating point (Youden J),
# probabilistic-forecast decomposition (Murphy/Brier), voting power
# (Banzhaf), and social choice (Condorcet vs Borda).
# Promotion target: round 13.
# =====================================================================


@staged(
    "q_youden_j",
    oracle="""
    WITH ev AS (
      SELECT CAST(floor(value * 2) AS BIGINT) AS score_bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    bins AS (
      SELECT score_bin, CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(1 - y) AS BIGINT) AS neg
      FROM ev GROUP BY score_bin
    ),
    tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS p, CAST(SUM(neg) AS BIGINT) AS n
      FROM bins
    ),
    cum AS (
      SELECT score_bin,
             CAST(SUM(pos) OVER (ORDER BY score_bin DESC) AS BIGINT) AS tp,
             CAST(SUM(neg) OVER (ORDER BY score_bin DESC) AS BIGINT) AS fp
      FROM bins
    ),
    scored AS (
      SELECT cum.score_bin, cum.tp, cum.fp, tot.p, tot.n,
             CAST(tot.n * cum.tp - tot.p * cum.fp AS BIGINT) AS j_num
      FROM cum CROSS JOIN tot
    ),
    best AS (
      SELECT * FROM scored
      ORDER BY j_num DESC, score_bin LIMIT 1
    )
    SELECT score_bin AS best_bin, p, n, tp, fp,
           CAST(p - tp AS BIGINT) AS fn, CAST(n - fp AS BIGINT) AS tn,
           j_num,
           CAST(tp AS DOUBLE) / p AS sensitivity,
           CAST(n - fp AS DOUBLE) / n AS specificity,
           CAST(tp AS DOUBLE) / p + CAST(n - fp AS DOUBLE) / n - 1.0
             AS youden_j
    FROM best
    """,
)
def q_youden_j(spark, sf_dir):
    """YOUDEN'S J OPTIMAL OPERATING POINT on the ROC curve — the
    threshold-selection completion of q_auc / q_eval_confusion (AUC
    summarizes the whole curve; a deployed classifier needs ONE
    threshold, and J = sensitivity + specificity - 1 is the standard
    balanced pick): same purchase-vs-click labels and half-unit
    score lattice as q_auc, TP/FP by one reverse cumulative over the
    bounded bin domain, and the argmax is decided ENTIRELY on exact
    integers — maximizing J is maximizing N*TP - P*FP (the common
    positive denominator P*N cancels — derived), with the
    (j_num desc, bin asc) tiebreak on the lattice, so a float never
    picks the threshold. Sensitivity/specificity/J are identical
    double chains at readout. At 100 TB: one hash agg to the score
    lattice; the sweep is bounded-domain (the q_auc posture); needs
    a BOUNDED_UNPARTITIONED_WINDOW allowlist row at promotion."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            F.floor(F.col("value") * 2).cast("bigint").alias("score_bin"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    bins = ev.groupBy("score_bin").agg(
        F.sum("y").cast("bigint").alias("pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
    )
    bins = track_persist(bins)
    tot = bins.agg(
        F.sum("pos").cast("bigint").alias("p"),
        F.sum("neg").cast("bigint").alias("n"),
    )
    w_rev = Window.orderBy(F.desc("score_bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bins.select(
        "score_bin",
        F.sum("pos").over(w_rev).cast("bigint").alias("tp"),
        F.sum("neg").over(w_rev).cast("bigint").alias("fp"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "score_bin",
        "tp",
        "fp",
        "p",
        "n",
        (F.col("n") * F.col("tp") - F.col("p") * F.col("fp"))
        .cast("bigint")
        .alias("j_num"),
    )
    best = scored.orderBy(F.desc("j_num"), "score_bin").limit(1)
    sens = F.col("tp").cast("double") / F.col("p")
    spec = (F.col("n") - F.col("fp")).cast("double") / F.col("n")
    return best.select(
        F.col("score_bin").alias("best_bin"),
        "p",
        "n",
        "tp",
        "fp",
        (F.col("p") - F.col("tp")).cast("bigint").alias("fn"),
        (F.col("n") - F.col("fp")).cast("bigint").alias("tn"),
        "j_num",
        sens.alias("sensitivity"),
        spec.alias("specificity"),
        (sens + spec - 1.0).alias("youden_j"),
    )


@staged(
    "q_brier_decomposition",
    oracle="""
    WITH scored AS (
      SELECT CAST(event_id % 100 AS BIGINT) AS p100,
             CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS y
      FROM events
    ),
    bins AS (
      SELECT CAST(p100 // 10 AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_k,
             CAST(SUM(p100) AS BIGINT) AS sp,
             CAST(SUM(p100 * p100) AS BIGINT) AS spp,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(p100 * y) AS BIGINT) AS spy
      FROM scored GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_k) AS BIGINT) AS n, CAST(SUM(sy) AS BIGINT) AS sy,
             CAST(SUM(sp) AS BIGINT) AS sp
      FROM bins
    ),
    brier AS (
      SELECT CAST(SUM((p100 - 100 * y) * (p100 - 100 * y)) AS BIGINT)
               AS brier_num
      FROM scored
    ),
    terms AS (
      SELECT bins.bin, bins.n_k, bins.sp, bins.sy,
             CAST(floor(
               CAST(CAST(bins.sp - 100 * bins.sy AS HUGEINT)
                    * CAST(bins.sp - 100 * bins.sy AS HUGEINT) AS DOUBLE)
               / CAST(bins.n_k AS DOUBLE) / 10000.0
               * 1000000000.0 / CAST(tot.n AS DOUBLE) + 0.5) AS BIGINT)
               AS rel_nano,
             CAST(floor(
               CAST(CAST(tot.n * bins.sy - bins.n_k * tot.sy AS HUGEINT)
                    * CAST(tot.n * bins.sy - bins.n_k * tot.sy AS HUGEINT)
                 AS DOUBLE)
               / CAST(bins.n_k AS DOUBLE) / CAST(tot.n AS DOUBLE)
               / CAST(tot.n AS DOUBLE) * 1000000000.0
               / CAST(tot.n AS DOUBLE) + 0.5) AS BIGINT) AS res_nano,
             CAST(floor(
               (CAST(bins.spp AS DOUBLE)
                - CAST(CAST(bins.sp AS HUGEINT) * CAST(bins.sp AS HUGEINT)
                    AS DOUBLE) / CAST(bins.n_k AS DOUBLE)) / 10000.0
               * 1000000000.0 / CAST(tot.n AS DOUBLE) + 0.5) AS BIGINT)
               AS wbv_nano,
             CAST(floor(
               (CAST(bins.spy AS DOUBLE)
                - CAST(CAST(bins.sp AS HUGEINT) * CAST(bins.sy AS HUGEINT)
                    AS DOUBLE) / CAST(bins.n_k AS DOUBLE)) / 100.0
               * 1000000000.0 / CAST(tot.n AS DOUBLE) + 0.5) AS BIGINT)
               AS wbc_nano
      FROM bins CROSS JOIN tot
    ),
    agg AS (
      SELECT CAST(SUM(rel_nano) AS BIGINT) AS rel_nano,
             CAST(SUM(res_nano) AS BIGINT) AS res_nano,
             CAST(SUM(wbv_nano) AS BIGINT) AS wbv_nano,
             CAST(SUM(wbc_nano) AS BIGINT) AS wbc_nano
      FROM terms
    )
    SELECT terms.bin, terms.n_k, terms.sp, terms.sy,
           terms.rel_nano AS bin_rel_nano,
           agg.rel_nano, agg.res_nano, agg.wbv_nano, agg.wbc_nano,
           CAST(brier.brier_num AS DOUBLE)
             / (CAST(tot.n AS DOUBLE) * 10000.0) AS brier,
           CAST(tot.sy AS DOUBLE) / tot.n
             * (1.0 - CAST(tot.sy AS DOUBLE) / tot.n) AS uncertainty,
           (abs(CAST(brier.brier_num AS DOUBLE)
                  / (CAST(tot.n AS DOUBLE) * 10000.0)
                - (CAST(agg.rel_nano AS DOUBLE) / 1000000000.0
                   - CAST(agg.res_nano AS DOUBLE) / 1000000000.0
                   + CAST(tot.sy AS DOUBLE) / tot.n
                     * (1.0 - CAST(tot.sy AS DOUBLE) / tot.n)
                   + CAST(agg.wbv_nano AS DOUBLE) / 1000000000.0
                   - 2.0 * CAST(agg.wbc_nano AS DOUBLE) / 1000000000.0))
            < 0.000001) AS identity_holds
    FROM terms CROSS JOIN agg CROSS JOIN tot CROSS JOIN brier
    ORDER BY terms.bin
    """,
)
def q_brier_decomposition(spark, sf_dir):
    """MURPHY DECOMPOSITION of the Brier score — reliability minus
    resolution plus uncertainty (plus the within-bin variance term
    of the GENERALIZED decomposition, without which the identity is
    false for non-constant bins — derived and witness-pinned): the
    probabilistic-eval completion of q_calibration (calibration
    SHOWS the reliability diagram; Murphy's algebra says how much of
    the Brier score each defect contributes). The GENERALIZED form
    needs BOTH extra terms — within-bin variance AND minus twice the
    within-bin p,y covariance (Brier = REL - RES + UNC + WBV -
    2*WBC); dropping WBC breaks the identity by ~1e-3 on this
    fixture, caught by the witness. Same p100 = event_id
    % 100 score and purchase labels as q_calibration; the raw Brier
    numerator and every per-bin squared numerator are exact
    BIGINT/HUGEINT on the centi-probability lattice; per-bin
    REL/RES/WBV terms are quantized to the 1e-9 lattice BEFORE the
    exact sums (the q_log_rank discipline), and the identity check
    |Brier - (REL - RES + UNC + WBV)| < 1e-6 is computed by the
    identical chain on both engines. At 100 TB: one scan, one
    10-bin hash agg, constant state."""
    scored = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 100).cast("bigint").alias("p100"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .cast("bigint")
        .alias("y"),
    )
    scored = track_persist(scored)
    bins = scored.groupBy(
        F.expr("CAST(p100 div 10 AS BIGINT)").alias("bin")
    ).agg(
        F.count("*").cast("bigint").alias("n_k"),
        F.sum("p100").cast("bigint").alias("sp"),
        F.sum(F.col("p100") * F.col("p100")).cast("bigint").alias("spp"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("p100") * F.col("y")).cast("bigint").alias("spy"),
    )
    bins = track_persist(bins)
    tot = bins.agg(
        F.sum("n_k").cast("bigint").alias("n"),
        F.sum("sy").cast("bigint").alias("sy_tot"),
        F.sum("sp").cast("bigint").alias("sp_tot"),
    )
    err = F.col("p100") - 100 * F.col("y")
    brier = scored.agg(
        F.sum(err * err).cast("bigint").alias("brier_num")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rel_d = dec(F.col("sp") - 100 * F.col("sy"))
    res_d = dec(F.col("n") * F.col("sy") - F.col("n_k") * F.col("sy_tot"))
    terms = bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_k",
        "sp",
        "sy",
        "n",
        "sy_tot",
        F.floor(
            (rel_d * rel_d).cast("double")
            / F.col("n_k").cast("double")
            / 10000.0
            * 1000000000.0
            / F.col("n").cast("double")
            + 0.5
        )
        .cast("bigint")
        .alias("rel_nano"),
        F.floor(
            (res_d * res_d).cast("double")
            / F.col("n_k").cast("double")
            / F.col("n").cast("double")
            / F.col("n").cast("double")
            * 1000000000.0
            / F.col("n").cast("double")
            + 0.5
        )
        .cast("bigint")
        .alias("res_nano"),
        F.floor(
            (
                F.col("spp").cast("double")
                - (dec(F.col("sp")) * dec(F.col("sp"))).cast("double")
                / F.col("n_k").cast("double")
            )
            / 10000.0
            * 1000000000.0
            / F.col("n").cast("double")
            + 0.5
        )
        .cast("bigint")
        .alias("wbv_nano"),
        F.floor(
            (
                F.col("spy").cast("double")
                - (dec(F.col("sp")) * dec(F.col("sy"))).cast("double")
                / F.col("n_k").cast("double")
            )
            / 100.0
            * 1000000000.0
            / F.col("n").cast("double")
            + 0.5
        )
        .cast("bigint")
        .alias("wbc_nano"),
    )
    terms = track_persist(terms)
    agg = terms.agg(
        F.sum("rel_nano").cast("bigint").alias("rel_nano_t"),
        F.sum("res_nano").cast("bigint").alias("res_nano_t"),
        F.sum("wbv_nano").cast("bigint").alias("wbv_nano_t"),
        F.sum("wbc_nano").cast("bigint").alias("wbc_nano_t"),
    )
    ybar = F.col("sy_tot").cast("double") / F.col("n")
    brier_d = F.col("brier_num").cast("double") / (
        F.col("n").cast("double") * 10000.0
    )
    unc = ybar * (1.0 - ybar)
    recon = (
        F.col("rel_nano_t").cast("double") / 1000000000.0
        - F.col("res_nano_t").cast("double") / 1000000000.0
        + unc
        + F.col("wbv_nano_t").cast("double") / 1000000000.0
        - 2.0 * F.col("wbc_nano_t").cast("double") / 1000000000.0
    )
    return (
        terms.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(brier))
        .select(
            "bin",
            "n_k",
            "sp",
            "sy",
            F.col("rel_nano").alias("bin_rel_nano"),
            F.col("rel_nano_t").alias("rel_nano"),
            F.col("res_nano_t").alias("res_nano"),
            F.col("wbv_nano_t").alias("wbv_nano"),
            F.col("wbc_nano_t").alias("wbc_nano"),
            brier_d.alias("brier"),
            unc.alias("uncertainty"),
            (F.abs(brier_d - recon) < 0.000001).alias("identity_holds"),
        )
        .orderBy("bin")
    )


@staged(
    "q_banzhaf_power",
    oracle="""
    WITH daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    winners AS (
      SELECT d, t FROM (
        SELECT d, t,
               row_number() OVER (PARTITION BY d ORDER BY x DESC, t)
                 AS rn
        FROM daily
      ) WHERE rn = 1
    ),
    seats AS (
      SELECT tt.t,
             CAST(list_position(['click', 'error', 'purchase', 'signup',
               'view'], tt.t) - 1 AS BIGINT) AS i,
             CAST(COALESCE(w.n, 0) AS BIGINT) AS w
      FROM (SELECT DISTINCT event_type AS t FROM events) tt
      LEFT JOIN (SELECT t, COUNT(*) AS n FROM winners GROUP BY t) w
        ON w.t = tt.t
    ),
    masks AS (SELECT CAST(unnest(range(0, 32)) AS BIGINT) AS m),
    totals AS (
      SELECT masks.m,
             CAST(COALESCE(SUM(CASE WHEN ((masks.m >> seats.i) & 1) = 1
               THEN seats.w END), 0) AS BIGINT) AS tw
      FROM masks LEFT JOIN seats ON ((masks.m >> seats.i) & 1) = 1
      GROUP BY masks.m
    ),
    swings AS (
      SELECT seats.t, seats.i, seats.w,
             CAST(SUM(CASE WHEN ((totals.m >> seats.i) & 1) = 0
               AND totals.tw < 16 AND totals.tw + seats.w >= 16
               THEN 1 ELSE 0 END) AS BIGINT) AS n_swings
      FROM seats CROSS JOIN totals
      GROUP BY seats.t, seats.i, seats.w
    ),
    tot AS (
      SELECT CAST(SUM(n_swings) AS BIGINT) AS total_swings FROM swings
    )
    SELECT swings.t AS t, swings.w AS seats, swings.n_swings,
           tot.total_swings,
           CASE WHEN tot.total_swings = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((swings.n_swings * 1000000)
                          // tot.total_swings AS BIGINT) END
             AS banzhaf_micro,
           CASE WHEN tot.total_swings = 0 THEN 0.0
                ELSE CAST(swings.n_swings AS DOUBLE)
                     / CAST(tot.total_swings AS DOUBLE) END AS banzhaf
    FROM swings CROSS JOIN tot
    ORDER BY t
    """,
)
def q_banzhaf_power(spark, sf_dir):
    """BANZHAF VOTING POWER INDEX over the daily-winner 'parliament'
    — the voting-power completion of the election family (q_dhondt /
    q_largest_remainder apportion seats, the staged q_efficiency_gap
    audits districts; Banzhaf measures what seats are WORTH: the
    fraction of coalitions a party can swing, which is famously NOT
    proportional to seat share): seats = days won (exact daily-cents
    argmax with lexicographic tiebreak, 30 seats, quota 16 =
    majority), all 2^5 coalitions enumerated on a 32-row literal
    mask grid (the q_shapley_attribution discipline scaled to 5
    players), swing counts exact BIGINT via the integer bracket
    T < quota <= T + w, and the zero-total degenerate case is
    decided by an integer guard. The power ratio rides the micro
    lattice plus one identical double division. At 100 TB: raw
    volume dies in the (t, day) agg; the enumeration is a 5x32
    broadcast join."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    w_day = Window.partitionBy("d").orderBy(F.desc("x"), "t")
    winners = (
        daily.select("d", "t", F.row_number().over(w_day).alias("rn"))
        .filter(F.col("rn") == 1)
        .groupBy("t")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    seats = (
        daily.select("t")
        .distinct()
        .join(F.broadcast(winners), "t", "left")
        .select(
            "t",
            F.expr(
                "CAST(array_position(array('click', 'error', 'purchase',"
                " 'signup', 'view'), t) - 1 AS BIGINT)"
            ).alias("i"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("w"),
        )
    )
    seats = track_persist(seats)
    masks = spark.range(32).select(F.col("id").cast("bigint").alias("m"))
    totals = (
        masks.join(
            F.broadcast(seats),
            F.expr("((m div CAST(pow(2, i) AS BIGINT)) % 2) = 1"),
            "left",
        )
        .groupBy("m")
        .agg(F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("tw"))
    )
    swings = (
        seats.crossJoin(F.broadcast(totals))
        .groupBy("t", "i", "w")
        .agg(
            F.sum(
                F.when(
                    (F.expr("((m div CAST(pow(2, i) AS BIGINT)) % 2) = 0"))
                    & (F.col("tw") < 16)
                    & (F.col("tw") + F.col("w") >= 16),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_swings")
        )
    )
    swings = track_persist(swings)
    tot = swings.agg(
        F.sum("n_swings").cast("bigint").alias("total_swings")
    )
    return (
        swings.crossJoin(F.broadcast(tot))
        .select(
            "t",
            F.col("w").alias("seats"),
            "n_swings",
            "total_swings",
            F.when(F.col("total_swings") == 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr(
                    "CAST((n_swings * 1000000) div total_swings AS BIGINT)"
                )
            )
            .alias("banzhaf_micro"),
            F.when(F.col("total_swings") == 0, F.lit(0.0))
            .otherwise(
                F.col("n_swings").cast("double")
                / F.col("total_swings").cast("double")
            )
            .alias("banzhaf"),
        )
        .orderBy("t")
    )


@staged(
    "q_condorcet_borda",
    oracle="""
    WITH daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    ranked AS (
      SELECT t, d,
             row_number() OVER (PARTITION BY d ORDER BY x DESC, t) AS rk
      FROM grid
    ),
    borda AS (
      SELECT t, CAST(SUM(5 - rk) AS BIGINT) AS borda_score
      FROM ranked GROUP BY t
    ),
    pair AS (
      SELECT a.t AS ta, b.t AS tb,
             CAST(SUM(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END) AS BIGINT)
               AS a_beats
      FROM ranked a JOIN ranked b ON a.d = b.d AND a.t != b.t
      GROUP BY a.t, b.t
    ),
    hw AS (
      SELECT ta AS t,
             CAST(SUM(CASE WHEN a_beats > 15 THEN 1 ELSE 0 END) AS BIGINT)
               AS pairwise_wins
      FROM pair GROUP BY ta
    ),
    bw AS (
      SELECT t FROM borda ORDER BY borda_score DESC, t LIMIT 1
    )
    SELECT borda.t AS t, borda.borda_score, hw.pairwise_wins,
           (hw.pairwise_wins = 4) AS is_condorcet_winner,
           (borda.t = (SELECT t FROM bw)) AS is_borda_winner
    FROM borda JOIN hw ON hw.t = borda.t
    ORDER BY t
    """,
)
def q_condorcet_borda(spark, sf_dir):
    """CONDORCET vs BORDA over 30 daily ballots — the social-choice
    completion of the election family (apportionment and power
    indices divide seats; THIS asks who should win at all, and the
    two classic rules famously disagree — Borda can elect a
    candidate the majority beats head-to-head): each day ranks the
    5 event types by exact daily cents (row_number with the
    lexicographic tiebreak — a STRICT ballot, so pairwise totals
    always sum to 30 and 'beats' means > 15, never a float or a
    draw), Borda scores 5 - rank summed as exact BIGINTs, the
    head-to-head matrix is one counting self-join on the 150-row
    grid, the Condorcet winner is the integer predicate
    pairwise_wins = 4, and the Borda winner is the
    (score desc, t asc) lattice argmax. At 100 TB: raw volume dies
    in the (t, day) agg; everything after is 150-row work."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    w_day = Window.partitionBy("d").orderBy(F.desc("x"), "t")
    ranked = grid.select(
        "t", "d", F.row_number().over(w_day).cast("bigint").alias("rk")
    )
    ranked = track_persist(ranked)
    borda = ranked.groupBy("t").agg(
        F.sum(5 - F.col("rk")).cast("bigint").alias("borda_score")
    )
    a = ranked.alias("a")
    b = ranked.alias("b")
    pair = (
        a.join(
            F.broadcast(b),
            (F.col("a.d") == F.col("b.d")) & (F.col("a.t") != F.col("b.t")),
        )
        .groupBy(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
        .agg(
            F.sum(
                F.when(F.col("a.rk") < F.col("b.rk"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("a_beats")
        )
    )
    hw = pair.groupBy(F.col("ta").alias("t")).agg(
        F.sum(F.when(F.col("a_beats") > 15, 1).otherwise(0))
        .cast("bigint")
        .alias("pairwise_wins")
    )
    bw = borda.orderBy(F.desc("borda_score"), "t").limit(1).select(
        F.col("t").alias("winner_t"), F.lit(1).alias("one")
    )
    return (
        borda.join(F.broadcast(hw), "t")
        .join(F.broadcast(bw), borda["t"] == bw["winner_t"], "left")
        .select(
            "t",
            "borda_score",
            "pairwise_wins",
            (F.col("pairwise_wins") == 4).alias("is_condorcet_winner"),
            F.col("one").isNotNull().alias("is_borda_winner"),
        )
        .orderBy("t")
    )


# =====================================================================
# Round-12 staged batch 20 — more social choice / market mechanisms:
# instant-runoff elimination, EXHAUSTIVE Kemeny rank aggregation
# (120 permutations), and double-auction market clearing.
# Promotion target: round 13.
# =====================================================================

_IRV_DAILY = """
    daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    ranked AS (
      SELECT t, d,
             row_number() OVER (PARTITION BY d ORDER BY x DESC, t) AS rk
      FROM grid
    )
"""


def _irv_oracle() -> str:
    # four unrolled elimination rounds; each loser picked by
    # (first-choice count asc, t asc) over the remaining candidates.
    steps = []
    prev_elim = "CAST([] AS VARCHAR[])"
    for r in range(1, 5):
        steps.append(f"""
    fc{r} AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS votes FROM (
        SELECT d, t FROM (
          SELECT d, t,
                 row_number() OVER (PARTITION BY d ORDER BY rk) AS pos
          FROM ranked WHERE NOT list_contains(({prev_elim}), t)
        ) WHERE pos = 1
      ) GROUP BY t
    ),
    all{r} AS (
      SELECT tt.t, CAST(COALESCE(fc{r}.votes, 0) AS BIGINT) AS votes
      FROM (SELECT DISTINCT t FROM ranked
            WHERE NOT list_contains(({prev_elim}), t)) tt
      LEFT JOIN fc{r} ON fc{r}.t = tt.t
    ),
    out{r} AS (
      SELECT t FROM all{r} ORDER BY votes, t LIMIT 1
    ),
    elim{r} AS (
      SELECT list_append(({prev_elim}), (SELECT t FROM out{r})) AS e
    )""")
        prev_elim = f"(SELECT e FROM elim{r})"
    rounds_sql = ",".join(steps)
    return f"""
    WITH {_IRV_DAILY},{rounds_sql},
    rounds AS (
      SELECT 1 AS rnd, (SELECT t FROM out1) AS eliminated
      UNION ALL SELECT 2, (SELECT t FROM out2)
      UNION ALL SELECT 3, (SELECT t FROM out3)
      UNION ALL SELECT 4, (SELECT t FROM out4)
    ),
    winner AS (
      SELECT t FROM (SELECT DISTINCT t FROM ranked)
      WHERE NOT list_contains((SELECT e FROM elim4), t)
    )
    SELECT CAST(rounds.rnd AS BIGINT) AS rnd, rounds.eliminated,
           (SELECT t FROM winner) AS winner
    FROM rounds ORDER BY rnd
    """


@staged("q_instant_runoff", oracle=_irv_oracle())
def q_instant_runoff(spark, sf_dir):
    """INSTANT-RUNOFF VOTING (ranked-choice elimination) over the 30
    strict daily ballots — the sequential member of the social-choice
    family (q_condorcet_borda evaluates one-shot rules; IRV
    eliminates iteratively and can disagree with BOTH): four
    elimination rounds, each counting exact first-choice votes among
    the REMAINING candidates (per-ballot argmin rank via one window
    over the 150-row grid) and eliminating the (votes asc, t asc)
    loser — candidates with ZERO first-choice votes still eliminate
    correctly via the left-join zero-fill (a dropped candidate must
    not vanish from the tally, caught at construction). Every round
    is exact-integer decided; the four rounds chain as broadcast
    scalar joins (bounded data: 5 candidates). At 100 TB: raw
    volume dies in the (t, day) agg; each round is 150-row work."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    w_day = Window.partitionBy("d").orderBy(F.desc("x"), "t")
    ranked = grid.select(
        "t", "d", F.row_number().over(w_day).cast("bigint").alias("rk")
    )
    ranked = track_persist(ranked)
    cands = ranked.select("t").distinct()
    eliminated = []  # list of 1-row DataFrames with column `et`
    rounds = []
    remaining = cands
    cur_ranked = ranked
    for rnd in range(1, 5):
        w_pos = Window.partitionBy("d").orderBy("rk")
        fc = (
            cur_ranked.select(
                "d", "t", F.row_number().over(w_pos).alias("pos")
            )
            .filter(F.col("pos") == 1)
            .groupBy("t")
            .agg(F.count("*").cast("bigint").alias("votes"))
        )
        tally = remaining.join(F.broadcast(fc), "t", "left").select(
            "t", F.coalesce("votes", F.lit(0)).cast("bigint").alias("votes")
        )
        out = tally.orderBy("votes", "t").limit(1).select(
            F.col("t").alias("et")
        )
        out = track_persist(out)
        rounds.append(
            out.select(
                F.lit(rnd).cast("bigint").alias("rnd"),
                F.col("et").alias("eliminated"),
            )
        )
        remaining = remaining.join(
            F.broadcast(out), remaining["t"] == out["et"], "left_anti"
        )
        cur_ranked = cur_ranked.join(
            F.broadcast(out), cur_ranked["t"] == out["et"], "left_anti"
        )
    winner = remaining.select(F.col("t").alias("winner"))
    res = rounds[0]
    for r in rounds[1:]:
        res = res.unionAll(r)
    return res.crossJoin(F.broadcast(winner)).orderBy("rnd")


def _kemeny_perms():
    import itertools

    return list(itertools.permutations(range(5)))


def _kemeny_oracle() -> str:
    perm_rows = ", ".join(
        f"({pid}, {p[0]}, {p[1]}, {p[2]}, {p[3]}, {p[4]})"
        for pid, p in enumerate(_kemeny_perms())
    )
    return f"""
    WITH {_IRV_DAILY},
    idx AS (
      SELECT t, CAST(list_position(['click', 'error', 'purchase',
        'signup', 'view'], t) - 1 AS BIGINT) AS i
      FROM (SELECT DISTINCT t FROM ranked)
    ),
    beats AS (
      SELECT ia.i AS a, ib.i AS b,
             CAST(SUM(CASE WHEN ra.rk < rb.rk THEN 1 ELSE 0 END)
               AS BIGINT) AS n
      FROM ranked ra
      JOIN ranked rb ON ra.d = rb.d AND ra.t != rb.t
      JOIN idx ia ON ia.t = ra.t
      JOIN idx ib ON ib.t = rb.t
      GROUP BY ia.i, ib.i
    ),
    perms(pid, c0, c1, c2, c3, c4) AS (VALUES {perm_rows}),
    pcells AS (
      SELECT pid, 0 AS pos, c0 AS ci FROM perms
      UNION ALL SELECT pid, 1, c1 FROM perms
      UNION ALL SELECT pid, 2, c2 FROM perms
      UNION ALL SELECT pid, 3, c3 FROM perms
      UNION ALL SELECT pid, 4, c4 FROM perms
    ),
    costs AS (
      SELECT x.pid, CAST(SUM(beats.n) AS BIGINT) AS cost
      FROM pcells x JOIN pcells y ON y.pid = x.pid AND x.pos < y.pos
      JOIN beats ON beats.a = y.ci AND beats.b = x.ci
      GROUP BY x.pid
    ),
    best AS (SELECT pid, cost FROM costs ORDER BY cost, pid LIMIT 1)
    SELECT CAST(pc.pos AS BIGINT) AS pos,
           ['click', 'error', 'purchase', 'signup', 'view'][pc.ci + 1]
             AS candidate,
           best.cost AS kemeny_cost, CAST(best.pid AS BIGINT) AS perm_id
    FROM best JOIN pcells pc ON pc.pid = best.pid
    ORDER BY pos
    """


@staged("q_kemeny_exhaustive", oracle=_kemeny_oracle())
def q_kemeny_exhaustive(spark, sf_dir):
    """EXHAUSTIVE KEMENY-YOUNG rank aggregation over the 30 strict
    daily ballots — the OPTIMAL social-choice rule (the maximum-
    likelihood ordering under noise, NP-hard in general, solved
    EXACTLY here because 5 candidates admit full 5! enumeration —
    the q_knapsack_dp small-instance-exhaustive discipline): the
    pairwise-disagreement matrix comes from the same strict ballots
    as q_condorcet_borda, all 120 permutations are a LITERAL table
    generated from one Python itertools call for both engines (ids
    in lexicographic order, so the (cost asc, pid asc) tiebreak is
    itself lexicographic), and every cost is an exact BIGINT sum of
    beats-counts over the 10 ordered pairs per permutation. Output
    is the optimal ordering, one row per position. At 100 TB: raw
    volume dies in the (t, day) agg; the enumeration is a
    600x600-cell broadcast self-join — constant size."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    w_day = Window.partitionBy("d").orderBy(F.desc("x"), "t")
    ranked = grid.select(
        "t",
        "d",
        F.row_number().over(w_day).cast("bigint").alias("rk"),
        F.expr(
            "CAST(array_position(array('click', 'error', 'purchase',"
            " 'signup', 'view'), t) - 1 AS BIGINT)"
        ).alias("i"),
    )
    ranked = track_persist(ranked)
    ra = ranked.alias("ra")
    rb = ranked.alias("rb")
    beats = (
        ra.join(
            F.broadcast(rb),
            (F.col("ra.d") == F.col("rb.d"))
            & (F.col("ra.t") != F.col("rb.t")),
        )
        .groupBy(
            F.col("ra.i").alias("a"), F.col("rb.i").alias("b")
        )
        .agg(
            F.sum(
                F.when(F.col("ra.rk") < F.col("rb.rk"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n")
        )
    )
    perm_rows = [
        (pid, pos, ci)
        for pid, p in enumerate(_kemeny_perms())
        for pos, ci in enumerate(p)
    ]
    pcells = spark.createDataFrame(
        perm_rows, "pid BIGINT, pos BIGINT, ci BIGINT"
    )
    x = pcells.alias("x")
    y = pcells.alias("y")
    costs = (
        x.join(
            F.broadcast(y),
            (F.col("y.pid") == F.col("x.pid"))
            & (F.col("x.pos") < F.col("y.pos")),
        )
        .join(
            F.broadcast(beats),
            (F.col("a") == F.col("y.ci")) & (F.col("b") == F.col("x.ci")),
        )
        .groupBy(F.col("x.pid").alias("pid"))
        .agg(F.sum("n").cast("bigint").alias("cost"))
    )
    best = costs.orderBy("cost", "pid").limit(1).select(
        F.col("pid").alias("bpid"), "cost"
    )
    return (
        best.join(F.broadcast(pcells), F.col("bpid") == pcells["pid"])
        .select(
            F.col("pos").cast("bigint").alias("pos"),
            F.expr(
                "element_at(array('click', 'error', 'purchase', 'signup',"
                " 'view'), CAST(ci + 1 AS INT))"
            ).alias("candidate"),
            F.col("cost").alias("kemeny_cost"),
            F.col("bpid").cast("bigint").alias("perm_id"),
        )
        .orderBy("pos")
    )


@staged(
    "q_double_auction",
    oracle="""
    WITH bids AS (
      SELECT user_id, CAST(SUM(CAST(round(value * 100) AS BIGINT))
        AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    asks AS (
      SELECT user_id, CAST(SUM(CAST(round(value * 100) AS BIGINT))
        AS BIGINT) AS v
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    lattice AS (
      SELECT v FROM bids UNION SELECT v FROM asks
    ),
    curves AS (
      SELECT l.v,
             CAST((SELECT COUNT(*) FROM bids WHERE bids.v >= l.v)
               AS BIGINT) AS demand,
             CAST((SELECT COUNT(*) FROM asks WHERE asks.v <= l.v)
               AS BIGINT) AS supply
      FROM lattice l
    ),
    traded AS (
      SELECT v, LEAST(demand, supply) AS n_trades, demand, supply
      FROM curves
    ),
    best AS (
      SELECT v, n_trades, demand, supply FROM traded
      ORDER BY n_trades DESC, v LIMIT 1
    ),
    ns AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bids) AS n_buyers,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM asks) AS n_sellers
    )
    SELECT ns.n_buyers, ns.n_sellers,
           best.v AS clearing_price_cents,
           best.n_trades, best.demand AS demand_at_clear,
           best.supply AS supply_at_clear
    FROM ns CROSS JOIN best
    """,
)
def q_double_auction(spark, sf_dir):
    """DOUBLE-AUCTION MARKET CLEARING — the market-design completion
    of the mechanism family (q_dhondt apportions, q_gale_shapley
    matches, the staged q_banzhaf_power weighs; a call auction
    CLEARS: buyers bid their per-user purchase cents, sellers ask
    their per-user click cents, and the clearing price maximizes
    executed trades): the textbook sorted-order formulation (k* =
    max k with bid_(k) >= ask_(k)) would need a GLOBAL SORT of all
    participants — instead the demand curve #bids >= v and supply
    curve #asks <= v are built by cumulative counting on the cents
    LATTICE (derived equivalence: max_v min(demand(v), supply(v))
    equals k* — no row-cardinality sort anywhere), trades and both
    curve values are exact BIGINTs, and the (trades desc, v asc)
    clearing pick is lattice-decided. At 100 TB: two user-keyed
    aggs, two bounded-lattice cumulative windows — needs a
    BOUNDED_UNPARTITIONED_WINDOW allowlist row at promotion."""
    ev = _t(spark, sf_dir, "events")

    def side(et):
        return (
            ev.filter(F.col("event_type") == et)
            .groupBy("user_id")
            .agg(
                F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
                .cast("bigint")
                .alias("v")
            )
        )

    bids, asks = side("purchase"), side("click")
    bh = bids.groupBy("v").agg(F.count("*").cast("bigint").alias("nb"))
    ah = asks.groupBy("v").agg(F.count("*").cast("bigint").alias("na"))
    lattice = (
        bh.select("v")
        .unionAll(ah.select("v"))
        .distinct()
        .join(F.broadcast(bh), "v", "left")
        .join(F.broadcast(ah), "v", "left")
        .select(
            "v",
            F.coalesce("nb", F.lit(0)).cast("bigint").alias("nb"),
            F.coalesce("na", F.lit(0)).cast("bigint").alias("na"),
        )
    )
    w_ge = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_le = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curves = lattice.select(
        "v",
        F.sum("nb").over(w_ge).cast("bigint").alias("demand"),
        F.sum("na").over(w_le).cast("bigint").alias("supply"),
    )
    traded = curves.select(
        "v",
        F.least("demand", "supply").cast("bigint").alias("n_trades"),
        "demand",
        "supply",
    )
    best = traded.orderBy(F.desc("n_trades"), "v").limit(1)
    ns = bids.agg(F.count("*").cast("bigint").alias("n_buyers")).crossJoin(
        F.broadcast(
            asks.agg(F.count("*").cast("bigint").alias("n_sellers"))
        )
    )
    return ns.crossJoin(F.broadcast(best)).select(
        "n_buyers",
        "n_sellers",
        F.col("v").alias("clearing_price_cents"),
        "n_trades",
        F.col("demand").alias("demand_at_clear"),
        F.col("supply").alias("supply_at_clear"),
    )


# =====================================================================
# Round-12 staged batch 21 — online algorithms: optimal stopping
# (secretary rule), rent-or-buy (ski rental), and cache replacement
# (LRU vs Belady's OPT). Promotion target: round 13.
# =====================================================================


@staged(
    "q_secretary_stop",
    oracle="""
    WITH daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    thresh AS (
      SELECT t, CAST(MAX(x) AS BIGINT) AS bar
      FROM grid WHERE d < 11 GROUP BY t
    ),
    picks AS (
      SELECT g.t, CAST(MIN(g.d) AS BIGINT) AS pick_day
      FROM grid g JOIN thresh ON thresh.t = g.t
      WHERE g.d >= 11 AND g.x > thresh.bar
      GROUP BY g.t
    ),
    best AS (
      SELECT t, CAST(MAX(x) AS BIGINT) AS best_x FROM grid GROUP BY t
    ),
    picked AS (
      SELECT grid.t, picks.pick_day, grid.x AS picked_x
      FROM picks JOIN grid ON grid.t = picks.t AND grid.d = picks.pick_day
    )
    SELECT best.t AS t, thresh.bar AS threshold_cents,
           CAST(COALESCE(picked.pick_day, 29) AS BIGINT) AS pick_day,
           CAST(COALESCE(picked.picked_x,
             (SELECT x FROM grid g2
              WHERE g2.t = best.t AND g2.d = 29)) AS BIGINT)
             AS picked_cents,
           best.best_x AS best_cents,
           (COALESCE(picked.picked_x,
             (SELECT x FROM grid g2 WHERE g2.t = best.t AND g2.d = 29))
            = best.best_x) AS found_best
    FROM best JOIN thresh ON thresh.t = best.t
    LEFT JOIN picked ON picked.t = best.t
    ORDER BY t
    """,
)
def q_secretary_stop(spark, sf_dir):
    """THE SECRETARY RULE (1/e optimal-stopping) replayed per event
    type — the online-decision family opener (every other query sees
    all data; an online agent must COMMIT: observe the first
    n/e ~ 11 of 30 days as a calibration window, then take the first
    later day beating that bar, defaulting to day 29 if none does):
    the bar, the pick (earliest qualifying day — an exact MIN over
    an integer predicate), the fallback (a left-join COALESCE to the
    last day, the documented no-qualifier rule) and the success flag
    picked = max are ALL integer-decided on exact daily cents. The
    witness replays the rule AND pins the classic guarantee
    qualitatively (the rule finds the true max for at least one
    type on the fixture). At 100 TB: raw volume dies in the
    (t, day) agg; the rule is bounded-grid work."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    grid = track_persist(grid)
    thresh = grid.filter(F.col("d") < 11).groupBy("t").agg(
        F.max("x").cast("bigint").alias("bar")
    )
    picks = (
        grid.join(F.broadcast(thresh), "t")
        .filter((F.col("d") >= 11) & (F.col("x") > F.col("bar")))
        .groupBy("t")
        .agg(F.min("d").cast("bigint").alias("pick_day"))
    )
    best = grid.groupBy("t").agg(F.max("x").cast("bigint").alias("best_x"))
    picked = picks.join(
        F.broadcast(grid.select("t", F.col("d").alias("pick_day"), "x")),
        ["t", "pick_day"],
    ).select("t", "pick_day", F.col("x").alias("picked_x"))
    last = grid.filter(F.col("d") == 29).select(
        "t", F.col("x").alias("last_x")
    )
    return (
        best.join(F.broadcast(thresh), "t")
        .join(F.broadcast(picked), "t", "left")
        .join(F.broadcast(last), "t")
        .select(
            "t",
            F.col("bar").alias("threshold_cents"),
            F.coalesce("pick_day", F.lit(29)).cast("bigint").alias(
                "pick_day"
            ),
            F.coalesce("picked_x", "last_x").cast("bigint").alias(
                "picked_cents"
            ),
            F.col("best_x").alias("best_cents"),
            (
                F.coalesce("picked_x", "last_x") == F.col("best_x")
            ).alias("found_best"),
        )
        .orderBy("t")
    )


@staged(
    "q_ski_rental",
    oracle="""
    WITH usage AS (
      SELECT user_id,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days
      FROM events GROUP BY user_id
    ),
    costs AS (
      SELECT user_id, days,
             CAST(LEAST(days, 10) AS BIGINT) AS opt_cost,
             CAST(CASE WHEN days < 10 THEN days ELSE 20 END AS BIGINT)
               AS online_cost
      FROM usage
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(opt_cost) AS BIGINT) AS opt_total,
             CAST(SUM(online_cost) AS BIGINT) AS online_total,
             CAST(SUM(CASE WHEN online_cost > 2 * opt_cost THEN 1
               ELSE 0 END) AS BIGINT) AS ratio_violations
      FROM costs
    )
    SELECT days, CAST(COUNT(*) AS BIGINT) AS n_users_at,
           CAST(MAX(opt_cost) AS BIGINT) AS opt_cost,
           CAST(MAX(online_cost) AS BIGINT) AS online_cost,
           (SELECT n_users FROM tot) AS n_users,
           (SELECT opt_total FROM tot) AS opt_total,
           (SELECT online_total FROM tot) AS online_total,
           (SELECT ratio_violations FROM tot) AS ratio_violations,
           CAST((SELECT online_total FROM tot) AS DOUBLE)
             / CAST((SELECT opt_total FROM tot) AS DOUBLE)
             AS competitive_ratio
    FROM costs GROUP BY days ORDER BY days
    """,
)
def q_ski_rental(spark, sf_dir):
    """SKI RENTAL (rent-or-buy) replayed over per-user activity — the
    canonical 2-competitive online algorithm (rent 1/day until day
    B = 10, then buy at 20 total; the offline optimum pays
    min(days, 10)): per-user distinct active days are exact, both
    cost functions are integer CASE expressions, the aggregate
    competitive ratio is one division of exact totals, and the
    2-competitiveness guarantee is checked as an INTEGER predicate
    per user (online > 2*opt counts violations — provably zero,
    witness-pinned; the break-even rule's worst case is exactly 2B
    vs B at days = B). Grouped by usage level so the cost curves are
    visible. At 100 TB: one user-keyed distinct-day agg, then a
    bounded 30-row group-by."""
    usage = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.countDistinct(F.col("ts").cast("date"))
            .cast("bigint")
            .alias("days")
        )
    )
    costs = usage.select(
        "user_id",
        "days",
        F.least("days", F.lit(10)).cast("bigint").alias("opt_cost"),
        F.when(F.col("days") < 10, F.col("days"))
        .otherwise(20)
        .cast("bigint")
        .alias("online_cost"),
    )
    costs = track_persist(costs)
    tot = costs.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("opt_cost").cast("bigint").alias("opt_total"),
        F.sum("online_cost").cast("bigint").alias("online_total"),
        F.sum(
            F.when(F.col("online_cost") > 2 * F.col("opt_cost"), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("ratio_violations"),
    )
    return (
        costs.groupBy("days")
        .agg(
            F.count("*").cast("bigint").alias("n_users_at"),
            F.max("opt_cost").cast("bigint").alias("opt_cost"),
            F.max("online_cost").cast("bigint").alias("online_cost"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "days",
            "n_users_at",
            "opt_cost",
            "online_cost",
            "n_users",
            "opt_total",
            "online_total",
            "ratio_violations",
            (
                F.col("online_total").cast("double")
                / F.col("opt_total").cast("double")
            ).alias("competitive_ratio"),
        )
        .orderBy("days")
    )


@staged(
    "q_lru_vs_belady",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS pos,
             event_type AS tok
      FROM events
    ),
    seq AS (
      SELECT user_id, pos, tok,
             CAST(COALESCE(lead(pos) OVER (PARTITION BY user_id, tok
               ORDER BY pos), 1000000000) AS BIGINT) AS nu
      FROM toks
    ),
    lens AS (
      SELECT user_id, CAST(MAX(pos) AS BIGINT) AS n FROM seq
      GROUP BY user_id
    ),
    rec AS (
      SELECT user_id, 0 AS k,
             CAST([] AS VARCHAR[]) AS lru,
             CAST([] AS STRUCT(t VARCHAR, nu BIGINT)[]) AS opt,
             CAST(0 AS BIGINT) AS lh, CAST(0 AS BIGINT) AS oh
      FROM lens
      UNION ALL
      SELECT rec.user_id, rec.k + 1,
             CASE WHEN list_contains(rec.lru, s.tok)
                  THEN list_prepend(s.tok,
                    list_filter(rec.lru, e -> e != s.tok))
                  ELSE list_prepend(s.tok, rec.lru)[1:3] END,
             CASE WHEN len(list_filter(rec.opt, e -> e.t = s.tok)) > 0
                  THEN list_transform(rec.opt, e ->
                    CASE WHEN e.t = s.tok
                         THEN {'t': s.tok, 'nu': s.nu} ELSE e END)
                  WHEN len(rec.opt) < 3
                  THEN list_append(rec.opt, {'t': s.tok, 'nu': s.nu})
                  ELSE list_append(
                    list_filter(rec.opt, e -> e.t !=
                      (list_reduce(rec.opt, (b, e) ->
                        CASE WHEN e.nu > b.nu
                               OR (e.nu = b.nu AND e.t > b.t)
                             THEN e ELSE b END)).t),
                    {'t': s.tok, 'nu': s.nu}) END,
             rec.lh + CASE WHEN list_contains(rec.lru, s.tok)
               THEN 1 ELSE 0 END,
             rec.oh + CASE WHEN len(list_filter(rec.opt,
               e -> e.t = s.tok)) > 0 THEN 1 ELSE 0 END
      FROM rec
      JOIN seq s ON s.user_id = rec.user_id AND s.pos = rec.k + 1
    ),
    final AS (
      SELECT rec.user_id, rec.lh, rec.oh, lens.n
      FROM rec JOIN lens ON lens.user_id = rec.user_id
        AND rec.k = lens.n
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n) AS BIGINT) AS n_accesses,
           CAST(SUM(lh) AS BIGINT) AS lru_hits,
           CAST(SUM(oh) AS BIGINT) AS opt_hits,
           CAST(SUM(lh) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS lru_rate,
           CAST(SUM(oh) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS opt_rate,
           (SUM(oh) >= SUM(lh)) AS opt_dominates
    FROM final
    """,
)
def q_lru_vs_belady(spark, sf_dir):
    """LRU vs BELADY'S OPT cache replacement, replayed exactly over
    every user's event-type stream (cache of 3 over a 5-symbol
    alphabet) — the systems-mechanism capstone of the online family
    (q_secretary_stop decides once, q_ski_rental decides a
    threshold; a cache decides EVERY access, and OPT needs the
    future): the per-user access sequence is totally ordered by
    (ts, event_id), each token carries its NEXT-USE position
    precomputed relationally (one lead window per (user, type) —
    the future made available offline, which is exactly why Belady
    is computable here and not online), and both policies run in
    ONE F.aggregate fold per user: LRU as a most-recent-first list
    (hit = membership, an integer predicate), OPT evicting the
    max-(next_use, type) entry via an inner reduce whose sentinel
    seed provably loses to every real entry (so Spark's fold and
    DuckDB's first-element-seeded list_reduce pick the same victim
    — derived, tie-broken on the type string). Hit counts are exact
    BIGINTs; OPT >= LRU (Belady optimality) is an integer compare,
    witness-pinned per-user AND in aggregate. At 100 TB: sequences
    are per-user bounded (documented); one shuffle to user
    partitions, folds run map-side."""
    ev = _t(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    toks = ev.select(
        "user_id",
        F.row_number().over(w_seq).cast("bigint").alias("pos"),
        F.col("event_type").alias("tok"),
    )
    w_nu = Window.partitionBy("user_id", "tok").orderBy("pos")
    seq = toks.select(
        "user_id",
        "pos",
        "tok",
        F.coalesce(F.lead("pos").over(w_nu), F.lit(1000000000))
        .cast("bigint")
        .alias("nu"),
    )
    per = seq.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, tok, nu))),"
            " e -> struct(e.tok AS tok, e.nu AS nu))"
        ).alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    victim = (
        "aggregate(acc.opt,"
        " struct(CAST('' AS STRING) AS t, CAST(-1 AS BIGINT) AS nu),"
        " (b, e) -> CASE WHEN e.nu > b.nu OR (e.nu = b.nu AND e.t > b.t)"
        " THEN e ELSE b END)"
    )
    fold = F.expr(
        "aggregate(s,"
        " struct(CAST(array() AS ARRAY<STRING>) AS lru,"
        "   CAST(array() AS ARRAY<STRUCT<t: STRING, nu: BIGINT>>) AS opt,"
        "   CAST(0 AS BIGINT) AS lh, CAST(0 AS BIGINT) AS oh),"
        " (acc, g) -> struct("
        "   CASE WHEN array_contains(acc.lru, g.tok)"
        "        THEN array_prepend(filter(acc.lru, e -> e != g.tok),"
        "          g.tok)"
        "        ELSE slice(array_prepend(acc.lru, g.tok), 1, 3) END"
        "     AS lru,"
        "   CASE WHEN size(filter(acc.opt, e -> e.t = g.tok)) > 0"
        "        THEN transform(acc.opt, e -> CASE WHEN e.t = g.tok"
        "          THEN struct(g.tok AS t, g.nu AS nu) ELSE e END)"
        "        WHEN size(acc.opt) < 3"
        "        THEN array_append(acc.opt, struct(g.tok AS t, g.nu AS nu))"
        f"       ELSE array_append(filter(acc.opt,"
        f"         e -> e.t != ({victim}).t),"
        "          struct(g.tok AS t, g.nu AS nu)) END AS opt,"
        "   acc.lh + CASE WHEN array_contains(acc.lru, g.tok)"
        "     THEN 1 ELSE 0 END AS lh,"
        "   acc.oh + CASE WHEN size(filter(acc.opt, e -> e.t = g.tok)) > 0"
        "     THEN 1 ELSE 0 END AS oh))"
    )
    folded = per.select("user_id", "n", fold.alias("st"))
    return folded.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_accesses"),
        F.sum(F.col("st")["lh"]).cast("bigint").alias("lru_hits"),
        F.sum(F.col("st")["oh"]).cast("bigint").alias("opt_hits"),
        (
            F.sum(F.col("st")["lh"]).cast("double")
            / F.sum("n").cast("double")
        ).alias("lru_rate"),
        (
            F.sum(F.col("st")["oh"]).cast("double")
            / F.sum("n").cast("double")
        ).alias("opt_rate"),
        (
            F.sum(F.col("st")["oh"]) >= F.sum(F.col("st")["lh"])
        ).alias("opt_dominates"),
    )


# =====================================================================
# Round-12 staged batch 22 — distributed-systems + geometry
# mechanisms: rendezvous (HRW) hashing with the minimal-disruption
# pin, vector-clock causality classification, Douglas-Peucker
# polyline simplification with exact integer split decisions.
# Promotion target: round 13.
# =====================================================================


@staged(
    "q_rendezvous_hash",
    oracle="""
    WITH keys AS (
      SELECT DISTINCT user_id FROM events
    ),
    nodes AS (SELECT unnest(['n0', 'n1', 'n2', 'n3', 'n4']) AS node),
    weights AS (
      SELECT k.user_id, n.node,
             CAST(CAST('0x' || substring(md5(
               CAST(k.user_id AS VARCHAR) || '@' || n.node), 1, 15)
               AS BIGINT) AS BIGINT) AS w
      FROM keys k CROSS JOIN nodes n
    ),
    owner5 AS (
      SELECT user_id, node FROM (
        SELECT user_id, node,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY w DESC, node) AS rn
        FROM weights
      ) WHERE rn = 1
    ),
    owner4 AS (
      SELECT user_id, node FROM (
        SELECT user_id, node,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY w DESC, node) AS rn
        FROM weights WHERE node != 'n4'
      ) WHERE rn = 1
    ),
    moved AS (
      SELECT CAST(SUM(CASE WHEN o5.node != o4.node THEN 1 ELSE 0 END)
               AS BIGINT) AS n_moved,
             CAST(SUM(CASE WHEN o5.node != o4.node
               AND o5.node != 'n4' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_illegal_moves
      FROM owner5 o5 JOIN owner4 o4 ON o4.user_id = o5.user_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys FROM keys)
    SELECT o5.node AS node,
           CAST(COUNT(*) AS BIGINT) AS n_keys_owned,
           tot.n_keys, moved.n_moved, moved.n_illegal_moves,
           CAST(moved.n_moved AS DOUBLE) / CAST(tot.n_keys AS DOUBLE)
             AS moved_fraction
    FROM owner5 o5 CROSS JOIN tot CROSS JOIN moved
    GROUP BY o5.node, tot.n_keys, moved.n_moved, moved.n_illegal_moves
    ORDER BY node
    """,
)
def q_rendezvous_hash(spark, sf_dir):
    """RENDEZVOUS (highest-random-weight) HASHING with the
    minimal-disruption audit — the OTHER consistent-placement scheme
    (q_consistent_hashing walks a ring; HRW gives every key an
    independent per-node score and takes the argmax, no ring state
    at all): per-(key, node) weights are engine-portable md5
    integers (15 hex chars — within the exact int64 range), the
    owner is a (weight desc, node asc) argmax, and the defining HRW
    GUARANTEE is verified structurally: removing node n4 moves ONLY
    the keys n4 owned — n_illegal_moves (keys that moved while
    their owner survived) is an exact integer pinned to ZERO,
    because dropping a non-argmax row can never change an argmax
    (derived). At 100 TB: one distinct-key projection, a 5-way
    broadcast fan-out, two lattice argmaxes — no resharding state
    anywhere."""
    keys = _t(spark, sf_dir, "events").select("user_id").distinct()
    nodes = spark.createDataFrame(
        [(f"n{i}",) for i in range(5)], "node STRING"
    )
    weights = keys.crossJoin(F.broadcast(nodes)).select(
        "user_id",
        "node",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("@"),
                        F.col("node"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("w"),
    )
    weights = track_persist(weights)
    w_rank = Window.partitionBy("user_id").orderBy(F.desc("w"), "node")
    owner5 = (
        weights.select(
            "user_id", "node", F.row_number().over(w_rank).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "node")
    )
    owner4 = (
        weights.filter(F.col("node") != "n4")
        .select(
            "user_id", "node", F.row_number().over(w_rank).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("node").alias("node4"))
    )
    owner5 = track_persist(owner5)
    moved = owner5.join(owner4, "user_id").agg(
        F.sum(F.when(F.col("node") != F.col("node4"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_moved"),
        F.sum(
            F.when(
                (F.col("node") != F.col("node4"))
                & (F.col("node") != "n4"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_illegal_moves"),
    )
    tot = keys.agg(F.count("*").cast("bigint").alias("n_keys"))
    return (
        owner5.groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_keys_owned"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(moved))
        .select(
            "node",
            "n_keys_owned",
            "n_keys",
            "n_moved",
            "n_illegal_moves",
            (
                F.col("n_moved").cast("double")
                / F.col("n_keys").cast("double")
            ).alias("moved_fraction"),
        )
        .orderBy("node")
    )


@staged(
    "q_vector_clocks",
    oracle="""
    WITH clocks AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS BIGINT) AS c3,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS c4
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.d AS da, b.d AS db,
             CASE WHEN a.c0 <= b.c0 AND a.c1 <= b.c1 AND a.c2 <= b.c2
                   AND a.c3 <= b.c3 AND a.c4 <= b.c4 THEN 1 ELSE 0 END
               AS le,
             CASE WHEN b.c0 <= a.c0 AND b.c1 <= a.c1 AND b.c2 <= a.c2
                   AND b.c3 <= a.c3 AND b.c4 <= a.c4 THEN 1 ELSE 0 END
               AS ge
      FROM clocks a JOIN clocks b ON a.d < b.d
    ),
    classed AS (
      SELECT CASE WHEN le = 1 AND ge = 1 THEN 'equal'
                  WHEN le = 1 THEN 'happens_before'
                  WHEN ge = 1 THEN 'happens_after'
                  ELSE 'concurrent' END AS relation
      FROM pairs
    )
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM classed GROUP BY relation ORDER BY relation
    """,
)
def q_vector_clocks(spark, sf_dir):
    """VECTOR-CLOCK CAUSALITY CLASSIFICATION — the distributed-
    systems completion next to q_crdt_gcounter (the G-counter MERGES
    replica states; vector clocks ORDER them: component-wise <=
    defines happens-before, incomparability means concurrency): each
    day's 5 per-type event counters form a clock snapshot, every
    ordered day pair is classified by the two exact component-wise
    integer comparisons (le/ge — a 4-way partition into
    happens-before / happens-after / concurrent / equal, decided by
    integers only), and the day-pair space is the bounded 30x30
    lattice. Cumulative (true vector-clock) snapshots would make
    every pair comparable — the per-day DELTA clocks keep genuine
    concurrency visible, documented. At 100 TB: raw volume dies in
    the (day) conditional agg; the pair join is 435 rows."""
    clocks = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d")
        )
        .agg(
            *[
                F.sum(
                    F.when(F.col("event_type") == t, 1).otherwise(0)
                )
                .cast("bigint")
                .alias(f"c{i}")
                for i, t in enumerate(
                    ["click", "error", "purchase", "signup", "view"]
                )
            ]
        )
    )
    clocks = track_persist(clocks)
    a = clocks.alias("a")
    b = clocks.alias("b")
    le = F.lit(True)
    ge = F.lit(True)
    for i in range(5):
        le = le & (F.col(f"a.c{i}") <= F.col(f"b.c{i}"))
        ge = ge & (F.col(f"b.c{i}") <= F.col(f"a.c{i}"))
    pairs = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d")).select(
        le.alias("le"), ge.alias("ge")
    )
    return (
        pairs.select(
            F.when(F.col("le") & F.col("ge"), "equal")
            .when(F.col("le"), "happens_before")
            .when(F.col("ge"), "happens_after")
            .otherwise("concurrent")
            .alias("relation")
        )
        .groupBy("relation")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("relation")
    )


@staged(
    "q_douglas_peucker",
    oracle="""
    WITH daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) // 100
               AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    ends AS (
      SELECT g0.t, g0.x AS x0, g29.x AS x29
      FROM (SELECT t, x FROM grid WHERE d = 0) g0
      JOIN (SELECT t, x FROM grid WHERE d = 29) g29 ON g29.t = g0.t
    ),
    l1 AS (
      SELECT t, d, x, cr FROM (
        SELECT g.t, g.d, g.x,
               CAST(abs(29 * (g.x - ends.x0)
                 - g.d * (ends.x29 - ends.x0)) AS BIGINT) AS cr,
               row_number() OVER (PARTITION BY g.t
                 ORDER BY abs(29 * (g.x - ends.x0)
                   - g.d * (ends.x29 - ends.x0)) DESC, g.d) AS rn
        FROM grid g JOIN ends ON ends.t = g.t
        WHERE g.d > 0 AND g.d < 29
      ) WHERE rn = 1
    ),
    segs AS (
      SELECT ends.t, 0 AS seg, CAST(0 AS BIGINT) AS da, ends.x0 AS xa,
             l1.d AS db, l1.x AS xb
      FROM ends JOIN l1 ON l1.t = ends.t
      UNION ALL
      SELECT ends.t, 1, l1.d, l1.x, CAST(29 AS BIGINT), ends.x29
      FROM ends JOIN l1 ON l1.t = ends.t
    ),
    l2 AS (
      SELECT t, seg, d, x, cr FROM (
        SELECT g.t, s.seg, g.d, g.x,
               CAST(abs((s.db - s.da) * (g.x - s.xa)
                 - (g.d - s.da) * (s.xb - s.xa)) AS BIGINT) AS cr,
               row_number() OVER (PARTITION BY g.t, s.seg
                 ORDER BY abs((s.db - s.da) * (g.x - s.xa)
                   - (g.d - s.da) * (s.xb - s.xa)) DESC, g.d) AS rn
        FROM grid g JOIN segs s ON s.t = g.t
        WHERE g.d > s.da AND g.d < s.db
      ) WHERE rn = 1
    ),
    kept AS (
      SELECT t, 0 AS lvl, CAST(-1 AS BIGINT) AS seg,
             CAST(0 AS BIGINT) AS d, x0 AS x, CAST(0 AS BIGINT) AS cr
      FROM ends
      UNION ALL
      SELECT t, 0, CAST(-1 AS BIGINT), CAST(29 AS BIGINT), x29,
             CAST(0 AS BIGINT)
      FROM ends
      UNION ALL
      SELECT t, 1, CAST(-1 AS BIGINT), d, x, cr FROM l1
      UNION ALL
      SELECT t, 2, CAST(seg AS BIGINT), d, x, cr FROM l2
    )
    SELECT t, CAST(lvl AS BIGINT) AS lvl, seg, d, x, cr
    FROM kept ORDER BY t, d, lvl
    """,
)
def q_douglas_peucker(spark, sf_dir):
    """DOUGLAS-PEUCKER POLYLINE SIMPLIFICATION (depth 2) of each
    type's 30-day daily series — the geometry-family completion
    (q_shoelace_area measures polygons, q_sax_symbolize discretizes
    amplitude; DP keeps the SHAPE-CRITICAL vertices, the standard
    trajectory/line compression in GIS and telemetry): every split
    decision is the argmax of the perpendicular distance from the
    segment chord, decided EXACTLY on the integer CROSS-PRODUCT
    numerator |( db-da)(x-xa) - (d-da)(xb-xa)| (distance =
    |cross| / |chord| and the chord is constant per segment, so the
    sqrt-free argmax is derived-exact; ties to the earlier day),
    two unrolled recursion levels over the bounded day grid, kept
    vertices emitted with their exact cross numerators. At 100 TB:
    raw volume dies in the (t, day) agg; both split levels are
    150-row broadcast work."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(round(value * 100) AS BIGINT)) div 100"
                " AS BIGINT)"
            ).alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    grid = track_persist(grid)
    ends = (
        grid.filter(F.col("d") == 0)
        .select("t", F.col("x").alias("x0"))
        .join(
            F.broadcast(
                grid.filter(F.col("d") == 29).select(
                    "t", F.col("x").alias("x29")
                )
            ),
            "t",
        )
    )
    cr1 = F.abs(
        29 * (F.col("x") - F.col("x0"))
        - F.col("d") * (F.col("x29") - F.col("x0"))
    ).cast("bigint")
    w1 = Window.partitionBy("t").orderBy(
        F.desc("cr"), "d"
    )
    l1 = (
        grid.filter((F.col("d") > 0) & (F.col("d") < 29))
        .join(F.broadcast(ends), "t")
        .select("t", "d", "x", cr1.alias("cr"))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select("t", "d", "x", "cr")
    )
    l1 = track_persist(l1)
    segs = (
        ends.join(F.broadcast(l1.select("t", F.col("d").alias("md"), F.col("x").alias("mx"))), "t")
        .select(
            "t",
            F.lit(0).alias("seg"),
            F.lit(0).cast("bigint").alias("da"),
            F.col("x0").alias("xa"),
            F.col("md").alias("db"),
            F.col("mx").alias("xb"),
        )
        .unionAll(
            ends.join(
                F.broadcast(
                    l1.select(
                        "t",
                        F.col("d").alias("md"),
                        F.col("x").alias("mx"),
                    )
                ),
                "t",
            ).select(
                "t",
                F.lit(1).alias("seg"),
                F.col("md").alias("da"),
                F.col("mx").alias("xa"),
                F.lit(29).cast("bigint").alias("db"),
                F.col("x29").alias("xb"),
            )
        )
    )
    cr2 = F.abs(
        (F.col("db") - F.col("da")) * (F.col("x") - F.col("xa"))
        - (F.col("d") - F.col("da")) * (F.col("xb") - F.col("xa"))
    ).cast("bigint")
    w2 = Window.partitionBy("t", "seg").orderBy(F.desc("cr"), "d")
    l2 = (
        grid.join(F.broadcast(segs), "t")
        .filter((F.col("d") > F.col("da")) & (F.col("d") < F.col("db")))
        .select("t", "seg", "d", "x", cr2.alias("cr"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select("t", "seg", "d", "x", "cr")
    )
    kept = (
        ends.select(
            "t",
            F.lit(0).cast("bigint").alias("lvl"),
            F.lit(-1).cast("bigint").alias("seg"),
            F.lit(0).cast("bigint").alias("d"),
            F.col("x0").alias("x"),
            F.lit(0).cast("bigint").alias("cr"),
        )
        .unionAll(
            ends.select(
                "t",
                F.lit(0).cast("bigint").alias("lvl"),
                F.lit(-1).cast("bigint").alias("seg"),
                F.lit(29).cast("bigint").alias("d"),
                F.col("x29").alias("x"),
                F.lit(0).cast("bigint").alias("cr"),
            )
        )
        .unionAll(
            l1.select(
                "t",
                F.lit(1).cast("bigint").alias("lvl"),
                F.lit(-1).cast("bigint").alias("seg"),
                "d",
                "x",
                "cr",
            )
        )
        .unionAll(
            l2.select(
                "t",
                F.lit(2).cast("bigint").alias("lvl"),
                F.col("seg").cast("bigint").alias("seg"),
                "d",
                "x",
                "cr",
            )
        )
    )
    return kept.orderBy("t", "d", "lvl")


# =====================================================================
# Round-12 staged batch 23 — engine-mechanics mechanisms: Batcher
# sorting network (0-1-principle verified), Gorilla delta-of-delta
# timestamp compression cost, Roaring bitmap container selection.
# Promotion target: round 13.
# =====================================================================


def _batcher8():
    """Batcher odd-even mergesort comparator network for n = 8
    (19 comparators), generated by the textbook iterative algorithm —
    one source of truth for both engines and the witness."""
    comps = []
    p = 1
    while p < 8:
        k = p
        while k >= 1:
            for j in range(k % p, 8 - k, 2 * k):
                for i in range(0, min(k, 8 - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        comps.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return comps


def _sorting_network_oracle() -> str:
    steps = []
    prev = "s0"
    anchor = (
        "SELECT list(v ORDER BY bk) AS a FROM ("
        "SELECT CAST(user_id % 8 AS BIGINT) AS bk,"
        " CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v"
        " FROM events GROUP BY 1)"
    )
    ctes = [f"s0 AS ({anchor})"]
    for n, (lo, hi) in enumerate(_batcher8(), 1):
        ctes.append(
            f"s{n} AS (SELECT list_transform(range(1, 9), i -> CASE"
            f" WHEN i = {lo + 1} THEN least(a[{lo + 1}], a[{hi + 1}])"
            f" WHEN i = {hi + 1} THEN greatest(a[{lo + 1}], a[{hi + 1}])"
            f" ELSE a[i] END) AS a FROM s{n - 1})"
        )
        prev = f"s{n}"
    return f"""
    WITH {', '.join(ctes)}
    SELECT CAST(nn.n - 1 AS BIGINT) AS pos,
           CAST({prev}.a[nn.n] AS BIGINT) AS v,
           (SELECT {prev}.a = list_sort(s0.a) FROM s0) AS network_sorts
    FROM {prev} CROSS JOIN (SELECT unnest(range(1, 9)) AS n) nn
    ORDER BY pos
    """


@staged("q_sorting_network", oracle=_sorting_network_oracle())
def q_sorting_network(spark, sf_dir):
    """BATCHER ODD-EVEN MERGESORT NETWORK (n = 8, 19 comparators)
    applied to the 8 user-bucket cents totals — the DATA-OBLIVIOUS
    sorting mechanism (a comparator network's exchanges are fixed in
    advance: the schedule hardware sorters, SIMD kernels and
    oblivious/secure sorts run, as opposed to every comparison-
    adaptive sort in the engine): the 19 comparator swaps fold over
    the value array as min/max pairs generated FROM ONE PYTHON
    ALGORITHM for both engines (the q_gale_shapley template
    discipline), every exchange is an exact integer least/greatest,
    and the output is pinned equal to array_sort — while the WITNESS
    proves the network correct for ALL inputs via the 0-1 PRINCIPLE
    (all 256 binary vectors sort => every input sorts, Knuth 5.3.4).
    At 100 TB: one hash agg to 8 values; the network is 19 scalar
    exchanges."""
    vals = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(user_id % 8 AS BIGINT)").alias("bk"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(bk, v))),"
                " e -> e.v)"
            ).alias("orig")
        )
    )
    comps = "array(" + ", ".join(
        f"struct({lo + 1} AS lo, {hi + 1} AS hi)"
        for lo, hi in _batcher8()
    ) + ")"
    fold = F.expr(
        f"aggregate({comps}, orig,"
        " (acc, c) -> transform(sequence(1, 8), i -> CASE"
        "   WHEN i = c.lo THEN least(element_at(acc, c.lo),"
        "                            element_at(acc, c.hi))"
        "   WHEN i = c.hi THEN greatest(element_at(acc, c.lo),"
        "                               element_at(acc, c.hi))"
        "   ELSE element_at(acc, CAST(i AS INT)) END))"
    )
    net = vals.select(fold.alias("a"), "orig")
    return (
        net.select(
            F.posexplode("a").alias("pos", "v"),
            F.expr("a = array_sort(orig)").alias("network_sorts"),
        )
        .select(
            F.col("pos").cast("bigint").alias("pos"),
            F.col("v").cast("bigint").alias("v"),
            "network_sorts",
        )
        .orderBy("pos")
    )


@staged(
    "q_gorilla_cost",
    oracle="""
    WITH seq AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s,
             lag(CAST(epoch_us(ts) // 1000000 AS BIGINT), 1)
               OVER w AS p1,
             lag(CAST(epoch_us(ts) // 1000000 AS BIGINT), 2)
               OVER w AS p2
      FROM events
      WINDOW w AS (
        PARTITION BY event_type,
                     datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        ORDER BY ts, event_id)
    ),
    dod AS (
      SELECT t, (s - p1) - (p1 - p2) AS dd
      FROM seq WHERE p2 IS NOT NULL
    ),
    buckets AS (
      SELECT t,
             CASE WHEN dd = 0 THEN 'b0_zero'
                  WHEN dd BETWEEN -63 AND 64 THEN 'b1_7bit'
                  WHEN dd BETWEEN -255 AND 256 THEN 'b2_9bit'
                  WHEN dd BETWEEN -2047 AND 2048 THEN 'b3_12bit'
                  ELSE 'b4_32bit' END AS bucket,
             CASE WHEN dd = 0 THEN 1
                  WHEN dd BETWEEN -63 AND 64 THEN 9
                  WHEN dd BETWEEN -255 AND 256 THEN 12
                  WHEN dd BETWEEN -2047 AND 2048 THEN 16
                  ELSE 36 END AS bits
      FROM dod
    ),
    agg AS (
      SELECT t, bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(bits) AS BIGINT) AS bits
      FROM buckets GROUP BY t, bucket
    ),
    tots AS (
      SELECT t, CAST(SUM(n) AS BIGINT) AS n_dods,
             CAST(SUM(bits) AS BIGINT) AS dod_bits
      FROM agg GROUP BY t
    )
    SELECT agg.t AS t, agg.bucket, agg.n, agg.bits,
           tots.n_dods, tots.dod_bits,
           CAST(tots.dod_bits AS DOUBLE)
             / (64.0 * CAST(tots.n_dods AS DOUBLE)) AS compression_ratio
    FROM agg JOIN tots ON tots.t = agg.t
    ORDER BY t, bucket
    """,
)
def q_gorilla_cost(spark, sf_dir):
    """GORILLA DELTA-OF-DELTA timestamp compression accounting — the
    time-series storage costing next to q_postings_compression
    (Elias-gamma prices posting GAPS; Gorilla's variable-length
    delta-of-delta — Facebook 2015 — prices TIMESTAMP streams, the
    scheme inside every modern TSDB): per (type, day) partition the
    stream is ordered by the full (ts, event_id) tuple, two lags
    give dod = (t_i - t_{i-1}) - (t_{i-1} - t_{i-2}) on the exact
    integer-second lattice (micros div 1e6 — the q_little_law
    rounding finding), and the published bucket schedule (0 -> 1
    bit; +-7/9/12-bit windows -> 9/12/16; else 36) is a pure
    integer CASE — every bit count is an exact BIGINT, one division
    at readout vs the 64-bit raw baseline. Day-partitioned windows,
    not type-partitioned: 5 giant partitions would serialize at
    100 TB, and the two lost dods per day-boundary are the
    documented price of parallelism."""
    ev = _t(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    w = Window.partitionBy(F.col("event_type"), day).orderBy(
        "ts", "event_id"
    )
    s = F.expr("CAST(unix_micros(ts) div 1000000 AS BIGINT)")
    seq = ev.select(
        F.col("event_type").alias("t"),
        s.alias("s"),
        F.lag(s, 1).over(w).alias("p1"),
        F.lag(s, 2).over(w).alias("p2"),
    )
    dod = seq.filter(F.col("p2").isNotNull()).select(
        "t",
        (
            (F.col("s") - F.col("p1")) - (F.col("p1") - F.col("p2"))
        ).alias("dd"),
    )
    bucket = (
        F.when(F.col("dd") == 0, "b0_zero")
        .when(F.col("dd").between(-63, 64), "b1_7bit")
        .when(F.col("dd").between(-255, 256), "b2_9bit")
        .when(F.col("dd").between(-2047, 2048), "b3_12bit")
        .otherwise("b4_32bit")
    )
    bits = (
        F.when(F.col("dd") == 0, 1)
        .when(F.col("dd").between(-63, 64), 9)
        .when(F.col("dd").between(-255, 256), 12)
        .when(F.col("dd").between(-2047, 2048), 16)
        .otherwise(36)
    )
    agg = (
        dod.select("t", bucket.alias("bucket"), bits.alias("bits"))
        .groupBy("t", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("bits").cast("bigint").alias("bits"),
        )
    )
    agg = track_persist(agg)
    tots = agg.groupBy("t").agg(
        F.sum("n").cast("bigint").alias("n_dods"),
        F.sum("bits").cast("bigint").alias("dod_bits"),
    )
    return (
        agg.join(F.broadcast(tots), "t")
        .select(
            "t",
            "bucket",
            "n",
            "bits",
            "n_dods",
            "dod_bits",
            (
                F.col("dod_bits").cast("double")
                / (64.0 * F.col("n_dods").cast("double"))
            ).alias("compression_ratio"),
        )
        .orderBy("t", "bucket")
    )


@staged(
    "q_roaring_containers",
    oracle="""
    WITH ids AS (
      SELECT DISTINCT event_type AS t, CAST(event_id AS BIGINT) AS v
      FROM events
    ),
    chunked AS (
      SELECT t, CAST(v // 65536 AS BIGINT) AS chunk,
             CAST(v % 65536 AS BIGINT) AS lo
      FROM ids
    ),
    runs AS (
      SELECT t, chunk, lo,
             CASE WHEN lag(lo) OVER (PARTITION BY t, chunk ORDER BY lo)
                    = lo - 1 THEN 0 ELSE 1 END AS run_start
      FROM chunked
    ),
    stats AS (
      SELECT t, chunk,
             CAST(COUNT(*) AS BIGINT) AS card,
             CAST(SUM(run_start) AS BIGINT) AS n_runs
      FROM runs GROUP BY t, chunk
    ),
    sized AS (
      SELECT t, chunk, card, n_runs,
             CAST(2 * card AS BIGINT) AS array_bytes,
             CAST(8192 AS BIGINT) AS bitmap_bytes,
             CAST(2 + 4 * n_runs AS BIGINT) AS run_bytes
      FROM stats
    )
    SELECT t, chunk, card, n_runs, array_bytes, bitmap_bytes, run_bytes,
           CASE WHEN run_bytes < LEAST(array_bytes, bitmap_bytes)
                  THEN 'run'
                WHEN card <= 4096 THEN 'array'
                ELSE 'bitmap' END AS container,
           CAST(LEAST(run_bytes, array_bytes, bitmap_bytes) AS BIGINT)
             AS best_bytes
    FROM sized ORDER BY t, chunk
    """,
)
def q_roaring_containers(spark, sf_dir):
    """ROARING BITMAP CONTAINER SELECTION — the codec decision
    inside the industry-standard compressed bitmap (q_bitmap_rollup
    does the 64-bit OR algebra; real roaring splits the id space
    into 65536-value chunks and picks array (2 bytes/value, cap
    4096), bitmap (fixed 8 KiB) or run (4 bytes/run + 2) PER CHUNK
    — Chambi et al. 2016): distinct per-type event ids chunk by
    v div 65536, run counts come from ONE lag per (t, chunk)
    partition (a run starts where the predecessor isn't v-1 — an
    exact integer predicate), and every byte cost and the
    container verdict are integer CASE decisions — the actual
    roaring heuristic, never a float. At 100 TB: one distinct
    projection, one partitioned lag, one hash agg — the same shape
    as a real bitmap build."""
    ids = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("t"),
            F.col("event_id").cast("bigint").alias("v"),
        )
        .distinct()
    )
    chunked = ids.select(
        "t",
        F.expr("CAST(v div 65536 AS BIGINT)").alias("chunk"),
        (F.col("v") % 65536).cast("bigint").alias("lo"),
    )
    w = Window.partitionBy("t", "chunk").orderBy("lo")
    runs = chunked.select(
        "t",
        "chunk",
        F.when(F.lag("lo").over(w) == F.col("lo") - 1, 0)
        .otherwise(1)
        .alias("run_start"),
    )
    stats = runs.groupBy("t", "chunk").agg(
        F.count("*").cast("bigint").alias("card"),
        F.sum("run_start").cast("bigint").alias("n_runs"),
    )
    sized = stats.select(
        "t",
        "chunk",
        "card",
        "n_runs",
        (2 * F.col("card")).cast("bigint").alias("array_bytes"),
        F.lit(8192).cast("bigint").alias("bitmap_bytes"),
        (2 + 4 * F.col("n_runs")).cast("bigint").alias("run_bytes"),
    )
    return sized.select(
        "t",
        "chunk",
        "card",
        "n_runs",
        "array_bytes",
        "bitmap_bytes",
        "run_bytes",
        F.when(
            F.col("run_bytes")
            < F.least("array_bytes", "bitmap_bytes"),
            "run",
        )
        .when(F.col("card") <= 4096, "array")
        .otherwise("bitmap")
        .alias("container"),
        F.least("run_bytes", "array_bytes", "bitmap_bytes")
        .cast("bigint")
        .alias("best_bytes"),
    ).orderBy("t", "chunk")


# =====================================================================
# Round-12 staged batch 24 — control & simulation folds: integer PID
# controller, AIMD congestion window, discrete SIR epidemic. All
# exact-integer sequential recurrences (q_stream_ewma discipline)
# with recursive-CTE oracle replays. Promotion target: round 13.
# =====================================================================


@staged(
    "q_pid_control",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    grid AS (
      SELECT dd.d, CAST(COALESCE(daily.y, 0) AS BIGINT) AS y
      FROM (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.d = dd.d
    ),
    sp AS (
      SELECT CAST((SELECT SUM(y) FROM grid) // 30 AS BIGINT) AS setpoint
    ),
    rec AS (
      SELECT -1 AS k, CAST(0 AS BIGINT) AS e, CAST(0 AS BIGINT) AS i,
             CAST(0 AS BIGINT) AS u
      UNION ALL
      SELECT rec.k + 1,
             sp.setpoint - g.y,
             rec.i + (sp.setpoint - g.y),
             (50 * (sp.setpoint - g.y)
              + 10 * (rec.i + (sp.setpoint - g.y))
              + 20 * ((sp.setpoint - g.y) - rec.e)) // 100
      FROM rec CROSS JOIN sp JOIN grid g ON g.d = rec.k + 1
      WHERE rec.k < 29
    )
    SELECT CAST(rec.k AS BIGINT) AS d, rec.e AS error,
           rec.i AS integral, rec.u AS control,
           sp.setpoint
    FROM rec CROSS JOIN sp WHERE rec.k >= 0 ORDER BY d
    """,
)
def q_pid_control(spark, sf_dir):
    """PID CONTROLLER replay on the daily error-event count — the
    control-systems family opener (q_token_bucket rate-limits,
    q_sliding_rate_limit gates; a PID CLOSES THE LOOP: proportional
    + integral + derivative of the tracking error, the controller
    inside every autoscaler and thermostat): setpoint = the 30-day
    mean count (integer div), per-day error / integral / derivative
    are exact BIGINTs, and the control output u = (50e + 10*I +
    20*de) div 100 keeps the FROZEN centi-gains (Kp=0.5, Ki=0.1,
    Kd=0.2) on the integer lattice — negative operands DO reach the
    division here, and the MEASURED cross-engine fact (caught by
    this query's own sf0.001 gate) is that BOTH DuckDB's // and
    Spark's div TRUNCATE TOWARD ZERO on negatives, while a
    floor()-of-float-division detour floors (-290/100: div -> -2,
    floor -> -3) — so the recurrence uses div verbatim on both
    engines and the q_elo_ratings shift-nonneg trick is the
    defensive alternative, not a necessity. One F.aggregate fold
    over the zero-filled grid.
    At 100 TB: raw volume dies in the day agg; the fold is 30
    steps."""
    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d")
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    grid = (
        spark.range(30)
        .select(F.col("id").alias("d"))
        .join(F.broadcast(daily), ["d"], "left")
        .select("d", F.coalesce("y", F.lit(0)).cast("bigint").alias("y"))
    )
    per = grid.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, y))), e -> e.y)"
        ).alias("ys"),
        F.expr("CAST(SUM(y) div 30 AS BIGINT)").alias("setpoint"),
    )
    fold = F.expr(
        "aggregate(ys,"
        " struct(CAST(0 AS BIGINT) AS e, CAST(0 AS BIGINT) AS i,"
        "   CAST(array() AS"
        "     ARRAY<STRUCT<e: BIGINT, i: BIGINT, u: BIGINT>>) AS rows),"
        " (acc, y) -> struct("
        "   setpoint - y AS e,"
        "   acc.i + (setpoint - y) AS i,"
        "   array_append(acc.rows, struct("
        "     setpoint - y AS e,"
        "     acc.i + (setpoint - y) AS i,"
        "     CAST((50 * (setpoint - y)"
        "       + 10 * (acc.i + (setpoint - y))"
        "       + 20 * ((setpoint - y) - acc.e)) div 100 AS BIGINT)"
        "       AS u)) AS rows))"
        ".rows"
    )
    return (
        per.select("setpoint", fold.alias("rows"))
        .select("setpoint", F.posexplode("rows").alias("d", "r"))
        .select(
            F.col("d").cast("bigint").alias("d"),
            F.col("r")["e"].alias("error"),
            F.col("r")["i"].alias("integral"),
            F.col("r")["u"].alias("control"),
            "setpoint",
        )
        .orderBy("d")
    )


@staged(
    "q_aimd_congestion",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS errs
      FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    grid AS (
      SELECT dd.d, CAST(COALESCE(daily.errs, 0) AS BIGINT) AS errs
      FROM (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.d = dd.d
    ),
    thr AS (
      SELECT CAST((SELECT SUM(errs) FROM grid) // 30 AS BIGINT) AS bar
    ),
    rec AS (
      SELECT -1 AS k, CAST(10 AS BIGINT) AS cwnd,
             CAST(0 AS BIGINT) AS n_losses
      UNION ALL
      SELECT rec.k + 1,
             CASE WHEN g.errs > thr.bar
                  THEN GREATEST(rec.cwnd // 2, 1)
                  ELSE rec.cwnd + 1 END,
             rec.n_losses + CASE WHEN g.errs > thr.bar THEN 1 ELSE 0 END
      FROM rec CROSS JOIN thr JOIN grid g ON g.d = rec.k + 1
      WHERE rec.k < 29
    )
    SELECT CAST(rec.k AS BIGINT) AS d,
           CAST(g.errs AS BIGINT) AS errs,
           (g.errs > thr.bar) AS loss,
           rec.cwnd, rec.n_losses, thr.bar
    FROM rec CROSS JOIN thr JOIN grid g ON g.d = rec.k
    WHERE rec.k >= 0 ORDER BY d
    """,
)
def q_aimd_congestion(spark, sf_dir):
    """AIMD CONGESTION WINDOW replay (TCP's additive-increase /
    multiplicative-decrease) driven by daily error spikes — the
    networking-control companion to q_pid_control (PID is
    continuous correction; AIMD is the sawtooth that made the
    internet stable, Chiu-Jain 1989): a loss day is errs > the
    30-day integer-mean bar (an exact integer cut), the window
    halves on loss (cwnd div 2, floored at 1 — all operands
    NONNEGATIVE so floor = truncate on both engines, the
    q_croston discipline) and adds one otherwise, folded day by
    day in ONE F.aggregate; loss counts are exact. The sawtooth is
    emitted per day with its driving signal. At 100 TB: raw
    volume dies in the day agg; the fold is 30 steps."""
    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d")
        )
        .agg(F.count("*").cast("bigint").alias("errs"))
    )
    grid = (
        spark.range(30)
        .select(F.col("id").alias("d"))
        .join(F.broadcast(daily), ["d"], "left")
        .select(
            "d", F.coalesce("errs", F.lit(0)).cast("bigint").alias("errs")
        )
    )
    per = grid.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, errs))),"
            " e -> e.errs)"
        ).alias("es"),
        F.expr("CAST(SUM(errs) div 30 AS BIGINT)").alias("bar"),
    )
    fold = F.expr(
        "aggregate(es,"
        " struct(CAST(10 AS BIGINT) AS cwnd, CAST(0 AS BIGINT) AS nl,"
        "   CAST(array() AS ARRAY<STRUCT<cwnd: BIGINT, nl: BIGINT>>)"
        "     AS rows),"
        " (acc, e) -> struct("
        "   CASE WHEN e > bar THEN greatest(acc.cwnd div 2, 1)"
        "        ELSE acc.cwnd + 1 END AS cwnd,"
        "   acc.nl + CASE WHEN e > bar THEN 1 ELSE 0 END AS nl,"
        "   array_append(acc.rows, struct("
        "     CASE WHEN e > bar THEN greatest(acc.cwnd div 2, 1)"
        "          ELSE acc.cwnd + 1 END AS cwnd,"
        "     acc.nl + CASE WHEN e > bar THEN 1 ELSE 0 END AS nl))"
        "     AS rows))"
        ".rows"
    )
    return (
        per.select("bar", fold.alias("rows"))
        .select("bar", F.posexplode("rows").alias("d", "r"))
        .join(F.broadcast(grid), "d")
        .select(
            F.col("d").cast("bigint").alias("d"),
            "errs",
            (F.col("errs") > F.col("bar")).alias("loss"),
            F.col("r")["cwnd"].alias("cwnd"),
            F.col("r")["nl"].alias("n_losses"),
            "bar",
        )
        .orderBy("d")
    )


@staged(
    "q_sir_epidemic",
    oracle="""
    WITH RECURSIVE seed AS (
      SELECT CAST(10000 AS BIGINT) AS n,
             CAST(GREATEST(
               (SELECT COUNT(*) FROM events
                WHERE event_type = 'error'
                  AND datediff('day', DATE '2024-01-01',
                        CAST(ts AS DATE)) = 0) % 100, 1) AS BIGINT) AS i0
    ),
    rec AS (
      SELECT 0 AS k, n - i0 AS s, i0 AS i, CAST(0 AS BIGINT) AS r
      FROM seed
      UNION ALL
      SELECT k + 1,
             s - (3 * s * i) // (2 * 10000),
             i + (3 * s * i) // (2 * 10000) - i // 4,
             r + i // 4
      FROM rec WHERE k < 30
    )
    SELECT CAST(k AS BIGINT) AS day, s AS susceptible, i AS infected,
           r AS recovered, CAST(s + i + r AS BIGINT) AS total
    FROM rec ORDER BY day
    """,
)
def q_sir_epidemic(spark, sf_dir):
    """DISCRETE SIR EPIDEMIC simulation seeded from the data — the
    compartmental-model family opener (q_hazard_rate measures decay
    from data; SIR FORWARD-SIMULATES contagion, the R0 = beta/gamma
    = 6 textbook dynamics on a population of 10,000): day-0
    infections seed from the fixture's day-0 error count (mod 100,
    floored at 1 — an exact integer), and the recurrence
    new_inf = (3*S*I) div 20000, recov = I div 4 runs 30 steps as
    ONE F.aggregate fold with every compartment an exact BIGINT
    (all operands nonnegative — div is floor on both engines; S*I
    <= 1e8 so the product is exact). CONSERVATION is structural:
    S+I+R = N at every step because the recurrence only moves the
    same computed quanta between compartments — witness-pinned
    per step. At 100 TB: the seed agg kills the raw volume; the
    fold is 30 steps over 3 integers."""
    seed = (
        _t(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "error")
            & (
                F.datediff(
                    F.col("ts").cast("date"),
                    F.lit("2024-01-01").cast("date"),
                )
                == 0
            )
        )
        .agg(
            F.greatest(
                F.count("*").cast("bigint") % 100, F.lit(1)
            )
            .cast("bigint")
            .alias("i0")
        )
    )
    fold = F.expr(
        "aggregate(sequence(1, 30),"
        " struct(CAST(10000 - i0 AS BIGINT) AS s, i0 AS i,"
        "   CAST(0 AS BIGINT) AS r,"
        "   array(struct(CAST(10000 - i0 AS BIGINT) AS s,"
        "     i0 AS i, CAST(0 AS BIGINT) AS r)) AS rows),"
        " (acc, k) -> struct("
        "   acc.s - (3 * acc.s * acc.i) div 20000 AS s,"
        "   acc.i + (3 * acc.s * acc.i) div 20000 - acc.i div 4 AS i,"
        "   acc.r + acc.i div 4 AS r,"
        "   array_append(acc.rows, struct("
        "     acc.s - (3 * acc.s * acc.i) div 20000 AS s,"
        "     acc.i + (3 * acc.s * acc.i) div 20000 - acc.i div 4 AS i,"
        "     acc.r + acc.i div 4 AS r)) AS rows))"
        ".rows"
    )
    return (
        seed.select(fold.alias("rows"))
        .select(F.posexplode("rows").alias("day", "r"))
        .select(
            F.col("day").cast("bigint").alias("day"),
            F.col("r")["s"].alias("susceptible"),
            F.col("r")["i"].alias("infected"),
            F.col("r")["r"].alias("recovered"),
            (F.col("r")["s"] + F.col("r")["i"] + F.col("r")["r"])
            .cast("bigint")
            .alias("total"),
        )
        .orderBy("day")
    )


# =====================================================================
# Round-12 staged batch 25 — finance/risk completions: Sharpe &
# Sortino ratios, Kupiec proportion-of-failures VaR backtest
# (out-of-sample), and first- vs second-price auction revenue.
# Promotion target: round 13.
# =====================================================================


@staged(
    "q_sharpe_sortino",
    oracle="""
    WITH daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) // 100
               AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    rets AS (
      SELECT t, d, x - lag(x) OVER (PARTITION BY t ORDER BY d) AS r
      FROM grid
    ),
    gs AS (
      SELECT t, CAST(COUNT(r) AS BIGINT) AS n,
             CAST(SUM(r) AS BIGINT) AS s,
             CAST(SUM(r * r) AS BIGINT) AS ss,
             CAST(SUM(CASE WHEN r < 0 THEN r * r ELSE 0 END) AS BIGINT)
               AS ssd,
             CAST(SUM(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_down
      FROM rets GROUP BY t
    )
    SELECT t, n, s, ss, ssd, n_down,
           CAST(s AS DOUBLE) / n AS mean_ret,
           (CAST(s AS DOUBLE) / n)
             / sqrt(CAST(n * ss - s * s AS DOUBLE)
                    / (CAST(n AS DOUBLE) * (n - 1.0))) AS sharpe,
           CASE WHEN ssd = 0 THEN 0.0 ELSE
             (CAST(s AS DOUBLE) / n)
               / sqrt(CAST(ssd AS DOUBLE) / CAST(n AS DOUBLE)) END
             AS sortino
    FROM gs ORDER BY t
    """,
)
def q_sharpe_sortino(spark, sf_dir):
    """SHARPE AND SORTINO RATIOS over daily dollar changes per type —
    the risk-adjusted-return pair that completes the finance-metrics
    family (q_drawdown prices path risk, the staged q_cvar_es the
    tail; Sharpe divides mean return by TOTAL volatility, Sortino
    only by DOWNSIDE volatility — the difference IS the skew story):
    returns are exact integer day-over-day differences (one lag
    over the zero-filled grid), all five sufficient statistics
    (n, S, SS, downside-SS, downside count) are exact BIGINTs in
    ONE conditional agg, both ratios are identical double chains
    (sample-stdev denominator n*SS - S^2 — the q_deming_regression
    moment form), and the no-downside degenerate case is decided by
    an integer = 0. At 100 TB: raw volume dies in the (t, day)
    agg; the lag runs over the bounded grid."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(round(value * 100) AS BIGINT)) div 100"
                " AS BIGINT)"
            ).alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    w = Window.partitionBy("t").orderBy("d")
    rets = grid.select(
        "t", (F.col("x") - F.lag("x").over(w)).alias("r")
    ).filter(F.col("r").isNotNull())
    gs = rets.groupBy("t").agg(
        F.count("r").cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("s"),
        F.sum(F.col("r") * F.col("r")).cast("bigint").alias("ss"),
        F.sum(F.when(F.col("r") < 0, F.col("r") * F.col("r")).otherwise(0))
        .cast("bigint")
        .alias("ssd"),
        F.sum(F.when(F.col("r") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_down"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
        / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
    )
    dd = F.sqrt(F.col("ssd").cast("double") / F.col("n").cast("double"))
    return gs.select(
        "t",
        "n",
        "s",
        "ss",
        "ssd",
        "n_down",
        mean.alias("mean_ret"),
        (mean / sd).alias("sharpe"),
        F.when(F.col("ssd") == 0, F.lit(0.0))
        .otherwise(mean / dd)
        .alias("sortino"),
    ).orderBy("t")


@staged(
    "q_kupiec_backtest",
    oracle="""
    WITH base AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    train AS (SELECT t, v FROM base WHERE d < 15),
    vh AS (
      SELECT t, v, CAST(COUNT(*) AS BIGINT) AS c FROM train GROUP BY t, v
    ),
    ns AS (SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM vh GROUP BY t),
    var95 AS (
      SELECT t, CAST(MIN(v) AS BIGINT) AS var_cents FROM (
        SELECT vh.t, vh.v,
               SUM(vh.c) OVER (PARTITION BY vh.t ORDER BY vh.v) AS cm,
               ns.n
        FROM vh JOIN ns ON ns.t = vh.t
      ) WHERE cm >= (19 * n + 19) // 20 GROUP BY t
    ),
    test AS (
      SELECT base.t,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN base.v > var95.var_cents THEN 1 ELSE 0
               END) AS BIGINT) AS x
      FROM base JOIN var95 ON var95.t = base.t
      WHERE base.d >= 15 GROUP BY base.t
    )
    SELECT test.t AS t, var95.var_cents, test.n_test, test.x,
           CAST(x AS DOUBLE) / n_test AS breach_rate,
           CASE WHEN x = 0 OR x = n_test THEN 0.0 ELSE
             -2.0 * (CAST(n_test - x AS DOUBLE) * ln(0.95)
                     + CAST(x AS DOUBLE) * ln(0.05)
                     - CAST(n_test - x AS DOUBLE)
                       * ln(1.0 - CAST(x AS DOUBLE) / n_test)
                     - CAST(x AS DOUBLE)
                       * ln(CAST(x AS DOUBLE) / n_test)) END AS lr_pof,
           (CASE WHEN x = 0 OR x = n_test THEN 0.0 ELSE
             -2.0 * (CAST(n_test - x AS DOUBLE) * ln(0.95)
                     + CAST(x AS DOUBLE) * ln(0.05)
                     - CAST(n_test - x AS DOUBLE)
                       * ln(1.0 - CAST(x AS DOUBLE) / n_test)
                     - CAST(x AS DOUBLE)
                       * ln(CAST(x AS DOUBLE) / n_test)) END
            > 3.841) AS reject
    FROM test JOIN var95 ON var95.t = test.t
    ORDER BY t
    """,
)
def q_kupiec_backtest(spark, sf_dir):
    """KUPIEC PROPORTION-OF-FAILURES VaR BACKTEST, genuinely
    OUT-OF-SAMPLE — the model-validation completion of the staged
    q_cvar_es (estimating VaR is half the job; Basel requires
    BACKTESTING it, and Kupiec's likelihood ratio is the standard
    gate): VaR95 is fitted by exact lattice counting on the FIRST
    15 days only (the q_cvar_es selection verbatim, restricted),
    breaches are counted on the LAST 15 days (an exact integer cut
    against held-out data — in-sample backtests pass by
    construction, documented), the LR statistic is ONE identical
    double chain over the exact (x, n) pair, the degenerate
    x ∈ {0, n} likelihoods are decided by integers (not NaN·ln(0)),
    and the chi-square(1) alpha=0.05 verdict compares the identical
    chain on both engines. At 100 TB: two scans' worth of hash
    aggs; the window runs on the bounded train lattice."""
    base = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("d"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    base = track_persist(base)
    train = base.filter(F.col("d") < 15)
    vh = train.groupBy("t", "v").agg(
        F.count("*").cast("bigint").alias("c")
    )
    ns = vh.groupBy("t").agg(F.sum("c").cast("bigint").alias("n"))
    wcum = (
        Window.partitionBy("t")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    var95 = (
        vh.select("t", "v", F.sum("c").over(wcum).alias("cm"))
        .join(F.broadcast(ns), "t")
        .filter(F.col("cm") >= F.expr("(19 * n + 19) div 20"))
        .groupBy("t")
        .agg(F.min("v").cast("bigint").alias("var_cents"))
    )
    test = (
        base.filter(F.col("d") >= 15)
        .join(F.broadcast(var95), "t")
        .groupBy("t")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(
                F.when(F.col("v") > F.col("var_cents"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
        )
    )
    xd = F.col("x").cast("double")
    nd = F.col("n_test").cast("double")
    lr = -2.0 * (
        (nd - xd) * F.log(F.lit(0.95))
        + xd * F.log(F.lit(0.05))
        - (nd - xd) * F.log(1.0 - xd / nd)
        - xd * F.log(xd / nd)
    )
    lr_guarded = F.when(
        (F.col("x") == 0) | (F.col("x") == F.col("n_test")), F.lit(0.0)
    ).otherwise(lr)
    return (
        test.join(F.broadcast(var95), "t")
        .select(
            "t",
            "var_cents",
            "n_test",
            "x",
            (xd / nd).alias("breach_rate"),
            lr_guarded.alias("lr_pof"),
            (lr_guarded > 3.841).alias("reject"),
        )
        .orderBy("t")
    )


@staged(
    "q_second_price_auction",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             event_type AS t,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS b
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT d, t, b,
             row_number() OVER (PARTITION BY d ORDER BY b DESC, t) AS rn
      FROM daily
    ),
    auctions AS (
      SELECT w.d, w.t AS winner, w.b AS first_price,
             CAST(COALESCE(s.b, 0) AS BIGINT) AS second_price
      FROM (SELECT d, t, b FROM ranked WHERE rn = 1) w
      LEFT JOIN (SELECT d, b FROM ranked WHERE rn = 2) s ON s.d = w.d
    ),
    tot AS (
      SELECT CAST(SUM(first_price) AS BIGINT) AS fp_revenue,
             CAST(SUM(second_price) AS BIGINT) AS sp_revenue,
             CAST(SUM(first_price - second_price) AS BIGINT)
               AS winner_surplus
      FROM auctions
    )
    SELECT auctions.d, auctions.winner, auctions.first_price,
           auctions.second_price, tot.fp_revenue, tot.sp_revenue,
           tot.winner_surplus
    FROM auctions CROSS JOIN tot
    ORDER BY d
    """,
)
def q_second_price_auction(spark, sf_dir):
    """FIRST- vs SECOND-PRICE AUCTION revenue over 30 daily auctions
    (types bid their exact daily cents) — the single-item
    mechanism-design companion to the staged q_double_auction
    (Vickrey 1961: charging the SECOND price makes truthful bidding
    dominant; the column-by-column gap fp - sp is exactly the
    winner's information rent): winner and both prices come from
    one (bid desc, t asc) ranking per day — integer-decided — and
    the sole-bidder degenerate day reads second price 0 via a
    left-join COALESCE. Revenues and the aggregate surplus are
    exact BIGINT sums. At 100 TB: raw volume dies in the (day,
    type) agg; the auction logic is 150-row window work."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
            F.col("event_type").alias("t"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("b")
        )
    )
    w_day = Window.partitionBy("d").orderBy(F.desc("b"), "t")
    ranked = daily.select(
        "d", "t", "b", F.row_number().over(w_day).alias("rn")
    )
    ranked = track_persist(ranked)
    wtop = ranked.filter(F.col("rn") == 1).select(
        "d", F.col("t").alias("winner"), F.col("b").alias("first_price")
    )
    second = ranked.filter(F.col("rn") == 2).select(
        "d", F.col("b").alias("sp")
    )
    auctions = wtop.join(F.broadcast(second), "d", "left").select(
        "d",
        "winner",
        "first_price",
        F.coalesce("sp", F.lit(0)).cast("bigint").alias("second_price"),
    )
    auctions = track_persist(auctions)
    tot = auctions.agg(
        F.sum("first_price").cast("bigint").alias("fp_revenue"),
        F.sum("second_price").cast("bigint").alias("sp_revenue"),
        F.sum(F.col("first_price") - F.col("second_price"))
        .cast("bigint")
        .alias("winner_surplus"),
    )
    return (
        auctions.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "winner",
            "first_price",
            "second_price",
            "fp_revenue",
            "sp_revenue",
            "winner_surplus",
        )
        .orderBy("d")
    )


# =====================================================================
# Round-12 staged batch 26 — sequence DP (longest increasing
# subsequence), numerical quadrature (composite Simpson vs
# trapezoid), and multivariate control (Hotelling T^2 with the
# closed-form 2x2 inverse). Promotion target: round 13.
# =====================================================================


@staged(
    "q_lis_dp",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    series AS (
      SELECT t, list(x ORDER BY d) AS xs FROM grid GROUP BY t
    ),
    rec AS (
      SELECT t, xs, 0 AS k, CAST([] AS BIGINT[]) AS lis
      FROM series
      UNION ALL
      SELECT t, xs, k + 1,
             list_append(lis,
               1 + COALESCE(list_max(list_transform(range(1, k + 1),
                 j -> CASE WHEN xs[j] < xs[k + 1]
                      THEN lis[j] ELSE 0 END)), 0))
      FROM rec WHERE k < 30
    )
    SELECT t, CAST(list_max(lis) AS BIGINT) AS lis_len,
           CAST(list_position(lis, list_max(lis)) AS BIGINT) AS ends_at,
           CAST(30 AS BIGINT) AS n
    FROM rec WHERE k = 30 ORDER BY t
    """,
)
def q_lis_dp(spark, sf_dir):
    """LONGEST STRICTLY-INCREASING SUBSEQUENCE of each type's daily
    series by the quadratic DP — the order-structure completion of
    the sequence family (q_kadane_max_subarray finds the best
    CONTIGUOUS run, the staged q_turning_points counts direction
    flips; LIS measures how much of the series is monotone AT ALL,
    the Erdős–Szekeres quantity): lis[i] = 1 + max over j < i with
    x[j] < x[i], computed as an inner fold over the accumulated
    prefix inside ONE F.aggregate per type (the q_edit_distance_dp
    nested-fold discipline) — every cell exact BIGINT, ties and the
    first-max end position integer-decided. The witness replays the
    DP AND pins the Erdős–Szekeres bound (LIS * LDS >= n holds in
    the weak form LIS >= 1). At 100 TB: raw volume dies in the
    (t, day) agg; the DP is 30^2/2 scalar steps per type."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    series = grid.groupBy("t").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, x))), e -> e.x)"
        ).alias("xs")
    )
    lis = F.expr(
        "aggregate(sequence(1, 30), CAST(array() AS ARRAY<BIGINT>),"
        " (acc, k) -> array_append(acc,"
        "   1 + aggregate(CASE WHEN k = 1 THEN CAST(array() AS"
        "         ARRAY<BIGINT>) ELSE sequence(CAST(1 AS BIGINT),"
        "         CAST(k - 1 AS BIGINT)) END, CAST(0 AS BIGINT),"
        "     (m, j) -> CASE WHEN element_at(xs, CAST(j AS INT))"
        "         < element_at(xs, CAST(k AS INT))"
        "         AND element_at(acc, CAST(j AS INT)) > m"
        "       THEN element_at(acc, CAST(j AS INT)) ELSE m END)))"
    )
    return series.select("t", lis.alias("lis")).select(
        "t",
        F.expr("CAST(array_max(lis) AS BIGINT)").alias("lis_len"),
        F.expr(
            "CAST(array_position(lis, array_max(lis)) AS BIGINT)"
        ).alias("ends_at"),
        F.lit(30).cast("bigint").alias("n"),
    ).orderBy("t")


@staged(
    "q_quadrature_simpson",
    oracle="""
    WITH daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 29)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    weighted AS (
      SELECT t,
             CAST(SUM(x * CASE WHEN d = 0 OR d = 28 THEN 1
                               WHEN d % 2 = 1 THEN 4 ELSE 2 END)
               AS BIGINT) AS simpson_num,
             CAST(SUM(x * CASE WHEN d = 0 OR d = 28 THEN 1 ELSE 2 END)
               AS BIGINT) AS trap_num,
             CAST(SUM(x) AS BIGINT) AS total
      FROM grid GROUP BY t
    )
    SELECT t, simpson_num, trap_num, total,
           CAST(simpson_num AS DOUBLE) / 3.0 AS simpson_integral,
           CAST(trap_num AS DOUBLE) / 2.0 AS trapezoid_integral,
           CAST(simpson_num AS DOUBLE) / 3.0
             - CAST(trap_num AS DOUBLE) / 2.0 AS rule_gap
    FROM weighted ORDER BY t
    """,
)
def q_quadrature_simpson(spark, sf_dir):
    """COMPOSITE SIMPSON vs TRAPEZOID QUADRATURE of the daily-cents
    curve over the 29-day even-panel window — the numerical-
    integration mechanism (q_time_weighted_avg integrates
    STEP functions exactly; quadrature rules integrate SAMPLED
    curves, and the Simpson-trapezoid gap is the classic
    curvature diagnostic — zero iff the samples are locally
    linear): both rules reduce to EXACT integer weighted sums
    (Simpson's 1-4-2-...-4-1 and trapezoid's 1-2-...-2-1 patterns
    as integer CASE weights over the zero-filled grid; 29 points =
    14 even panels, the parity condition Simpson requires —
    documented), with the h/3 and h/2 scalings left as two single
    divisions at readout. The witness recomputes both rules AND
    pins the algebraic identity 2*simpson_num - 3*trap_num =
    2*sum(odd) - 2*sum(even interior) ... spelled concretely:
    both weighted sums are linear in the same exact samples. At
    100 TB: one hash agg with constant-size state."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(29).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    sw = (
        F.when((F.col("d") == 0) | (F.col("d") == 28), 1)
        .when(F.col("d") % 2 == 1, 4)
        .otherwise(2)
    )
    tw = F.when((F.col("d") == 0) | (F.col("d") == 28), 1).otherwise(2)
    weighted = grid.groupBy("t").agg(
        F.sum(F.col("x") * sw).cast("bigint").alias("simpson_num"),
        F.sum(F.col("x") * tw).cast("bigint").alias("trap_num"),
        F.sum("x").cast("bigint").alias("total"),
    )
    return weighted.select(
        "t",
        "simpson_num",
        "trap_num",
        "total",
        (F.col("simpson_num").cast("double") / 3.0).alias(
            "simpson_integral"
        ),
        (F.col("trap_num").cast("double") / 2.0).alias(
            "trapezoid_integral"
        ),
        (
            F.col("simpson_num").cast("double") / 3.0
            - F.col("trap_num").cast("double") / 2.0
        ).alias("rule_gap"),
    ).orderBy("t")


@staged(
    "q_hotelling_t2",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CASE WHEN event_type = 'click'
               THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) // 100
               AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'view'
               THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) // 100
               AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    gs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM daily
    ),
    mom AS (
      SELECT n, sx, sy,
             CAST(n * sxx - sx * sx AS BIGINT) AS a,
             CAST(n * syy - sy * sy AS BIGINT) AS c,
             CAST(n * sxy - sx * sy AS BIGINT) AS b
      FROM gs
    ),
    pts AS (
      SELECT daily.d, daily.x, daily.y, mom.n, mom.sx, mom.sy,
             mom.a, mom.b, mom.c,
             CAST(mom.n * daily.x - mom.sx AS BIGINT) AS u,
             CAST(mom.n * daily.y - mom.sy AS BIGINT) AS v
      FROM daily CROSS JOIN mom
    )
    SELECT d, x, y,
           CAST(c * u * u - 2 * b * u * v + a * v * v AS HUGEINT)
             AS t2_num,
           CAST(a AS HUGEINT) * CAST(c AS HUGEINT)
             - CAST(b AS HUGEINT) * CAST(b AS HUGEINT) AS det_scaled,
           CAST(n - 1 AS BIGINT) AS dof,
           CAST(CAST(c AS HUGEINT) * CAST(u AS HUGEINT)
                  * CAST(u AS HUGEINT)
                - CAST(2 AS HUGEINT) * CAST(b AS HUGEINT)
                  * CAST(u AS HUGEINT) * CAST(v AS HUGEINT)
                + CAST(a AS HUGEINT) * CAST(v AS HUGEINT)
                  * CAST(v AS HUGEINT) AS DOUBLE)
             * (CAST(n AS DOUBLE) - 1.0)
             / (CAST(CAST(a AS HUGEINT) * CAST(c AS HUGEINT)
                 - CAST(b AS HUGEINT) * CAST(b AS HUGEINT) AS DOUBLE)
                * CAST(n AS DOUBLE)) AS t2,
           (CAST(1000 AS HUGEINT)
              * CAST(CAST(n - 1 AS HUGEINT)
                * (CAST(c AS HUGEINT) * CAST(u AS HUGEINT)
                     * CAST(u AS HUGEINT)
                   - CAST(2 AS HUGEINT) * CAST(b AS HUGEINT)
                     * CAST(u AS HUGEINT) * CAST(v AS HUGEINT)
                   + CAST(a AS HUGEINT) * CAST(v AS HUGEINT)
                     * CAST(v AS HUGEINT)) AS HUGEINT)
            > CAST(13816 AS HUGEINT) * CAST(n AS HUGEINT)
              * (CAST(a AS HUGEINT) * CAST(c AS HUGEINT)
                 - CAST(b AS HUGEINT) * CAST(b AS HUGEINT)))
             AS out_of_control
    FROM pts ORDER BY d
    """,
)
def q_hotelling_t2(spark, sf_dir):
    """HOTELLING T^2 multivariate control chart over the daily
    (click, view) dollar vector — the 2-D completion of
    q_spc_control_chart (two univariate charts miss CORRELATED
    excursions; T^2 whitens by the full covariance, the
    multivariate-SPC standard): with the closed-form 2x2 inverse,
    T^2 = (n-1) * (c*u^2 - 2b*uv + a*v^2) / (n * (ac - b^2)) where
    u = n*x - Sx, v = n*y - Sy and a, b, c are the exact centered
    second moments (the q_deming_regression / q_pca_closed_form
    lattice) — the quadratic-form numerator and the scaled
    determinant are exact HUGEINT/DECIMAL(38) (u^2*c ~ 1e28 at
    sf1, documented), T^2 itself is one identical double chain,
    and the chi-square(2) alpha=0.001 out-of-control verdict
    (13.816) is decided EXACTLY in 128-bit integers — a float
    never flags a day. At 100 TB: raw volume dies in the day agg;
    the chart is 30-row work."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d")
        )
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN event_type = 'click'"
                " THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)"
                " div 100 AS BIGINT)"
            ).alias("x"),
            F.expr(
                "CAST(SUM(CASE WHEN event_type = 'view'"
                " THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)"
                " div 100 AS BIGINT)"
            ).alias("y"),
        )
    )
    daily = track_persist(daily)
    gs = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    mom = gs.select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("a"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("bigint")
        .alias("b"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("bigint")
        .alias("c"),
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    u = (F.col("n") * F.col("x") - F.col("sx")).cast("bigint")
    v = (F.col("n") * F.col("y") - F.col("sy")).cast("bigint")
    pts = daily.crossJoin(F.broadcast(mom)).select(
        "d",
        "x",
        "y",
        "n",
        "a",
        "b",
        "c",
        u.alias("u"),
        v.alias("v"),
    )
    qnum = (
        dec(F.col("c")) * dec(F.col("u")) * dec(F.col("u"))
        - dec(F.lit(2)) * dec(F.col("b")) * dec(F.col("u")) * dec(F.col("v"))
        + dec(F.col("a")) * dec(F.col("v")) * dec(F.col("v"))
    )
    det = dec(F.col("a")) * dec(F.col("c")) - dec(F.col("b")) * dec(
        F.col("b")
    )
    t2 = (
        qnum.cast("double")
        * (F.col("n").cast("double") - 1.0)
        / (det.cast("double") * F.col("n").cast("double"))
    )
    return pts.select(
        "d",
        "x",
        "y",
        qnum.cast("decimal(38,0)").alias("t2_num"),
        det.cast("decimal(38,0)").alias("det_scaled"),
        (F.col("n") - 1).cast("bigint").alias("dof"),
        t2.alias("t2"),
        (
            dec(F.lit(1000)) * dec(F.col("n") - 1) * qnum
            > dec(F.lit(13816)) * dec(F.col("n")) * det
        ).alias("out_of_control"),
    ).orderBy("d")


# =====================================================================
# Round-12 staged batch 27 — algorithmic engine mechanics: weighted
# interval scheduling DP (the optimal upgrade of the greedy),
# Blelloch work-efficient scan vs sequential cumsum (two routes),
# and frame-of-reference bitpacking cost (the Parquet scheme).
# Promotion target: round 13.
# =====================================================================


@staged(
    "q_weighted_interval_dp",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type AS t,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT tt.t, dd.d, CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
      FROM (SELECT DISTINCT t FROM daily) tt
      CROSS JOIN (SELECT unnest(range(0, 30)) AS d) dd
      LEFT JOIN daily ON daily.t = tt.t AND daily.d = dd.d
    ),
    ivals AS (
      SELECT t, d AS s, CAST(d + 1 + x % 5 AS BIGINT) AS e,
             CAST(1 + x % 97 AS BIGINT) AS w
      FROM grid
    ),
    sorted_iv AS (
      SELECT t, s, e, w,
             row_number() OVER (PARTITION BY t ORDER BY e, s) AS j
      FROM ivals
    ),
    preds AS (
      SELECT a.t, a.j, a.s, a.e, a.w,
             CAST(COALESCE(MAX(b.j), 0) AS BIGINT) AS p
      FROM sorted_iv a LEFT JOIN sorted_iv b
        ON b.t = a.t AND b.e <= a.s
      GROUP BY a.t, a.j, a.s, a.e, a.w
    ),
    arr AS (
      SELECT t, list(w ORDER BY j) AS ws, list(p ORDER BY j) AS ps
      FROM preds GROUP BY t
    ),
    rec AS (
      SELECT t, ws, ps, 0 AS k, CAST([0] AS BIGINT[]) AS m
      FROM arr
      UNION ALL
      SELECT t, ws, ps, k + 1,
             list_append(m, GREATEST(m[k + 1],
               ws[k + 1] + m[CAST(ps[k + 1] AS INT) + 1]))
      FROM rec WHERE k < 30
    )
    SELECT t, CAST(m[31] AS BIGINT) AS best_weight,
           CAST(30 AS BIGINT) AS n_intervals
    FROM rec WHERE k = 30 ORDER BY t
    """,
)
def q_weighted_interval_dp(spark, sf_dir):
    """WEIGHTED INTERVAL SCHEDULING solved EXACTLY by DP — the
    optimal upgrade of q_interval_scheduling (the greedy
    earliest-finish rule is optimal only for UNWEIGHTED counts;
    with weights it is unboundedly suboptimal, and the Kleinberg-
    Tardos DP m[j] = max(m[j-1], w_j + m[p(j)]) is the textbook
    fix): 30 deterministic intervals per type derive from the daily
    lattice (start d, length 1 + x mod 5, weight 1 + x mod 97 —
    exact integers), the predecessor index p(j) comes from one
    anti-overlap join on the (end <= start) integer predicate, and
    the DP is ONE F.aggregate fold over the end-sorted list with an
    exact BIGINT memo. The witness replays the DP AND cross-checks
    a gap property (best >= max single weight; best <= total
    weight). At 100 TB: raw volume dies in the (t, day) agg; the
    DP is 30 steps per type over the bounded grid."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("x")
        )
    )
    grid = (
        daily.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(30).select(F.col("id").alias("d")))
        )
        .join(F.broadcast(daily), ["t", "d"], "left")
        .select(
            "t", "d", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
        )
    )
    ivals = grid.select(
        "t",
        F.col("d").cast("bigint").alias("s"),
        (F.col("d") + 1 + F.col("x") % 5).cast("bigint").alias("e"),
        (1 + F.col("x") % 97).cast("bigint").alias("w"),
    )
    w_j = Window.partitionBy("t").orderBy("e", "s")
    sorted_iv = ivals.select(
        "t", "s", "e", "w", F.row_number().over(w_j).alias("j")
    )
    sorted_iv = track_persist(sorted_iv)
    a = sorted_iv.alias("a")
    b = sorted_iv.alias("b")
    preds = (
        a.join(
            F.broadcast(b),
            (F.col("b.t") == F.col("a.t"))
            & (F.col("b.e") <= F.col("a.s")),
            "left",
        )
        .groupBy(
            F.col("a.t").alias("t"),
            F.col("a.j").alias("j"),
            F.col("a.w").alias("w"),
        )
        .agg(
            F.coalesce(F.max("b.j"), F.lit(0)).cast("bigint").alias("p")
        )
    )
    arr = preds.groupBy("t").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(j, w))), e -> e.w)"
        ).alias("ws"),
        F.expr(
            "transform(array_sort(collect_list(struct(j, p))), e -> e.p)"
        ).alias("ps"),
    )
    dp = F.expr(
        "element_at(aggregate(sequence(1, 30),"
        " CAST(array(0) AS ARRAY<BIGINT>),"
        " (m, k) -> array_append(m, greatest("
        "   element_at(m, CAST(k AS INT)),"
        "   element_at(ws, CAST(k AS INT))"
        "     + element_at(m, CAST(element_at(ps, CAST(k AS INT)) + 1"
        "         AS INT))))), 31)"
    )
    return arr.select(
        "t",
        dp.cast("bigint").alias("best_weight"),
        F.lit(30).cast("bigint").alias("n_intervals"),
    ).orderBy("t")


@staged(
    "q_blelloch_scan",
    oracle="""
    WITH vals AS (
      SELECT CAST(user_id % 32 AS BIGINT) AS bk,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT bb.bk, CAST(COALESCE(vals.v, 0) AS BIGINT) AS v
      FROM (SELECT unnest(range(0, 32)) AS bk) bb
      LEFT JOIN vals ON vals.bk = bb.bk
    ),
    seq AS (
      SELECT bk, v,
             CAST(COALESCE(SUM(v) OVER (ORDER BY bk
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS excl_seq
      FROM grid
    )
    SELECT bk AS pos, v, excl_seq,
           excl_seq AS excl_blelloch, TRUE AS routes_agree
    FROM seq ORDER BY pos
    """,
)
def q_blelloch_scan(spark, sf_dir):
    """BLELLOCH WORK-EFFICIENT EXCLUSIVE SCAN vs the sequential
    window cumsum — two genuinely different algebraic routes to the
    same prefix sums (the up-sweep/down-sweep tree scan is THE
    primitive under GPU and vectorized-engine aggregation; the
    sequential route is one window): Spark runs the REAL Blelloch
    algorithm on the 32-slot array — 5 up-sweep levels folding
    partial sums into the tree, root zeroed, 5 down-sweep levels
    swapping-and-adding back down, all as one F.aggregate over the
    level sequence with exact BIGINT cells — and emits it NEXT TO
    the window-cumsum column; the routes_agree column is an integer
    equality per position (the q_little_law two-routes discipline).
    The oracle computes only the sequential route and pins
    excl_blelloch = excl_seq — i.e. the tree scan must REPRODUCE
    the window, which is exactly the parallel-scan correctness
    theorem. At 100 TB: one hash agg to 32 slots; the scan is
    2*log2(32) fold steps."""
    vals = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("CAST(user_id % 32 AS BIGINT)").alias("bk"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    grid = (
        spark.range(32)
        .select(F.col("id").cast("bigint").alias("bk"))
        .join(F.broadcast(vals), "bk", "left")
        .select(
            "bk", F.coalesce("v", F.lit(0)).cast("bigint").alias("v")
        )
    )
    per = grid.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(bk, v))), e -> e.v)"
        ).alias("xs")
    )
    # up-sweep: for level d in 0..4, stride = 2^(d+1): cell at
    # i = k*stride + stride - 1 += cell at i - 2^d
    up = (
        "aggregate(array(1, 2, 4, 8, 16), xs, (a, h) ->"
        " transform(a, (x, i) -> CASE"
        "   WHEN (i + 1) % (2 * h) = 0"
        "   THEN x + element_at(a, CAST(i + 1 - h AS INT))"
        "   ELSE x END))"
    )
    # zero the root, then down-sweep with mirrored strides
    down = (
        f"aggregate(array(16, 8, 4, 2, 1),"
        f" transform({up}, (x, i) -> CASE WHEN i = 31"
        f"   THEN CAST(0 AS BIGINT) ELSE x END),"
        " (a, h) -> transform(a, (x, i) -> CASE"
        "   WHEN (i + 1) % (2 * h) = 0"
        "   THEN x + element_at(a, CAST(i + 1 - h AS INT))"
        "   WHEN (i + 1 + h) % (2 * h) = 0"
        "   THEN element_at(a, CAST(i + 1 + h AS INT))"
        "   ELSE x END))"
    )
    scanned = per.select(
        "xs", F.expr(down).alias("bl")
    ).select(
        F.posexplode("xs").alias("pos", "v"),
        F.col("bl"),
    ).select(
        F.col("pos").cast("bigint").alias("pos"),
        F.col("v").cast("bigint").alias("v"),
        F.expr("element_at(bl, CAST(pos + 1 AS INT))")
        .cast("bigint")
        .alias("excl_blelloch"),
    )
    w_seq = Window.orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        scanned.select(
            "pos",
            "v",
            F.coalesce(F.sum("v").over(w_seq), F.lit(0))
            .cast("bigint")
            .alias("excl_seq"),
            "excl_blelloch",
        )
        .select(
            "pos",
            "v",
            "excl_seq",
            "excl_blelloch",
            (F.col("excl_blelloch") == F.col("excl_seq")).alias(
                "routes_agree"
            ),
        )
        .orderBy("pos")
    )


@staged(
    "q_for_bitpacking",
    oracle="""
    WITH blocks AS (
      SELECT CAST(event_id // 32 AS BIGINT) AS blk,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    stats AS (
      SELECT blk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi
      FROM blocks GROUP BY blk
    ),
    widths AS (
      SELECT blk, n, lo, hi,
             CAST(CASE WHEN hi = lo THEN 0
                  ELSE length(bin(hi - lo)) END AS BIGINT) AS width_bits
      FROM stats
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(n) AS BIGINT) AS n_values,
             CAST(SUM(64 + n * width_bits) AS BIGINT) AS packed_bits,
             CAST(SUM(64 * n) AS BIGINT) AS raw_bits
      FROM widths
    ),
    hist AS (
      SELECT width_bits, CAST(COUNT(*) AS BIGINT) AS n_blocks_at
      FROM widths GROUP BY width_bits
    )
    SELECT hist.width_bits, hist.n_blocks_at,
           agg.n_blocks, agg.n_values, agg.packed_bits, agg.raw_bits,
           CAST(agg.packed_bits AS DOUBLE) / CAST(agg.raw_bits AS DOUBLE)
             AS compression_ratio
    FROM hist CROSS JOIN agg
    ORDER BY width_bits
    """,
)
def q_for_bitpacking(spark, sf_dir):
    """FRAME-OF-REFERENCE BITPACKING cost accounting — the
    column-store integer codec (Parquet/DuckDB/Velox default:
    per-block, store min as a 64-bit reference and pack v - min in
    ceil(log2(range+1)) bits) completing the compression trio next
    to q_postings_compression (Elias-gamma) and the staged
    q_gorilla_cost (delta-of-delta): blocks are 32 event-ids wide,
    the per-block width is the EXACT integer bit length of hi - lo
    via length(bin(.)) (the q_unigram_surprisal no-float-log
    discipline; the constant block is width 0 — decided by an
    integer equality, not log(0)), and every bit total is an exact
    BIGINT (64 reference bits per block + n*width packed). The
    width histogram shows the codec's behavior; one ratio divides
    at readout. At 100 TB: one hash agg over blocks — the same
    shape as the writer's own encoding pass."""
    blocks = _t(spark, sf_dir, "events").select(
        F.expr("CAST(event_id div 32 AS BIGINT)").alias("blk"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    stats = blocks.groupBy("blk").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("v").cast("bigint").alias("lo"),
        F.max("v").cast("bigint").alias("hi"),
    )
    widths = stats.select(
        "blk",
        "n",
        F.when(F.col("hi") == F.col("lo"), 0)
        .otherwise(F.expr("length(bin(hi - lo))"))
        .cast("bigint")
        .alias("width_bits"),
    )
    widths = track_persist(widths)
    agg = widths.agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.sum("n").cast("bigint").alias("n_values"),
        F.sum(64 + F.col("n") * F.col("width_bits"))
        .cast("bigint")
        .alias("packed_bits"),
        F.sum(64 * F.col("n")).cast("bigint").alias("raw_bits"),
    )
    hist = widths.groupBy("width_bits").agg(
        F.count("*").cast("bigint").alias("n_blocks_at")
    )
    return (
        hist.crossJoin(F.broadcast(agg))
        .select(
            "width_bits",
            "n_blocks_at",
            "n_blocks",
            "n_values",
            "packed_bits",
            "raw_bits",
            (
                F.col("packed_bits").cast("double")
                / F.col("raw_bits").cast("double")
            ).alias("compression_ratio"),
        )
        .orderBy("width_bits")
    )


# =====================================================================
# Round-12 staged batch 28 — ML-pipeline & privacy mechanisms:
# stratified k-fold assignment audit, weight-of-evidence /
# information value, and randomized-response estimation.
# Promotion target: round 13.
# =====================================================================


@staged(
    "q_kfold_assign",
    oracle="""
    WITH users AS (
      SELECT user_id, event_type AS stratum,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(user_id AS VARCHAR) || ':cv'), user_id
             ) AS rk
      FROM (SELECT DISTINCT user_id, event_type FROM events)
    ),
    assigned AS (
      SELECT user_id, stratum, CAST((rk - 1) % 5 AS BIGINT) AS fold
      FROM users
    ),
    sizes AS (
      SELECT stratum, fold, CAST(COUNT(*) AS BIGINT) AS n
      FROM assigned GROUP BY stratum, fold
    ),
    balance AS (
      SELECT stratum, CAST(MAX(n) - MIN(n) AS BIGINT) AS spread,
             CAST(SUM(n) AS BIGINT) AS n_stratum
      FROM sizes GROUP BY stratum
    )
    SELECT sizes.stratum AS stratum, sizes.fold, sizes.n,
           balance.n_stratum, balance.spread,
           (balance.spread <= 1) AS balanced
    FROM sizes JOIN balance ON balance.stratum = sizes.stratum
    ORDER BY sizes.stratum, sizes.fold
    """,
)
def q_kfold_assign(spark, sf_dir):
    """STRATIFIED K-FOLD ASSIGNMENT AUDIT (k = 5) — the
    cross-validation split every ML pipeline needs before any score
    is trusted (q_sample_stratified draws ONE stratified sample;
    k-fold must PARTITION each stratum into k near-equal folds,
    and a skewed fold silently biases every CV estimate): members
    rank within their (user, type) stratum by the engine-portable
    md5 order (the q_srm_check discipline, with the user_id
    tiebreak making the rank total), fold = (rank-1) mod 5 — the
    round-robin that GUARANTEES within-stratum balance — and the
    audit pins the guarantee as an exact integer: max fold size -
    min fold size <= 1 per stratum, never a float. At 100 TB: one
    distinct projection, one rank window per stratum, two hash
    aggs."""
    users = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.col("event_type").alias("stratum"))
        .distinct()
    )
    w_rk = Window.partitionBy("stratum").orderBy(
        F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":cv"))),
        "user_id",
    )
    assigned = users.select(
        "user_id",
        "stratum",
        ((F.row_number().over(w_rk) - 1) % 5).cast("bigint").alias("fold"),
    )
    sizes = assigned.groupBy("stratum", "fold").agg(
        F.count("*").cast("bigint").alias("n")
    )
    sizes = track_persist(sizes)
    balance = sizes.groupBy("stratum").agg(
        (F.max("n") - F.min("n")).cast("bigint").alias("spread"),
        F.sum("n").cast("bigint").alias("n_stratum"),
    )
    return (
        sizes.join(F.broadcast(balance), "stratum")
        .select(
            "stratum",
            "fold",
            "n",
            "n_stratum",
            "spread",
            (F.col("spread") <= 1).alias("balanced"),
        )
        .orderBy("stratum", "fold")
    )


@staged(
    "q_woe_iv",
    oracle="""
    WITH scored AS (
      SELECT CAST(event_id % 10 AS BIGINT) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    bins AS (
      SELECT bin, CAST(SUM(y) AS BIGINT) AS g,
             CAST(SUM(1 - y) AS BIGINT) AS b
      FROM scored GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(g) AS BIGINT) AS gt, CAST(SUM(b) AS BIGINT) AS bt
      FROM bins
    ),
    woe AS (
      SELECT bins.bin, bins.g, bins.b, tot.gt, tot.bt,
             CAST(floor(ln(CAST(bins.g AS DOUBLE) * tot.bt
                 / (CAST(bins.b AS DOUBLE) * tot.gt))
               * 1000000000.0 + 0.5) AS BIGINT) AS woe_nano
      FROM bins CROSS JOIN tot
      WHERE bins.g > 0 AND bins.b > 0
    ),
    iv AS (
      SELECT CAST(SUM(
               CAST(floor(
                 (CAST(g AS DOUBLE) / gt - CAST(b AS DOUBLE) / bt)
                 * CAST(woe_nano AS DOUBLE) + 0.5) AS BIGINT)
             ) AS BIGINT) AS iv_nano
      FROM woe
    )
    SELECT woe.bin, woe.g, woe.b, woe.woe_nano, iv.iv_nano,
           CAST(iv.iv_nano AS DOUBLE) / 1000000000.0 AS information_value,
           (iv.iv_nano > 20000000) AS predictive
    FROM woe CROSS JOIN iv
    ORDER BY woe.bin
    """,
)
def q_woe_iv(spark, sf_dir):
    """WEIGHT OF EVIDENCE + INFORMATION VALUE per score decile — the
    credit-scoring feature screen that completes the supervised-
    encoding family (q_target_encode smooths the mean, q_psi_stability
    drifts the population; WOE = ln(good-share / bad-share) is the
    scorecard transform and IV = sum (gshare - bshare) * WOE the
    industry screening rule, IV > 0.02 = predictive): good/bad
    counts per event_id-decile bin are exact BIGINTs, each WOE's
    single log argument is the exact integer cross-ratio g*Bt/(b*Gt)
    evaluated in ONE identical chain and quantized to the 1e-9
    lattice, the per-bin IV contributions quantize BEFORE the exact
    integer sum (the q_log_rank discipline), empty-sided bins are
    excluded by integer predicates (ln(0) — documented), and the
    IV > 0.02 verdict is an exact integer compare on the nano
    lattice. At 100 TB: one scan, one 10-bin hash agg."""
    scored = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 10).cast("bigint").alias("bin"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    bins = scored.groupBy("bin").agg(
        F.sum("y").cast("bigint").alias("g"),
        F.sum(1 - F.col("y")).cast("bigint").alias("b"),
    )
    bins = track_persist(bins)
    tot = bins.agg(
        F.sum("g").cast("bigint").alias("gt"),
        F.sum("b").cast("bigint").alias("bt"),
    )
    woe = (
        bins.crossJoin(F.broadcast(tot))
        .filter((F.col("g") > 0) & (F.col("b") > 0))
        .select(
            "bin",
            "g",
            "b",
            "gt",
            "bt",
            F.floor(
                F.log(
                    F.col("g").cast("double")
                    * F.col("bt")
                    / (F.col("b").cast("double") * F.col("gt"))
                )
                * 1000000000.0
                + 0.5
            )
            .cast("bigint")
            .alias("woe_nano"),
        )
    )
    woe = track_persist(woe)
    iv = woe.agg(
        F.sum(
            F.floor(
                (
                    F.col("g").cast("double") / F.col("gt")
                    - F.col("b").cast("double") / F.col("bt")
                )
                * F.col("woe_nano").cast("double")
                + 0.5
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("iv_nano")
    )
    return (
        woe.crossJoin(F.broadcast(iv))
        .select(
            "bin",
            "g",
            "b",
            "woe_nano",
            "iv_nano",
            (F.col("iv_nano").cast("double") / 1000000000.0).alias(
                "information_value"
            ),
            (F.col("iv_nano") > 20000000).alias("predictive"),
        )
        .orderBy("bin")
    )


@staged(
    "q_randomized_response",
    oracle="""
    WITH coins AS (
      SELECT CASE WHEN CAST(round(value * 100) AS BIGINT) > 5000
               THEN 1 ELSE 0 END AS truth,
             CAST(CAST('0x' || substring(
               md5(CAST(event_id AS VARCHAR) || ':rr1'), 1, 8) AS BIGINT)
               % 2 AS BIGINT) AS c1,
             CAST(CAST('0x' || substring(
               md5(CAST(event_id AS VARCHAR) || ':rr2'), 1, 8) AS BIGINT)
               % 2 AS BIGINT) AS c2
      FROM events
    ),
    reported AS (
      SELECT truth,
             CASE WHEN c1 = 1 THEN truth ELSE c2 END AS response
      FROM coins
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(truth) AS BIGINT) AS n_true,
             CAST(SUM(response) AS BIGINT) AS n_yes
      FROM reported
    )
    SELECT n, n_true, n_yes,
           CAST(n_true AS DOUBLE) / n AS true_rate,
           CAST(n_yes AS DOUBLE) / n AS observed_rate,
           2.0 * CAST(n_yes AS DOUBLE) / n - 0.5 AS estimated_rate,
           abs((2.0 * CAST(n_yes AS DOUBLE) / n - 0.5)
               - CAST(n_true AS DOUBLE) / n) AS estimator_error
    FROM agg
    """,
)
def q_randomized_response(spark, sf_dir):
    """WARNER'S RANDOMIZED RESPONSE with the debiasing estimator —
    the privacy-mechanism ESTIMATION side that completes the
    anonymity family (q_k_anonymity / q_l_diversity / q_t_closeness
    audit the published table; randomized response is the original
    local-DP mechanism, and the whole point is that the TRUE rate
    is recoverable in aggregate): each event answers truthfully on
    heads (engine-portable md5 coin 1) and reports a second md5
    coin otherwise — a deterministic REPLAY of the randomizer, so
    both engines and the witness see the identical transcript —
    and the classic unbiased estimator p-hat = 2*observed - 1/2
    (for p_truth = q_noise = 1/2) is one identical chain next to
    the ground truth (knowable here precisely because this is a
    replay — the estimator_error column IS the utility audit). All
    counts exact BIGINT. At 100 TB: one scan, constant-state
    agg."""
    ev = _t(spark, sf_dir, "events")

    def coin(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"), F.lit(salt)
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        )

    reported = ev.select(
        F.when(
            F.expr("CAST(round(value * 100) AS BIGINT)") > 5000, 1
        )
        .otherwise(0)
        .alias("truth"),
        coin(":rr1").alias("c1"),
        coin(":rr2").alias("c2"),
    ).select(
        "truth",
        F.when(F.col("c1") == 1, F.col("truth"))
        .otherwise(F.col("c2"))
        .alias("response"),
    )
    agg = reported.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("truth").cast("bigint").alias("n_true"),
        F.sum("response").cast("bigint").alias("n_yes"),
    )
    obs = F.col("n_yes").cast("double") / F.col("n")
    true_rate = F.col("n_true").cast("double") / F.col("n")
    return agg.select(
        "n",
        "n_true",
        "n_yes",
        true_rate.alias("true_rate"),
        obs.alias("observed_rate"),
        (2.0 * obs - 0.5).alias("estimated_rate"),
        F.abs((2.0 * obs - 0.5) - true_rate).alias("estimator_error"),
    )


@staged(
    "q_halton_qmc",
    oracle="""
    WITH pts AS (
      SELECT CAST(n AS BIGINT) AS n FROM range(0, 4096) t(n)
    ),
    radinv AS (
      SELECT n,
             CAST(
               ((n // 1) % 2) * 2048 + ((n // 2) % 2) * 1024
               + ((n // 4) % 2) * 512 + ((n // 8) % 2) * 256
               + ((n // 16) % 2) * 128 + ((n // 32) % 2) * 64
               + ((n // 64) % 2) * 32 + ((n // 128) % 2) * 16
               + ((n // 256) % 2) * 8 + ((n // 512) % 2) * 4
               + ((n // 1024) % 2) * 2 + ((n // 2048) % 2) * 1
               AS BIGINT) AS x2,
             CAST(
               ((n // 1) % 3) * 2187 + ((n // 3) % 3) * 729
               + ((n // 9) % 3) * 243 + ((n // 27) % 3) * 81
               + ((n // 81) % 3) * 27 + ((n // 243) % 3) * 9
               + ((n // 729) % 3) * 3 + ((n // 2187) % 3) * 1
               AS BIGINT) AS y3
      FROM pts
    ),
    flagged AS (
      SELECT n, x2, y3,
             CASE WHEN x2 * x2 * 43046721 + y3 * y3 * 16777216
                       < 722204136308736 THEN 1 ELSE 0 END AS inside
      FROM radinv
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(SUM(inside) AS BIGINT) AS n_inside
      FROM flagged
    )
    SELECT n_points, n_inside,
           4.0 * CAST(n_inside AS DOUBLE) / CAST(n_points AS DOUBLE)
             AS pi_estimate,
           abs(4.0 * CAST(n_inside AS DOUBLE) / CAST(n_points AS DOUBLE)
               - 3.14159265358979) AS pi_error,
           (abs(4.0 * CAST(n_inside AS DOUBLE)
                / CAST(n_points AS DOUBLE)
                - 3.14159265358979) < 0.01) AS converged
    FROM agg
    """,
)
def q_halton_qmc(spark, sf_dir):
    """QUASI-MONTE-CARLO pi BY THE HALTON SEQUENCE — deterministic
    low-discrepancy integration (the variance-free sampling behind
    finance QMC and rendering; every 'Monte Carlo' the catalog can
    host must be DERANDOMIZED, and Halton's radical-inverse points
    are pure arithmetic): the 4096 points are (phi_2(n), phi_3(n))
    — digit-reversal in bases 2 and 3 as EXACT integer dot products
    on the 4096 and 6561 lattices (no floats until readout), the
    inside-circle test clears denominators to the single exact
    128-bit-free comparison (x2*3^16... spelled with literal
    constants 43046721 = 6561^2, 16777216 = 4096^2, and
    722204136308736 = (4096*6561)^2 — all within int64), and the
    estimator 4*inside/n with its error against the frozen pi
    literal is one identical chain. QMC's O(log n / n) discrepancy
    means 4096 points land within 0.01 of pi — the convergence
    VERDICT is pinned. Deliberately data-free inputs (a generated
    lattice): what is tested is the ENGINE's integer digit algebra
    at scale-independent cost."""
    pts = spark.range(4096).select(F.col("id").cast("bigint").alias("n"))
    x2 = " + ".join(
        f"((n div {2 ** i}) % 2) * {2 ** (11 - i)}" for i in range(12)
    )
    y3 = " + ".join(
        f"((n div {3 ** i}) % 3) * {3 ** (7 - i)}" for i in range(8)
    )
    radinv = pts.select(
        "n",
        F.expr(f"CAST({x2} AS BIGINT)").alias("x2"),
        F.expr(f"CAST({y3} AS BIGINT)").alias("y3"),
    )
    inside = F.when(
        F.col("x2") * F.col("x2") * 43046721
        + F.col("y3") * F.col("y3") * 16777216
        < 722204136308736,
        1,
    ).otherwise(0)
    agg = radinv.select(inside.alias("inside")).agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum("inside").cast("bigint").alias("n_inside"),
    )
    pi_est = (
        4.0 * F.col("n_inside").cast("double")
        / F.col("n_points").cast("double")
    )
    return agg.select(
        "n_points",
        "n_inside",
        pi_est.alias("pi_estimate"),
        F.abs(pi_est - 3.14159265358979).alias("pi_error"),
        (F.abs(pi_est - 3.14159265358979) < 0.01).alias("converged"),
    )
