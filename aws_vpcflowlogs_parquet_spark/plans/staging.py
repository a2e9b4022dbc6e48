"""Staging catalog — queries built ahead of the external driver's
50-pending-per-round verification capacity, held out of ``queries()``
until the queue drains.

Round-7 status: **empty — all 13 round-6-staged queries were promoted
into the §2.3 catalog** (r6 VERDICT item 1): q_resource_alloc,
q_rolling_regression, q_conversion_curve, q_negative_sampling,
q_weighted_jaccard, q_snapshot_diff, q_lag_features, q_calendar_dim,
q_stream_cep, q_dim_stats, q_pit_audit, q_compaction_plan and
q_tokenizer_fertility each moved verbatim (oracle included) with
``@staged`` -> ``@register``; their independent-witness tests
(tests/test_staging_properties.py round-6 section) now point at the
catalog registry.

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
# Round-10 staged batch — built past the driver's 50-pending cap
# (45 pending after the round-10 catalog batches); promotion target:
# round 11. Same contract as catalog.py: exact DuckDB oracle, witness
# tests (tests/test_round10_staging_witness.py), SURVEY §2.5 rows.
# =====================================================================

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ..sources.tables import load_table  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@staged(
    "q_group_lcp",
    oracle="""
    WITH paths AS (
      SELECT event_type,
             concat('s3://logs/', event_type, '/dt=',
                    strftime(ts, '%Y-%m-%d'), '/part-',
                    lpad(CAST(event_id AS VARCHAR), 8, '0'), '.gz')
               AS path
      FROM events
    ),
    mm AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_paths,
             MIN(path) AS mn, MAX(path) AS mx
      FROM paths GROUP BY event_type
    ),
    l AS (
      SELECT event_type, n_paths, mn,
             CAST(len(list_filter(
               generate_series(1, least(length(mn), length(mx))),
               i -> substring(mn, 1, i) = substring(mx, 1, i)))
               AS BIGINT) AS lcp_len
      FROM mm
    )
    SELECT event_type, n_paths, lcp_len,
           substring(mn, 1, lcp_len) AS lcp
    FROM l
    """,
)
def q_group_lcp(spark, sf_dir):
    """LONGEST COMMON PREFIX per group over synthesized object-store
    paths — the prefix-mining pass a lake compactor runs to discover
    the partition root shared by a file listing (and the string twin of
    q_cidr_merge's numeric prefix aggregation).

    The whole mechanism rides ONE identity: the LCP of a SET of strings
    equals the LCP of its lexicographic MIN and MAX (any divergence
    between two members appears at or before the min/max divergence),
    so the group pass is two plain MIN/MAX aggregates — mergeable, O(1)
    state, no pairwise comparisons — and the character scan runs once
    per GROUP, not per row: prefix equality is monotone decreasing in
    length, so counting equal prefixes over a position sequence IS the
    LCP length. At 100 TB: one map-side-combined agg, then ~|groups|
    rows of string work."""
    ev = _t(spark, sf_dir, "events")
    paths = ev.select(
        "event_type",
        F.concat(
            F.lit("s3://logs/"),
            F.col("event_type"),
            F.lit("/dt="),
            F.date_format("ts", "yyyy-MM-dd"),
            F.lit("/part-"),
            F.lpad(F.col("event_id").cast("string"), 8, "0"),
            F.lit(".gz"),
        ).alias("path"),
    )
    mm = paths.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_paths"),
        F.min("path").alias("mn"),
        F.max("path").alias("mx"),
    )
    l = mm.select(
        "event_type",
        "n_paths",
        "mn",
        F.expr(
            "CAST(size(filter(sequence(1, least(length(mn), length(mx))),"
            " i -> substring(mn, 1, i) = substring(mx, 1, i))) AS BIGINT)"
        ).alias("lcp_len"),
    )
    return l.select(
        "event_type",
        "n_paths",
        "lcp_len",
        F.expr("substring(mn, 1, lcp_len)").alias("lcp"),
    )


@staged(
    "q_ema_crossover",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT g.user_id, g.b, CAST(COALESCE(c.v, 0) AS DOUBLE) AS v
      FROM (SELECT u.user_id, r.b
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(range(0, 32)) AS b) r) g
      LEFT JOIN (
        SELECT user_id,
               (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 32 AS b,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM events GROUP BY user_id, b
      ) c ON c.user_id = g.user_id AND c.b = g.b
    ),
    ema(user_id, t, f, s) AS (
      SELECT user_id, CAST(0 AS BIGINT), v, v FROM base WHERE b = 0
      UNION ALL
      SELECT e.user_id, e.t + 1,
             0.5 * b.v + 0.5 * e.f,
             0.125 * b.v + 0.875 * e.s
      FROM ema e JOIN base b
        ON b.user_id = e.user_id AND b.b = e.t + 1
      WHERE e.t < 31
    ),
    sg AS (
      SELECT user_id, t, f, s,
             CASE WHEN f > s THEN 1 WHEN f < s THEN -1 ELSE 0 END AS sgn
      FROM ema
    ),
    lagged AS (
      SELECT user_id, t, f, s, sgn,
             lag(sgn) OVER (PARTITION BY user_id ORDER BY t) AS prev
      FROM sg
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND sgn != prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND sgn > prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
           MAX(CASE WHEN t = 31 THEN f END) AS final_fast,
           MAX(CASE WHEN t = 31 THEN s END) AS final_slow
    FROM lagged GROUP BY user_id
    """,
)
def q_ema_crossover(spark, sf_dir):
    """EMA CROSSOVER SIGNALS: a fast (α=1/2) and slow (α=1/8)
    exponential moving average over each key's 32-bucket activity
    series, with the count of sign flips of fast−slow — q_sma_crossover
    with RECURSIVE state instead of finite windows, and q_ewma/
    q_holt_smoothing extended from final-state folds to a PREFIX SCAN
    (the crossover needs every intermediate state, not just the last).

    The Spark side runs the scan as an APPEND FOLD: one F.aggregate
    whose accumulator is the growing array of [fast, slow] pairs
    (element_at(acc, -1) reads the previous state, concat appends the
    next — Spark's aggregate separates accumulator type from element
    type, so the array-of-pairs state is legal where DuckDB's
    list_reduce, which forces acc ≡ element, is not). The DuckDB
    oracle therefore scans a DIFFERENT way — a recursive CTE stepping
    t→t+1 per key — making the two sides independent implementations
    of the same recurrence. Both state the update in the identical
    dyadic linear form (0.5x+0.5f; 0.125x+0.875s), so every
    intermediate double is bit-exact and the flip counts match
    integer-for-integer. Embarrassingly parallel across keys; the scan
    never leaves the executor."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(
        "user_id",
        (
            (F.unix_timestamp("ts").cast("bigint") / 3600).cast("bigint")
            % 32
        ).alias("b"),
    ).agg(F.count("*").cast("bigint").alias("v"))
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(32).select(F.col("id").alias("b")))
        )
    )
    series = (
        grid.join(counts, ["user_id", "b"], "left")
        .select(
            "user_id",
            "b",
            F.coalesce("v", F.lit(0)).cast("double").alias("v"),
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(b, v))),"
                " p -> p.v)"
            ).alias("xs")
        )
    )
    scanned = series.select(
        "user_id",
        F.expr(
            "aggregate(slice(xs, 2, 31),"
            " array(array(element_at(xs, 1), element_at(xs, 1))),"
            " (acc, x) -> concat(acc, array(array("
            "   0.5 * x + 0.5 * element_at(element_at(acc, -1), 1),"
            "   0.125 * x + 0.875 * element_at(element_at(acc, -1), 2)"
            " ))))"
        ).alias("p"),
    )
    sgn = (
        "transform(p, q -> CASE WHEN element_at(q, 1) > element_at(q, 2)"
        " THEN 1 WHEN element_at(q, 1) < element_at(q, 2) THEN -1"
        " ELSE 0 END)"
    )
    return scanned.select(
        "user_id",
        F.expr(
            f"CAST(size(filter(sequence(2, 32), i ->"
            f" element_at({sgn}, i) != element_at({sgn}, i - 1)))"
            f" AS BIGINT)"
        ).alias("n_cross"),
        F.expr(
            f"CAST(size(filter(sequence(2, 32), i ->"
            f" element_at({sgn}, i) > element_at({sgn}, i - 1)))"
            f" AS BIGINT)"
        ).alias("n_up"),
        F.expr("element_at(element_at(p, 32), 1)").alias("final_fast"),
        F.expr("element_at(element_at(p, 32), 2)").alias("final_slow"),
    )


@staged(
    "q_histogram_equalize",
    oracle="""
    WITH px AS (
      SELECT event_type,
             CAST(floor(value) AS BIGINT) % 256 AS pix,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, pix
    ),
    cd AS (
      SELECT event_type, pix, n,
             CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY pix
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cdf,
             CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
               AS total,
             CAST(MIN(n) OVER (PARTITION BY event_type ORDER BY pix
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS _m
      FROM px
    ),
    base AS (
      SELECT event_type, pix, n, cdf, total,
             CAST(FIRST_VALUE(n) OVER (PARTITION BY event_type
                                       ORDER BY pix) AS BIGINT)
               AS cdf_min
      FROM cd
    )
    SELECT event_type, pix, n, cdf,
           CASE WHEN total > cdf_min
                THEN (cdf - cdf_min) * 255 // (total - cdf_min)
                ELSE CAST(0 AS BIGINT) END AS remap
    FROM base
    """,
)
def q_histogram_equalize(spark, sf_dir):
    """HISTOGRAM EQUALIZATION remap table (the image-contrast classic,
    and the score-calibration table a ranking pipeline builds to
    flatten a bunched score distribution): per key, map each 8-bit
    level through its CDF so output levels are uniformly occupied —
    remap(v) = (cdf(v) − cdf_min)·255 ÷ (N − cdf_min), all integer.

    The remap TABLE is built on the AGGREGATED histogram (≤256 rows per
    key), never the raw stream: one map-side-combined count, then
    cumulative/min/total windows over the bounded pixel domain
    (partitioned per key — the unpartitioned-window allowlist does not
    apply) and a floor division that both engines define identically
    for non-negative integers. Applying the remap to rows would be one
    broadcast join of this table — deliberately not materialized here.
    cdf_min is the FIRST bucket's count (the CDF at the smallest
    present level), read by first_value over the same ordering."""
    ev = _t(spark, sf_dir, "events")
    px = ev.groupBy(
        "event_type",
        (F.floor("value").cast("bigint") % 256).alias("pix"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("pix")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    word = Window.partitionBy("event_type").orderBy("pix")
    base = px.select(
        "event_type",
        "pix",
        "n",
        F.sum("n").over(wcum).cast("bigint").alias("cdf"),
        F.sum("n").over(wall).cast("bigint").alias("total"),
        F.first("n").over(word).cast("bigint").alias("cdf_min"),
    )
    return base.select(
        "event_type",
        "pix",
        "n",
        "cdf",
        F.when(
            F.col("total") > F.col("cdf_min"),
            F.expr("(cdf - cdf_min) * 255 div (total - cdf_min)"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("remap"),
    )


@staged(
    "q_ratio_delta_method",
    oracle="""
    WITH m AS (
      SELECT CAST(event_id % 2 AS BIGINT) AS variant,
             CAST(1 + user_id % 7 AS BIGINT) AS x,
             CAST(CAST(floor(value) AS BIGINT) % 5 AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM m GROUP BY variant
    )
    SELECT variant, n,
           CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS ratio,
           sqrt((CAST(n * syy - sy * sy AS DOUBLE)
                   / CAST(n * (n - 1) AS DOUBLE)
                 - 2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                   * (CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * (n - 1) AS DOUBLE))
                 + (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                   * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                   * (CAST(n * sxx - sx * sx AS DOUBLE)
                      / CAST(n * (n - 1) AS DOUBLE)))
                / (CAST(n AS DOUBLE)
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))
             AS se
    FROM s
    """,
)
def q_ratio_delta_method(spark, sf_dir):
    """RATIO-METRIC standard error by the DELTA METHOD — the
    experimentation-platform readout for metrics that are ratios of
    two unit-level quantities (revenue per session, clicks per
    impression), where naive per-unit-mean variance is wrong because
    numerator and denominator covary: var(ȳ/x̄) ≈ (s_y² − 2R·s_xy +
    R²·s_x²) / (n·x̄²). Completes the experimentation family
    (q_ab_test raw deltas, q_ab_cuped variance reduction, q_wilson_ci
    proportions) with the covariance-aware ratio case.

    Everything reduces to the six integer-lattice sums (n, Σx, Σy,
    Σx², Σy², Σxy) in ONE map-side-combined agg; ratio, variances and
    the final SE are a fixed division/multiply chain written in the
    identical operation order on both engines (each R reference
    re-derives sy/sx rather than binding a common subexpression — both
    engines then evaluate the same tree), so the doubles hash-compare
    bit-exactly. At 100 TB this is one pass and |variants| rows."""
    ev = _t(spark, sf_dir, "events")
    m = ev.select(
        (F.col("event_id") % 2).cast("bigint").alias("variant"),
        (1 + F.col("user_id") % 7).cast("bigint").alias("x"),
        (F.floor("value").cast("bigint") % 5).cast("bigint").alias("y"),
    )
    s = m.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nn = d("n")
    r = d("sy") / d("sx")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * (F.col("n") - 1)).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    ) / (F.col("n") * (F.col("n") - 1)).cast("double")
    cxy = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * (F.col("n") - 1)).cast("double")
    xbar = d("sx") / nn
    return s.select(
        "variant",
        "n",
        r.alias("ratio"),
        F.sqrt(
            (vy - F.lit(2.0) * r * cxy + r * r * vx)
            / (nn * xbar * xbar)
        ).alias("se"),
    )


@staged(
    "q_h_index",
    oracle="""
    WITH c AS (
      SELECT source, doc_id, n_chars // 100 AS cites
      FROM documents
    ),
    r AS (
      SELECT source, cites,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY cites DESC, doc_id)
                  AS BIGINT) AS rn
      FROM c
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(MAX(CASE WHEN cites >= rn THEN rn END), 0)
                AS BIGINT) AS h_index
    FROM r GROUP BY source
    """,
)
def q_h_index(spark, sf_dir):
    """H-INDEX per source (the bibliometric summary, but equally the
    engagement summary 'h posts with ≥ h interactions' and the
    quality-mass summary 'h docs of ≥ h hectochars' used here): the
    largest h such that h documents have at least h citation units.

    One ranking window per source ((cites DESC, doc_id) — total order)
    and the closed-form readout h = max{rn : cites(rn) ≥ rn}, which is
    exact because cites is non-increasing in rn while rn increases, so
    the predicate flips exactly once. No iteration, no join; integer
    lattice end-to-end."""
    docs = _t(spark, sf_dir, "documents")
    c = docs.select(
        "source",
        "doc_id",
        F.expr("n_chars div 100").alias("cites"),
    )
    r = c.select(
        "source",
        "cites",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("cites").desc(), "doc_id"
            )
        )
        .cast("bigint")
        .alias("rn"),
    )
    return r.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.coalesce(
            F.max(
                F.when(F.col("cites") >= F.col("rn"), F.col("rn"))
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("h_index"),
    )
