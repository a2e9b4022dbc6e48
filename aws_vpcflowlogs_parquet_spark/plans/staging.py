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


@staged(
    "q_linear_interpolate",
    oracle="""
    WITH base AS (
      SELECT g.event_type, g.b, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
      FROM (SELECT t.event_type, r.b
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT unnest(range(0, 32)) AS b) r) g
      LEFT JOIN (
        SELECT event_type,
               (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 32 AS b,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM events GROUP BY event_type, b
      ) c ON c.event_type = g.event_type AND c.b = g.b
    ),
    marked AS (
      SELECT event_type, b, v,
             CASE WHEN v % 3 != 0 THEN b END AS kb,
             CASE WHEN v % 3 != 0 THEN v END AS kv
      FROM base
    ),
    spanned AS (
      SELECT event_type, b, v, kb,
             last_value(kb IGNORE NULLS) OVER wf AS lb,
             last_value(kv IGNORE NULLS) OVER wf AS lv,
             last_value(kb IGNORE NULLS) OVER wb AS nb,
             last_value(kv IGNORE NULLS) OVER wb AS nv
      FROM marked
      WINDOW wf AS (PARTITION BY event_type ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wb AS (PARTITION BY event_type ORDER BY b DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, b, v AS observed,
           CAST(lv AS DOUBLE)
           + CAST(nv - lv AS DOUBLE)
             * (CAST(b - lb AS DOUBLE) / CAST(nb - lb AS DOUBLE))
             AS interp
    FROM spanned
    WHERE kb IS NULL AND lb IS NOT NULL AND nb IS NOT NULL
    """,
)
def q_linear_interpolate(spark, sf_dir):
    """LINEAR INTERPOLATION of interior gaps in a per-key series — the
    sensor-reading repair q_gap_fill (zero-fill) and q_window_fill
    (LOCF) don't cover: a missing bucket takes the straight line
    between its nearest KNOWN neighbors on both sides. Knot-ness is
    data-dependent (v % 3 ≠ 0), so bracketing cannot be computed in
    closed form — the mechanism is the DUAL IGNORE-NULLS SCAN: one
    forward and one backward last_value(IGNORE NULLS) window carry the
    nearest knot (position, value) into every gap, the production
    pattern for as-of repair without a range join. Leading/trailing
    gaps (no bracket) are excluded, not extrapolated.

    Both windows share the per-key partitioning (forward and reverse
    orderings plan as one exchange + two sorts); the interpolation is
    a fixed chain off the integer lattice — one division for the
    fraction, one multiply-add — so the doubles hash-compare exactly."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        (
            (F.unix_timestamp("ts").cast("bigint") / 3600).cast("bigint")
            % 32
        ).alias("b"),
    ).agg(F.count("*").cast("bigint").alias("v"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(32).select(F.col("id").alias("b")))
        )
    )
    base = grid.join(counts, ["event_type", "b"], "left").select(
        "event_type",
        "b",
        F.coalesce("v", F.lit(0)).cast("bigint").alias("v"),
    )
    marked = base.select(
        "event_type",
        "b",
        "v",
        F.when(F.col("v") % 3 != 0, F.col("b")).alias("kb"),
        F.when(F.col("v") % 3 != 0, F.col("v")).alias("kv"),
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy(F.col("b").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spanned = marked.select(
        "event_type",
        "b",
        "v",
        "kb",
        F.last("kb", ignorenulls=True).over(wf).alias("lb"),
        F.last("kv", ignorenulls=True).over(wf).alias("lv"),
        F.last("kb", ignorenulls=True).over(wb).alias("nb"),
        F.last("kv", ignorenulls=True).over(wb).alias("nv"),
    )
    return spanned.filter(
        F.col("kb").isNull()
        & F.col("lb").isNotNull()
        & F.col("nb").isNotNull()
    ).select(
        "event_type",
        "b",
        F.col("v").alias("observed"),
        (
            F.col("lv").cast("double")
            + (F.col("nv") - F.col("lv")).cast("double")
            * (
                (F.col("b") - F.col("lb")).cast("double")
                / (F.col("nb") - F.col("lb")).cast("double")
            )
        ).alias("interp"),
    )


@staged(
    "q_csv_sniff",
    oracle="""
    WITH lines AS (
      SELECT source, doc_id,
             concat(
               regexp_replace(lower(substring(text, 1, 12)),
                              '[^a-z]', '', 'g'),
               CASE CAST(substring(source, 4) AS INT) % 4
                 WHEN 0 THEN ',' WHEN 1 THEN ';'
                 WHEN 2 THEN '|' ELSE '#' END,
               CAST(n_chars AS VARCHAR),
               CASE CAST(substring(source, 4) AS INT) % 4
                 WHEN 0 THEN ',' WHEN 1 THEN ';'
                 WHEN 2 THEN '|' ELSE '#' END,
               lang) AS line
      FROM documents
    ),
    cand AS (SELECT unnest([',', ';', '|', '#']) AS d),
    counted AS (
      SELECT l.source, c.d,
             length(l.line) - length(replace(l.line, c.d, '')) AS k
      FROM lines l, cand c
    ),
    per AS (
      SELECT source, d,
             CAST(MIN(k) AS BIGINT) AS kmin,
             CAST(MAX(k) AS BIGINT) AS kmax,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM counted GROUP BY source, d
    )
    SELECT source,
           MAX(CASE WHEN kmin = kmax AND kmin >= 1 THEN d END) AS delim,
           CAST(MAX(CASE WHEN kmin = kmax AND kmin >= 1
                         THEN kmin + 1 END) AS BIGINT) AS n_fields,
           MAX(n_lines) AS n_lines
    FROM per GROUP BY source
    """,
)
def q_csv_sniff(spark, sf_dir):
    """CSV DIALECT SNIFFING — the ingest-time profiler that picks the
    delimiter of an unlabeled text feed the way csv.Sniffer does:
    a candidate separator is plausible iff its per-line occurrence
    count is CONSTANT across lines and ≥ 1 (real delimiters are
    structural; content characters vary). Lines are synthesized per
    source with a planted per-source delimiter between three
    delimiter-free fields, so exactly one candidate is consistent and
    the detector must recover the plant.

    Candidate counting is pure string arithmetic (length minus
    delimiter-stripped length) against a broadcast 4-row candidate
    table; consistency is a min=max check per (source, candidate) —
    two map-side-combinable aggs, no UDF, no window. At 100 TB this
    profiles a feed in one pass over a SAMPLE (the consistency
    predicate is exactly as valid on a sample — sniff then parse)."""
    docs = _t(spark, sf_dir, "documents")
    delim = F.expr(
        "CASE CAST(substring(source, 4) AS INT) % 4"
        " WHEN 0 THEN ',' WHEN 1 THEN ';' WHEN 2 THEN '|' ELSE '#' END"
    )
    lines = docs.select(
        "source",
        F.concat(
            F.regexp_replace(
                F.lower(F.substring("text", 1, 12)), "[^a-z]", ""
            ),
            delim,
            F.col("n_chars").cast("string"),
            delim,
            F.col("lang"),
        ).alias("line"),
    )
    cand = spark.createDataFrame(
        [(",",), (";",), ("|",), ("#",)], ["d"]
    )
    counted = lines.crossJoin(F.broadcast(cand)).select(
        "source",
        "d",
        (
            F.length("line")
            - F.length(F.expr("replace(line, d, '')"))
        ).alias("k"),
    )
    per = counted.groupBy("source", "d").agg(
        F.min("k").cast("bigint").alias("kmin"),
        F.max("k").cast("bigint").alias("kmax"),
        F.count("*").cast("bigint").alias("n_lines"),
    )
    ok = (F.col("kmin") == F.col("kmax")) & (F.col("kmin") >= 1)
    return per.groupBy("source").agg(
        F.max(F.when(ok, F.col("d"))).alias("delim"),
        F.max(F.when(ok, F.col("kmin") + 1))
        .cast("bigint")
        .alias("n_fields"),
        F.max("n_lines").alias("n_lines"),
    )


@staged(
    "q_outlier_iqr",
    oracle="""
    WITH ranked AS (
      SELECT event_type, CAST(floor(value) AS BIGINT) AS x,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY floor(value), event_id) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM events
    ),
    spec AS (SELECT * FROM (VALUES (25), (75)) AS t(pnum)),
    pos AS (
      SELECT DISTINCT r.event_type, r.n, s.pnum,
             ((r.n - 1) * s.pnum) // 100 + 1 AS lo_rk,
             CAST(((r.n - 1) * s.pnum) % 100 AS DOUBLE) / 100 AS frac
      FROM ranked r, spec s
    ),
    q AS (
      SELECT p.event_type, p.pnum,
             CAST(lo.x AS DOUBLE)
             + p.frac * CAST(hi.x - lo.x AS DOUBLE) AS qv
      FROM pos p
      JOIN ranked lo ON lo.event_type = p.event_type AND lo.rk = p.lo_rk
      JOIN ranked hi ON hi.event_type = p.event_type
                    AND hi.rk = CASE WHEN p.lo_rk + 1 > p.n
                                     THEN p.n ELSE p.lo_rk + 1 END
    ),
    fences AS (
      SELECT event_type,
             MAX(CASE WHEN pnum = 25 THEN qv END) AS q1,
             MAX(CASE WHEN pnum = 75 THEN qv END) AS q3
      FROM q GROUP BY event_type
    )
    SELECT r.event_type,
           f.q1, f.q3,
           f.q1 - 1.5 * (f.q3 - f.q1) AS lo_fence,
           f.q3 + 1.5 * (f.q3 - f.q1) AS hi_fence,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN CAST(r.x AS DOUBLE)
                              < f.q1 - 1.5 * (f.q3 - f.q1)
                           OR CAST(r.x AS DOUBLE)
                              > f.q3 + 1.5 * (f.q3 - f.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM ranked r JOIN fences f ON r.event_type = f.event_type
    GROUP BY r.event_type, f.q1, f.q3
    """,
)
def q_outlier_iqr(spark, sf_dir):
    """TUKEY-FENCE OUTLIER AUDIT (Q1/Q3 ± 1.5·IQR) per key — the
    boxplot rule, the robust cousin of q_anomaly_zscore (whose mean/σ
    are themselves dragged by the outliers they hunt) and the
    application layer over q_percentile_interp's type-7 quartiles.

    The quartiles keep the integer rank lattice ((n−1)·p // 100 order
    statistic + exact small-denominator fraction), the fences are a
    fixed multiply-add chain, and the flag count re-joins the fence
    row per key (broadcast — one row per key) so the scan stays one
    pass. Doubles compare bit-exactly because every engine-side
    expression tree is identical."""
    ev = _t(spark, sf_dir, "events")
    wr = Window.partitionBy("event_type").orderBy(
        F.floor("value"), "event_id"
    )
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        F.floor("value").cast("bigint").alias("x"),
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wn).cast("bigint").alias("n"),
    )
    spec = spark.createDataFrame([(25,), (75,)], ["pnum"])
    pos = (
        ranked.select("event_type", "n")
        .distinct()
        .crossJoin(F.broadcast(spec))
        .select(
            "event_type",
            "n",
            "pnum",
            F.expr("((n - 1) * pnum) div 100 + 1").alias("lo_rk"),
            (
                F.expr("CAST(((n - 1) * pnum) % 100 AS DOUBLE)")
                / F.lit(100)
            ).alias("frac"),
        )
    )
    lo = ranked.select(
        "event_type", F.col("rk").alias("lo_rk"), F.col("x").alias("xlo")
    )
    hi = ranked.select(
        "event_type", F.col("rk").alias("hi_rk"), F.col("x").alias("xhi")
    )
    q = (
        pos.join(lo, ["event_type", "lo_rk"])
        .withColumn(
            "hi_rk",
            F.when(
                F.col("lo_rk") + 1 > F.col("n"), F.col("n")
            ).otherwise(F.col("lo_rk") + 1),
        )
        .join(hi, ["event_type", "hi_rk"])
        .select(
            "event_type",
            "pnum",
            (
                F.col("xlo").cast("double")
                + F.col("frac")
                * (F.col("xhi") - F.col("xlo")).cast("double")
            ).alias("qv"),
        )
    )
    fences = q.groupBy("event_type").agg(
        F.max(F.when(F.col("pnum") == 25, F.col("qv"))).alias("q1"),
        F.max(F.when(F.col("pnum") == 75, F.col("qv"))).alias("q3"),
    )
    lo_f = F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))
    hi_f = F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))
    return (
        ranked.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(
                    (F.col("x").cast("double") < lo_f)
                    | (F.col("x").cast("double") > hi_f),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "q1",
            "q3",
            lo_f.alias("lo_fence"),
            hi_f.alias("hi_fence"),
            "n",
            "n_outliers",
        )
    )


@staged(
    "q_readability",
    oracle="""
    WITH counts AS (
      SELECT source,
             CAST(len(list_filter(string_split(lower(regexp_replace(
                    text, '[^a-zA-Z ]', ' ', 'g')), ' '),
                    t -> t != '')) AS BIGINT) AS words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS syls
      FROM documents
    ),
    agg AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(words) AS BIGINT) AS words,
             CAST(SUM(sents) AS BIGINT) AS sents,
             CAST(SUM(syls) AS BIGINT) AS syls
      FROM counts GROUP BY source
    )
    SELECT source, n_docs, words, sents, syls,
           0.39 * (CAST(words AS DOUBLE) / CAST(sents AS DOUBLE))
           + 11.8 * (CAST(syls AS DOUBLE) / CAST(words AS DOUBLE))
           - 15.59 AS fk_grade
    FROM agg
    """,
)
def q_readability(spark, sf_dir):
    """FLESCH-KINCAID GRADE per source — the readability screen a
    corpus-quality pipeline runs next to q_quality_score's surface
    ratios: grade = 0.39·(words/sentence) + 11.8·(syllables/word)
    − 15.59, with syllables approximated by VOWEL GROUPS (maximal
    [aeiouy]+ runs — the standard heuristic; the 0.39/11.8 weights are
    the published constants, exact decimals in both engines).

    All three inputs are integer counts from the same regex layer both
    engines share (token filter = the shingle tokenizer's, sentence
    enders as maximal [.!?]+ runs floored at 1, vowel-group count via
    regexp_extract_all length); the grade is a fixed two-division
    chain off the per-source sums. One map-side-combined agg — the
    regex work is partition-local, the shuffle carries 4 integers per
    source."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.select(
        "source",
        F.expr(
            "CAST(size(filter(split(lower(regexp_replace(text,"
            " '[^a-zA-Z ]', ' ')), ' '), t -> t != '')) AS BIGINT)"
        ).alias("words"),
        F.expr(
            "CAST(greatest(size(regexp_extract_all(text, '[.!?]+', 0)),"
            " 1) AS BIGINT)"
        ).alias("sents"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
            " AS BIGINT)"
        ).alias("syls"),
    )
    agg = counts.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("sents").cast("bigint").alias("sents"),
        F.sum("syls").cast("bigint").alias("syls"),
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sents",
        "syls",
        (
            F.lit(0.39)
            * (F.col("words").cast("double") / F.col("sents").cast("double"))
            + F.lit(11.8)
            * (F.col("syls").cast("double") / F.col("words").cast("double"))
            - F.lit(15.59)
        ).alias("fk_grade"),
    )


@staged(
    "q_forecast_backtest",
    oracle="""
    WITH base AS (
      SELECT g.event_type, g.b, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
      FROM (SELECT t.event_type, r.b
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT unnest(range(0, 32)) AS b) r) g
      LEFT JOIN (
        SELECT event_type,
               (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 32 AS b,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM events GROUP BY event_type, b
      ) c ON c.event_type = g.event_type AND c.b = g.b
    ),
    lagged AS (
      SELECT event_type, b, v,
             lag(v, 1) OVER w AS naive,
             lag(v, 24) OVER w AS snaive
      FROM base WINDOW w AS (PARTITION BY event_type ORDER BY b)
    ),
    scored AS (
      SELECT event_type,
             abs(v - naive) AS e_naive,
             abs(v - snaive) AS e_snaive
      FROM lagged WHERE b >= 24
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_evals,
           CAST(SUM(e_naive) AS BIGINT) AS ae_naive,
           CAST(SUM(e_snaive) AS BIGINT) AS ae_snaive,
           CAST(SUM(e_naive) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mae_naive,
           CAST(SUM(e_snaive) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mae_snaive,
           CASE WHEN SUM(e_snaive) < SUM(e_naive) THEN 'seasonal'
                WHEN SUM(e_naive) < SUM(e_snaive) THEN 'naive'
                ELSE 'tie' END AS winner
    FROM scored GROUP BY event_type
    """,
)
def q_forecast_backtest(spark, sf_dir):
    """ROLLING-ORIGIN FORECAST BACKTEST — the evaluation harness the
    fitting queries (q_ewma / q_holt_smoothing / q_holt_winters /
    q_seasonal_baseline) need before anyone trusts them: replay the
    per-key hourly series, at each origin b ≥ 24 forecast b from the
    PAST ONLY (naive = v[b−1], seasonal-naive = v[b−24]), score both
    with absolute error, and declare the per-key winner on the exact
    integer error totals (the MAE division is reporting, not
    decision — ties are decided on the lattice, never on doubles).

    Two lag windows over one per-key partitioning (a single exchange);
    the backtest never leaks the future because lag() is structurally
    past-only — the property the witness pins. At 100 TB: the grid is
    |keys|×32 POST-aggregation rows; model selection per key costs one
    window pass, not one model-fit per origin."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        (
            (F.unix_timestamp("ts").cast("bigint") / 3600).cast("bigint")
            % 32
        ).alias("b"),
    ).agg(F.count("*").cast("bigint").alias("v"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(32).select(F.col("id").alias("b")))
        )
    )
    base = grid.join(counts, ["event_type", "b"], "left").select(
        "event_type",
        "b",
        F.coalesce("v", F.lit(0)).cast("bigint").alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy("b")
    lagged = base.select(
        "event_type",
        "b",
        "v",
        F.lag("v", 1).over(w).alias("naive"),
        F.lag("v", 24).over(w).alias("snaive"),
    ).filter(F.col("b") >= 24)
    scored = lagged.select(
        "event_type",
        F.abs(F.col("v") - F.col("naive")).alias("e_naive"),
        F.abs(F.col("v") - F.col("snaive")).alias("e_snaive"),
    )
    return scored.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_evals"),
        F.sum("e_naive").cast("bigint").alias("ae_naive"),
        F.sum("e_snaive").cast("bigint").alias("ae_snaive"),
        (
            F.sum("e_naive").cast("double")
            / F.count("*").cast("double")
        ).alias("mae_naive"),
        (
            F.sum("e_snaive").cast("double")
            / F.count("*").cast("double")
        ).alias("mae_snaive"),
        F.when(
            F.sum("e_snaive") < F.sum("e_naive"), F.lit("seasonal")
        )
        .when(F.sum("e_naive") < F.sum("e_snaive"), F.lit("naive"))
        .otherwise(F.lit("tie"))
        .alias("winner"),
    )


@staged(
    "q_ua_parse",
    oracle="""
    WITH ua AS (
      SELECT event_id,
             concat('Mozilla/5.0 (',
                    CASE user_id % 3 WHEN 0 THEN 'Windows NT 10.0'
                      WHEN 1 THEN 'Macintosh; Intel Mac OS X 10_15'
                      ELSE 'X11; Linux x86_64' END,
                    ') ',
                    CASE event_id % 3 WHEN 0
                      THEN concat('Chrome/',
                                  CAST(100 + event_id % 30 AS VARCHAR),
                                  '.0.0.0 Safari/537.36')
                      WHEN 1
                      THEN concat('Firefox/',
                                  CAST(90 + event_id % 40 AS VARCHAR),
                                  '.0')
                      ELSE concat('Version/',
                                  CAST(14 + event_id % 4 AS VARCHAR),
                                  '.0 Safari/605.1.15') END) AS s
      FROM events
    ),
    parsed AS (
      SELECT CASE WHEN s LIKE '%Chrome/%' THEN 'chrome'
                  WHEN s LIKE '%Firefox/%' THEN 'firefox'
                  ELSE 'safari' END AS browser,
             CASE WHEN regexp_extract(s, 'Chrome/([0-9]+)', 1) != ''
                  THEN CAST(regexp_extract(s, 'Chrome/([0-9]+)', 1)
                            AS BIGINT)
                  WHEN regexp_extract(s, 'Firefox/([0-9]+)', 1) != ''
                  THEN CAST(regexp_extract(s, 'Firefox/([0-9]+)', 1)
                            AS BIGINT)
                  ELSE CAST(regexp_extract(s, 'Version/([0-9]+)', 1)
                            AS BIGINT) END AS major,
             CASE WHEN s LIKE '%Windows%' THEN 'windows'
                  WHEN s LIKE '%Mac OS X%' THEN 'macos'
                  ELSE 'linux' END AS os
      FROM ua
    )
    SELECT browser, os,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(major) AS BIGINT) AS min_major,
           CAST(MAX(major) AS BIGINT) AS max_major
    FROM parsed GROUP BY browser, os
    """,
)
def q_ua_parse(spark, sf_dir):
    """USER-AGENT PARSING — the rule-based enrichment every access-log
    pipeline runs at ingest (the string-side sibling of q_cidr_enrich):
    classify browser family by marker token, extract the major version
    with family-specific regexes (Safari reports Version/, not
    Safari/ — the classic UA trap, planted here), and classify OS from
    the parenthesized platform segment.

    Synthesized UAs cover the 3×3 family/OS grid with data-dependent
    versions so every regex branch is exercised. All LIKE + regex
    built-ins (partition-local, codegen), one shuffle for the
    (browser, os) rollup with version ranges as the parse audit."""
    ev = _t(spark, sf_dir, "events")
    ua = ev.select(
        F.concat(
            F.lit("Mozilla/5.0 ("),
            F.expr(
                "CASE user_id % 3 WHEN 0 THEN 'Windows NT 10.0'"
                " WHEN 1 THEN 'Macintosh; Intel Mac OS X 10_15'"
                " ELSE 'X11; Linux x86_64' END"
            ),
            F.lit(") "),
            F.expr(
                "CASE event_id % 3 WHEN 0"
                " THEN concat('Chrome/',"
                "             CAST(100 + event_id % 30 AS STRING),"
                "             '.0.0.0 Safari/537.36')"
                " WHEN 1"
                " THEN concat('Firefox/',"
                "             CAST(90 + event_id % 40 AS STRING), '.0')"
                " ELSE concat('Version/',"
                "             CAST(14 + event_id % 4 AS STRING),"
                "             '.0 Safari/605.1.15') END"
            ),
        ).alias("s")
    )
    parsed = ua.select(
        F.when(F.col("s").like("%Chrome/%"), F.lit("chrome"))
        .when(F.col("s").like("%Firefox/%"), F.lit("firefox"))
        .otherwise(F.lit("safari"))
        .alias("browser"),
        F.when(
            F.regexp_extract("s", r"Chrome/([0-9]+)", 1) != "",
            F.regexp_extract("s", r"Chrome/([0-9]+)", 1).cast("bigint"),
        )
        .when(
            F.regexp_extract("s", r"Firefox/([0-9]+)", 1) != "",
            F.regexp_extract("s", r"Firefox/([0-9]+)", 1).cast("bigint"),
        )
        .otherwise(
            F.regexp_extract("s", r"Version/([0-9]+)", 1).cast("bigint")
        )
        .alias("major"),
        F.when(F.col("s").like("%Windows%"), F.lit("windows"))
        .when(F.col("s").like("%Mac OS X%"), F.lit("macos"))
        .otherwise(F.lit("linux"))
        .alias("os"),
    )
    return parsed.groupBy("browser", "os").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("major").cast("bigint").alias("min_major"),
        F.max("major").cast("bigint").alias("max_major"),
    )


@staged(
    "q_modularity",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT
             least(user_id % 41, (2 * user_id + event_id) % 41) AS a,
             greatest(user_id % 41, (2 * user_id + event_id) % 41) AS b
      FROM events
      WHERE least(user_id % 41, (2 * user_id + event_id) % 41)
            != greatest(user_id % 41, (2 * user_id + event_id) % 41)
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
    within AS (
      SELECT a % 4 AS community, CAST(COUNT(*) AS BIGINT) AS e_c
      FROM edges WHERE a % 4 = b % 4 GROUP BY community
    ),
    degs AS (
      SELECT v % 4 AS community, CAST(SUM(d) AS BIGINT) AS d_c
      FROM (
        SELECT a AS v, COUNT(*) AS d FROM edges GROUP BY a
        UNION ALL
        SELECT b AS v, COUNT(*) AS d FROM edges GROUP BY b
      ) GROUP BY community
    )
    SELECT d.community,
           COALESCE(w.e_c, 0) AS e_c,
           d.d_c,
           CAST(4 * m.m * COALESCE(w.e_c, 0) - d.d_c * d.d_c AS DOUBLE)
             / CAST(4 * m.m * m.m AS DOUBLE) AS q_contrib
    FROM degs d LEFT JOIN within w ON d.community = w.community
    CROSS JOIN m
    """,
)
def q_modularity(spark, sf_dir):
    """GRAPH MODULARITY per community — the partition-quality score
    behind every community-detection loop (q_label_propagation finds
    the labels; this evaluates them): Q = Σ_c [e_c/m − (d_c/2m)²]
    over the 41-node event graph (q_kcore's edge construction) with
    the v%4 partition.

    The whole score reduces to THREE integer aggregates (edge count m,
    within-community edges e_c, community degree sums d_c — degrees
    via a two-sided endpoint union so undirected edges count once per
    endpoint), and each community's contribution is the single exact
    division (4m·e_c − d_c²)/(4m²) — the algebraic clearing that keeps
    modularity on the integer lattice until one final divide. The
    1-row m frame broadcasts; nothing iterates. Σ q_contrib IS Q, but
    the per-community rows are emitted so the comparison is granular
    (and the witness checks Q ∈ [−½, 1])."""
    ev = _t(spark, sf_dir, "events")
    edges = (
        ev.selectExpr(
            "least(user_id % 41, (2 * user_id + event_id) % 41) AS a",
            "greatest(user_id % 41, (2 * user_id + event_id) % 41) AS b",
        )
        .filter("a != b")
        .distinct()
    )
    m = edges.agg(F.count("*").cast("bigint").alias("m"))
    within = (
        edges.filter(F.col("a") % 4 == F.col("b") % 4)
        .groupBy((F.col("a") % 4).alias("community"))
        .agg(F.count("*").cast("bigint").alias("e_c"))
    )
    degs = (
        edges.groupBy(F.col("a").alias("v"))
        .agg(F.count("*").alias("d"))
        .unionByName(
            edges.groupBy(F.col("b").alias("v")).agg(
                F.count("*").alias("d")
            )
        )
        .groupBy((F.col("v") % 4).alias("community"))
        .agg(F.sum("d").cast("bigint").alias("d_c"))
    )
    return (
        degs.join(within, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            F.coalesce("e_c", F.lit(0)).cast("bigint").alias("e_c"),
            "d_c",
            (
                (
                    4 * F.col("m") * F.coalesce("e_c", F.lit(0))
                    - F.col("d_c") * F.col("d_c")
                ).cast("double")
                / (4 * F.col("m") * F.col("m")).cast("double")
            ).alias("q_contrib"),
        )
    )


@staged(
    "q_er_score",
    oracle="""
    WITH parts AS (
      SELECT p_partkey, p_brand, p_size,
             string_split(p_name, ' ')[2] AS noun,
             string_split(p_type, ' ')[1] AS tword
      FROM part
    ),
    pairs AS (
      SELECT a.p_partkey AS ka, b.p_partkey AS kb,
             (CASE WHEN a.p_brand = b.p_brand THEN 3 ELSE 0 END
              + CASE WHEN a.tword = b.tword THEN 2 ELSE 0 END
              + CASE WHEN abs(a.p_size - b.p_size) <= 2 THEN 1 ELSE 0
                END) AS score
      FROM parts a JOIN parts b
        ON a.noun = b.noun AND a.p_partkey < b.p_partkey
    ),
    classed AS (
      SELECT CASE WHEN score >= 5 THEN 'match'
                  WHEN score >= 3 THEN 'possible'
                  ELSE 'non_match' END AS verdict,
             score
      FROM pairs
    )
    SELECT verdict,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(score) AS BIGINT) AS score_sum,
           CAST(SUM(score) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_score
    FROM classed GROUP BY verdict
    """,
)
def q_er_score(spark, sf_dir):
    """ENTITY-RESOLUTION SCORING over blocked pairs — the
    Fellegi-Sunter-style back half whose front half is
    q_phonetic_blocking: candidate pairs come only from a BLOCK join
    (same name noun — equi-keyed, never all-pairs), each pair scores
    integer agreement weights per field (brand +3, type word +2, size
    within ±2 +1), and thresholds classify match / possible /
    non-match.

    The block join is the scale contract: pair count is Σ_b |b|²
    over block sizes, not n² — the histogram q_phonetic_blocking
    emits is precisely the blow-up audit for THIS join. Scores and
    thresholds are pure integers; only the per-verdict mean divides.
    The a < b key order emits each unordered pair once."""
    pt = _t(spark, sf_dir, "part")
    parts = pt.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.expr("element_at(split(p_name, ' '), 2)").alias("noun"),
        F.expr("element_at(split(p_type, ' '), 1)").alias("tword"),
    )
    a = parts.alias("a")
    b = parts.alias("b")
    pairs = a.join(
        b,
        (F.col("a.noun") == F.col("b.noun"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(
        (
            F.when(F.col("a.p_brand") == F.col("b.p_brand"), 3).otherwise(0)
            + F.when(F.col("a.tword") == F.col("b.tword"), 2).otherwise(0)
            + F.when(
                F.abs(F.col("a.p_size") - F.col("b.p_size")) <= 2, 1
            ).otherwise(0)
        ).alias("score")
    )
    classed = pairs.select(
        F.when(F.col("score") >= 5, F.lit("match"))
        .when(F.col("score") >= 3, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("verdict"),
        "score",
    )
    return classed.groupBy("verdict").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("score").cast("bigint").alias("score_sum"),
        (
            F.sum("score").cast("double") / F.count("*").cast("double")
        ).alias("avg_score"),
    )


@staged(
    "q_flow_stitch",
    oracle="""
    WITH flows AS (
      SELECT user_id % 50 AS src,
             (user_id * 7 + event_id) % 50 AS dst,
             CAST(floor(value) AS BIGINT) AS bytes
      FROM events
      WHERE user_id % 50 != (user_id * 7 + event_id) % 50
    ),
    canon AS (
      SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
             CASE WHEN src < dst THEN bytes ELSE 0 END AS fwd_b,
             CASE WHEN src > dst THEN bytes ELSE 0 END AS rev_b,
             CASE WHEN src < dst THEN 1 ELSE 0 END AS fwd_n,
             CASE WHEN src > dst THEN 1 ELSE 0 END AS rev_n
      FROM flows
    )
    SELECT lo, hi,
           CAST(SUM(fwd_n) AS BIGINT) AS n_fwd,
           CAST(SUM(rev_n) AS BIGINT) AS n_rev,
           CAST(SUM(fwd_b) AS BIGINT) AS bytes_fwd,
           CAST(SUM(rev_b) AS BIGINT) AS bytes_rev,
           CASE WHEN SUM(fwd_n) > 0 AND SUM(rev_n) > 0
                THEN 1 ELSE 0 END AS bidirectional
    FROM canon GROUP BY lo, hi
    """,
)
def q_flow_stitch(spark, sf_dir):
    """BIDIRECTIONAL FLOW STITCHING — the session-reassembly pass a
    flow-log analyzer runs before any conversation-level analytics
    (VPC flow logs record each direction as a separate record; NAT/
    asymmetric-routing audits need them paired): canonicalize each
    flow to its unordered endpoint pair via (least, greatest), fold
    direction into per-side counters in the SAME aggregation, and
    flag pairs seen in both directions.

    One canonical-key groupBy — no self-join (the naive A→B ⋈ B→A
    pairing shuffles twice and drops one-sided flows; the
    canonicalize-then-aggregate shape is one exchange and keeps them).
    Direction survives canonicalization as conditional columns, the
    trick that makes the single pass sufficient. All-integer."""
    ev = _t(spark, sf_dir, "events")
    flows = ev.select(
        (F.col("user_id") % 50).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"),
        F.floor("value").cast("bigint").alias("bytes"),
    ).filter(F.col("src") != F.col("dst"))
    canon = flows.select(
        F.least("src", "dst").alias("lo"),
        F.greatest("src", "dst").alias("hi"),
        F.when(F.col("src") < F.col("dst"), F.col("bytes"))
        .otherwise(0)
        .alias("fwd_b"),
        F.when(F.col("src") > F.col("dst"), F.col("bytes"))
        .otherwise(0)
        .alias("rev_b"),
        F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("fwd_n"),
        F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("rev_n"),
    )
    return canon.groupBy("lo", "hi").agg(
        F.sum("fwd_n").cast("bigint").alias("n_fwd"),
        F.sum("rev_n").cast("bigint").alias("n_rev"),
        F.sum("fwd_b").cast("bigint").alias("bytes_fwd"),
        F.sum("rev_b").cast("bigint").alias("bytes_rev"),
        F.when(
            (F.sum("fwd_n") > 0) & (F.sum("rev_n") > 0), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("bidirectional"),
    )


@staged(
    "q_feature_hash_audit",
    oracle="""
    WITH words AS (
      SELECT list_filter(string_split(lower(
               regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), ' '),
               t -> t != '') AS ws
      FROM documents
    ),
    toks AS (
      SELECT DISTINCT unnest(list_transform(
               generate_series(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i + 1])) AS tok
      FROM words WHERE len(ws) >= 2
    ),
    hashed AS (
      SELECT tok,
             ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
      FROM toks
    ),
    ks AS (SELECT unnest([256, 1024, 4096]) AS n_buckets)
    SELECT k.n_buckets,
           CAST(COUNT(*) AS BIGINT) AS n_features,
           CAST(COUNT(DISTINCT h.h % k.n_buckets) AS BIGINT)
             AS n_used_buckets,
           CAST(COUNT(*) - COUNT(DISTINCT h.h % k.n_buckets) AS BIGINT)
             AS n_collisions
    FROM hashed h, ks k
    GROUP BY k.n_buckets
    """,
)
def q_feature_hash_audit(spark, sf_dir):
    """FEATURE-HASHING COLLISION AUDIT — the capacity check behind the
    hashing trick (Weinberger et al.): before a pipeline hashes its
    vocabulary into 2^k feature buckets, measure exactly how many
    distinct features collide at each candidate width. Collisions =
    |features| − |occupied buckets|, computed per width against the
    corpus's real distinct-token set (the shingle tokenizer's output),
    with the same md5→60-bit→mod bucket function the downstream
    featurizer would use. Features are adjacent-token BIGRAMS — the
    unigram vocabulary of this corpus (31 words) fits every candidate
    width collision-free, so bigrams (916) are what make the audit
    informative.

    One distinct-token reduction (map-side combined), then a broadcast
    3-row width table and per-width COUNT DISTINCT — the audit costs
    one pass regardless of how many widths are probed. At 100 TB the
    token distinct is the only real shuffle; everything after operates
    on the vocabulary, not the corpus."""
    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.expr(
                "filter(split(lower(regexp_replace(text,"
                " '[^a-zA-Z0-9 ]', ' ')), ' '), t -> t != '')"
            ).alias("ws")
        )
        .filter(F.expr("size(ws) >= 2"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1), i ->"
                    " concat(element_at(ws, i), ' ',"
                    "        element_at(ws, i + 1)))"
                )
            ).alias("tok")
        )
        .distinct()
    )
    hashed = toks.select(
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    ks = spark.createDataFrame([(256,), (1024,), (4096,)], ["n_buckets"])
    return (
        hashed.crossJoin(F.broadcast(ks))
        .groupBy("n_buckets")
        .agg(
            F.count("*").cast("bigint").alias("n_features"),
            F.countDistinct(F.col("h") % F.col("n_buckets"))
            .cast("bigint")
            .alias("n_used_buckets"),
            (
                F.count("*")
                - F.countDistinct(F.col("h") % F.col("n_buckets"))
            )
            .cast("bigint")
            .alias("n_collisions"),
        )
    )


@staged(
    "q_revenue_recognition",
    oracle="""
    WITH sched AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
             1 + o_orderkey % 4 AS n_periods,
             strftime(date_trunc('month', o_orderdate), '%Y-%m')
               AS start_month,
             unnest(range(0, 1 + o_orderkey % 4)) AS k
      FROM orders
    ),
    spread AS (
      SELECT strftime(date_trunc('month', o_orderdate)
                      + to_months(CAST(s.k AS INT)), '%Y-%m')
               AS period,
             s.cents // s.n_periods
             + CASE WHEN s.k < s.cents % s.n_periods THEN 1 ELSE 0 END
               AS rec_cents
      FROM sched s JOIN orders o ON s.o_orderkey = o.o_orderkey
    )
    SELECT period,
           CAST(COUNT(*) AS BIGINT) AS n_slices,
           CAST(SUM(rec_cents) AS BIGINT) AS recognized_cents
    FROM spread GROUP BY period
    """,
)
def q_revenue_recognition(spark, sf_dir):
    """REVENUE-RECOGNITION SCHEDULE — the deferral waterfall an
    accounting close runs (ASC 606 flavor): each order's total spreads
    over its contract term (1–4 months, key-derived) in equal monthly
    slices, with the integer REMAINDER distributed one cent at a time
    to the EARLIEST periods (the largest-remainder rule q_largest_
    remainder uses for seats, applied to cents — Σ slices ≡ the
    original total exactly, the invariant the witness pins per order).

    The spread is one explode against a per-order month sequence (no
    join against a calendar — the sequence is derived from the order
    row) followed by one per-period rollup; money stays integer CENTS
    end-to-end (floor(price·100) — never floating-point currency).
    At 100 TB: fan-out ≤ 4×, one exchange."""
    od = _t(spark, sf_dir, "orders")
    sched = od.select(
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
        (1 + F.col("o_orderkey") % 4).alias("n_periods"),
        F.date_trunc("month", "o_orderdate").alias("m0"),
        F.explode(
            F.expr("sequence(0, CAST(o_orderkey % 4 AS INT))")
        ).alias("k"),
    )
    spread = sched.select(
        F.date_format(
            F.expr("add_months(m0, k)"), "yyyy-MM"
        ).alias("period"),
        (
            F.expr("cents div n_periods")
            + F.when(
                F.col("k") < F.col("cents") % F.col("n_periods"), 1
            ).otherwise(0)
        ).alias("rec_cents"),
    )
    return spread.groupBy("period").agg(
        F.count("*").cast("bigint").alias("n_slices"),
        F.sum("rec_cents").cast("bigint").alias("recognized_cents"),
    )


@staged(
    "q_diff_in_diff",
    oracle="""
    WITH cells AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS treated,
             CAST(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sy
      FROM events GROUP BY treated, post
    )
    SELECT treated, post, n, sy,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
           (SELECT (CAST(t1.sy AS DOUBLE) / t1.n
                    - CAST(t0.sy AS DOUBLE) / t0.n)
                   - (CAST(c1.sy AS DOUBLE) / c1.n
                      - CAST(c0.sy AS DOUBLE) / c0.n)
            FROM cells t1, cells t0, cells c1, cells c0
            WHERE t1.treated = 1 AND t1.post = 1
              AND t0.treated = 1 AND t0.post = 0
              AND c1.treated = 0 AND c1.post = 1
              AND c0.treated = 0 AND c0.post = 0) AS did_estimate
    FROM cells
    """,
)
def q_diff_in_diff(spark, sf_dir):
    """DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator for
    rollouts without randomization (completes the causal family:
    q_ab_test randomized deltas, q_ab_cuped variance reduction,
    q_ratio_delta_method ratio SEs): DiD = (treated-post −
    treated-pre) − (control-post − control-pre), differencing away
    both the group's fixed offset and the period's common shock.

    The whole estimator is a 2×2 cell aggregation (one
    map-side-combined pass) plus a four-cell arithmetic readout; the
    estimate rides on every output row next to its cell mean so the
    result is one relation (cells + estimate), not a scalar side
    channel. Integer lattice to the final fixed division chain."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("treated"),
        F.when(F.col("event_id") % 3 == 0, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("post"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.floor("value").cast("bigint")).cast("bigint").alias("sy"),
    )
    mean = F.col("sy").cast("double") / F.col("n").cast("double")
    # assemble the 4 cell means via broadcasts of 1-row slices — no
    # driver collect
    t1 = cells.filter("treated = 1 AND post = 1").select(
        (F.col("sy").cast("double") / F.col("n")).alias("m_t1")
    )
    t0 = cells.filter("treated = 1 AND post = 0").select(
        (F.col("sy").cast("double") / F.col("n")).alias("m_t0")
    )
    c1 = cells.filter("treated = 0 AND post = 1").select(
        (F.col("sy").cast("double") / F.col("n")).alias("m_c1")
    )
    c0 = cells.filter("treated = 0 AND post = 0").select(
        (F.col("sy").cast("double") / F.col("n")).alias("m_c0")
    )
    did = (
        t1.crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(c1))
        .crossJoin(F.broadcast(c0))
        .select(
            (
                (F.col("m_t1") - F.col("m_t0"))
                - (F.col("m_c1") - F.col("m_c0"))
            ).alias("did_estimate")
        )
    )
    return cells.crossJoin(F.broadcast(did)).select(
        "treated",
        "post",
        "n",
        "sy",
        mean.alias("mean_y"),
        "did_estimate",
    )


@staged(
    "q_grid_hotspot",
    oracle="""
    WITH cells AS (
      SELECT CAST(event_id % 40 AS BIGINT) AS x,
             CAST(user_id % 25 AS BIGINT) AS y,
             CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY x, y
    ),
    offs AS (
      SELECT (i // 3) - 1 AS dx, (i % 3) - 1 AS dy
      FROM (SELECT unnest(range(0, 9)) AS i)
    ),
    local_ AS (
      SELECT c.x + o.dx AS x, c.y + o.dy AS y,
             CAST(SUM(c.v) AS BIGINT) AS lsum,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM cells c, offs o
      WHERE c.x + o.dx BETWEEN 0 AND 39
        AND c.y + o.dy BETWEEN 0 AND 24
      GROUP BY 1, 2
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(v * v) AS BIGINT) AS svv
      FROM cells
    )
    SELECT l.x, l.y, l.lsum, l.k,
           (CAST(l.lsum AS DOUBLE)
            - l.k * (CAST(g.sv AS DOUBLE) / CAST(g.n AS DOUBLE)))
           / sqrt(CAST(l.k AS DOUBLE)
                  * (CAST(g.n * g.svv - g.sv * g.sv AS DOUBLE)
                     / CAST(g.n * (g.n - 1) AS DOUBLE)))
             AS z
    FROM local_ l CROSS JOIN g
    WHERE (CAST(l.lsum AS DOUBLE)
           - l.k * (CAST(g.sv AS DOUBLE) / CAST(g.n AS DOUBLE)))
          / sqrt(CAST(l.k AS DOUBLE)
                 * (CAST(g.n * g.svv - g.sv * g.sv AS DOUBLE)
                    / CAST(g.n * (g.n - 1) AS DOUBLE))) > 2.0
    """,
)
def q_grid_hotspot(spark, sf_dir):
    """SPATIAL HOTSPOT DETECTION (Getis-Ord-style local z) — the
    composition layer over q_grid_stencil's scatter-gather: each
    cell's 3×3 neighborhood sum is z-scored against what k random
    cells would sum to (k·mean, sd·√k), and cells with z > 2 are the
    hotspots a geo-monitoring pipeline alerts on.

    The neighborhood sums reuse the broadcast-offsets fan-out (one
    join, one gather exchange); the global moments are ONE 1-row
    aggregate broadcast into the z expression; the z chain is a fixed
    division/sqrt sequence off the integer lattice, written once and
    reused verbatim in the threshold predicate so both engines
    evaluate the identical tree twice. Border cells are handled by
    k (the actual neighbor count), not padding — the z normalization
    self-adjusts at edges."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % 40).cast("bigint").alias("x"),
        (F.col("user_id") % 25).cast("bigint").alias("y"),
    ).agg(
        F.sum(F.floor("value").cast("bigint")).cast("bigint").alias("v")
    )
    offs = spark.range(9).select(
        F.expr("CAST(id div 3 AS BIGINT) - 1").alias("dx"),
        (F.col("id") % 3 - 1).alias("dy"),
    )
    local = (
        cells.crossJoin(F.broadcast(offs))
        .select(
            (F.col("x") + F.col("dx")).cast("bigint").alias("x"),
            (F.col("y") + F.col("dy")).cast("bigint").alias("y"),
            "v",
        )
        .filter(
            (F.col("x") >= 0)
            & (F.col("x") <= 39)
            & (F.col("y") >= 0)
            & (F.col("y") <= 24)
        )
        .groupBy("x", "y")
        .agg(
            F.sum("v").cast("bigint").alias("lsum"),
            F.count("*").cast("bigint").alias("k"),
        )
    )
    g = cells.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("svv"),
    )
    z = (
        F.col("lsum").cast("double")
        - F.col("k") * (F.col("sv").cast("double") / F.col("n").cast("double"))
    ) / F.sqrt(
        F.col("k").cast("double")
        * (
            (F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")).cast(
                "double"
            )
            / (F.col("n") * (F.col("n") - 1)).cast("double")
        )
    )
    return (
        local.crossJoin(F.broadcast(g))
        .filter(z > 2.0)
        .select("x", "y", "lsum", "k", z.alias("z"))
    )


@staged(
    "q_reconciliation",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS line_cents,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    matched AS (
      SELECT o.o_orderkey,
             CAST(floor(o.o_totalprice * 100) AS BIGINT) AS order_cents,
             li.line_cents, li.n_lines,
             CASE
               WHEN li.l_orderkey IS NULL THEN 'no_lines'
               WHEN abs(CAST(floor(o.o_totalprice * 100) AS BIGINT)
                        - li.line_cents)
                    * 100 <= CAST(floor(o.o_totalprice * 100) AS BIGINT)
                 THEN 'within_1pct'
               ELSE 'mismatch'
             END AS status
      FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(order_cents) AS BIGINT) AS order_cents,
           CAST(SUM(COALESCE(line_cents, 0)) AS BIGINT) AS line_cents,
           CAST(SUM(abs(order_cents - COALESCE(line_cents, 0)))
                AS BIGINT) AS abs_gap_cents
    FROM matched GROUP BY status
    """,
)
def q_reconciliation(spark, sf_dir):
    """TWO-WAY RECONCILIATION (order header vs line detail) — the
    close-of-books control q_ref_integrity's existence check doesn't
    cover: roll line amounts up per order and classify each order by
    whether the header total agrees WITHIN TOLERANCE (1%, expressed as
    the cross-multiplied integer predicate |gap|·100 ≤ total — no
    float ratio, so the tolerance band has no rounding edge), plus the
    headers with no lines at all.

    One map-side-combined line rollup, one left join on the order key,
    one status rollup carrying both sides' totals and the absolute gap
    (the number an auditor chases). Money stays integer cents; at
    100 TB both joins are equi-keyed on the same key so co-partitioned
    layouts make the whole control shuffle-once."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    rolled = li.groupBy("l_orderkey").agg(
        F.sum(F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("line_cents"),
        F.count("*").cast("bigint").alias("n_lines"),
    )
    matched = od.join(
        rolled, od["o_orderkey"] == rolled["l_orderkey"], "left"
    ).select(
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias(
            "order_cents"
        ),
        "line_cents",
        F.when(F.col("l_orderkey").isNull(), F.lit("no_lines"))
        .when(
            F.abs(
                F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
                - F.col("line_cents")
            )
            * 100
            <= F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"),
            F.lit("within_1pct"),
        )
        .otherwise(F.lit("mismatch"))
        .alias("status"),
    )
    return matched.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("order_cents").cast("bigint").alias("order_cents"),
        F.sum(F.coalesce("line_cents", F.lit(0)))
        .cast("bigint")
        .alias("line_cents"),
        F.sum(
            F.abs(
                F.col("order_cents") - F.coalesce("line_cents", F.lit(0))
            )
        )
        .cast("bigint")
        .alias("abs_gap_cents"),
    )


@staged(
    "q_sampling_temperature",
    oracle="""
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    wq AS (
      SELECT source, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
               AS w_q
      FROM per
    ),
    tot AS (
      SELECT CAST(SUM(w_q) AS BIGINT) AS wtot,
             CAST(SUM(n) AS BIGINT) AS ntot
      FROM wq
    )
    SELECT w.source, w.n, w.w_q,
           CAST(w.w_q AS DOUBLE) / CAST(t.wtot AS DOUBLE) AS share,
           CAST(w.w_q * 10000 // t.wtot AS BIGINT) AS alloc_10k,
           (CAST(w.w_q AS DOUBLE) / CAST(t.wtot AS DOUBLE))
           / (CAST(w.n AS DOUBLE) / CAST(t.ntot AS DOUBLE)) AS boost
    FROM wq w CROSS JOIN tot t
    """,
)
def q_sampling_temperature(spark, sf_dir):
    """TEMPERATURE-SCALED MIXTURE WEIGHTS (α = 0.5) — the multilingual
    sampling rule (mC4/XLM-R style): sample source i with probability
    ∝ nᵢ^α so small sources are up-weighted (boost > 1) and giants
    down-weighted, the knob that stops one crawl from drowning a
    mixture.

    √n is an IEEE-correctly-rounded intrinsic, but SUMMING the raw
    double weights across sources would be order-dependent — so each
    weight quantizes to the 1e-6 lattice FIRST (floor(√n·10⁶), the
    q_trending technique) and the normalizer is an exact integer sum;
    shares and boosts are then fixed division chains. alloc_10k uses
    integer floor allocation (the q_largest_remainder family's
    truncation step). One tiny agg + a 1-row broadcast."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wq = per.select(
        "source",
        "n",
        F.floor(F.sqrt(F.col("n").cast("double")) * 1000000)
        .cast("bigint")
        .alias("w_q"),
    )
    tot = wq.agg(
        F.sum("w_q").cast("bigint").alias("wtot"),
        F.sum("n").cast("bigint").alias("ntot"),
    )
    share = F.col("w_q").cast("double") / F.col("wtot").cast("double")
    return wq.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "w_q",
        share.alias("share"),
        F.expr("CAST(w_q * 10000 div wtot AS BIGINT)").alias("alloc_10k"),
        (
            share
            / (F.col("n").cast("double") / F.col("ntot").cast("double"))
        ).alias("boost"),
    )


@staged(
    "q_span_f1",
    oracle="""
    WITH gold AS (
      SELECT source, doc_id, doc_id % 20 AS s, doc_id % 20 + 4 AS e
      FROM documents
      UNION ALL
      SELECT source, doc_id, doc_id % 20 + 7, doc_id % 20 + 9
      FROM documents
    ),
    pred AS (
      SELECT source, doc_id,
             doc_id % 20 + (doc_id % 3 - 1) AS s,
             doc_id % 20 + 4 + (doc_id % 3 - 1) AS e
      FROM documents
      UNION ALL
      SELECT source, doc_id, doc_id % 20 + 7, doc_id % 20 + 9
      FROM documents
    ),
    tp AS (
      SELECT g.source, CAST(COUNT(*) AS BIGINT) AS tp
      FROM gold g JOIN pred p
        ON g.doc_id = p.doc_id AND g.s = p.s AND g.e = p.e
      GROUP BY g.source
    ),
    sizes AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_gold
      FROM gold GROUP BY source
    )
    SELECT z.source, t.tp, z.n_gold AS n_gold, z.n_gold AS n_pred,
           CAST(t.tp AS DOUBLE) / CAST(z.n_gold AS DOUBLE) AS precision_,
           CAST(t.tp AS DOUBLE) / CAST(z.n_gold AS DOUBLE) AS recall_,
           2.0 * (CAST(t.tp AS DOUBLE) / CAST(z.n_gold AS DOUBLE))
               * (CAST(t.tp AS DOUBLE) / CAST(z.n_gold AS DOUBLE))
           / ((CAST(t.tp AS DOUBLE) / CAST(z.n_gold AS DOUBLE))
              + (CAST(t.tp AS DOUBLE) / CAST(z.n_gold AS DOUBLE)))
             AS f1
    FROM sizes z JOIN tp t ON z.source = t.source
    """,
)
def q_span_f1(spark, sf_dir):
    """SPAN-LEVEL F1 (exact-match) — the NER/extraction eval metric
    (the span sibling of q_eval_confusion's label-level scores): gold
    and predicted (start, end) spans join per document on EXACT
    boundaries; per source, precision = TP/|pred|, recall = TP/|gold|,
    F1 their harmonic mean. Spans are synthesized with a planted
    boundary-shift error (prediction 1 drifts ±1 token on two of every
    three docs, prediction 2 always exact) so TP, FP and FN are all
    non-trivially exercised and the expected F1 is analytically
    derivable (the witness checks the closed form, not just agreement).

    |gold| = |pred| by construction here, so P = R per source — the
    F1 chain is still written in full (not simplified to P) so the
    relation holds if the span generators are changed independently.
    One equi-join on (doc, start, end) + two rollups; all counts
    integer, the metric a fixed division chain."""
    docs = _t(spark, sf_dir, "documents")
    s0 = F.col("doc_id") % 20
    gold = docs.select(
        "source", "doc_id", s0.alias("s"), (s0 + 4).alias("e")
    ).unionByName(
        docs.select(
            "source", "doc_id", (s0 + 7).alias("s"), (s0 + 9).alias("e")
        )
    )
    drift = F.col("doc_id") % 3 - 1
    pred = docs.select(
        "source",
        "doc_id",
        (s0 + drift).alias("s"),
        (s0 + 4 + drift).alias("e"),
    ).unionByName(
        docs.select(
            "source", "doc_id", (s0 + 7).alias("s"), (s0 + 9).alias("e")
        )
    )
    tp = (
        gold.join(pred, ["doc_id", "s", "e"])
        .groupBy(gold["source"])
        .agg(F.count("*").cast("bigint").alias("tp"))
    )
    sizes = gold.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_gold")
    )
    p = F.col("tp").cast("double") / F.col("n_gold").cast("double")
    return sizes.join(tp, "source").select(
        "source",
        "tp",
        "n_gold",
        F.col("n_gold").alias("n_pred"),
        p.alias("precision_"),
        p.alias("recall_"),
        (F.lit(2.0) * p * p / (p + p)).alias("f1"),
    )


@staged(
    "q_encoding_advisor",
    oracle="""
    WITH vals AS (
      SELECT 'event_type' AS col, event_id AS pos, event_type AS val
      FROM events
      UNION ALL
      SELECT 'user_id', event_id, CAST(user_id AS VARCHAR) FROM events
      UNION ALL
      SELECT 'value_i', event_id, CAST(CAST(floor(value) AS BIGINT)
                                       AS VARCHAR) FROM events
      UNION ALL
      SELECT 'day', event_id, strftime(ts, '%Y-%m-%d') FROM events
      UNION ALL
      SELECT 'row_hash', event_id, md5(CAST(event_id AS VARCHAR))
      FROM events
    ),
    runs AS (
      SELECT col, val,
             CASE WHEN lag(val) OVER (PARTITION BY col ORDER BY pos)
                       IS DISTINCT FROM val THEN 1 ELSE 0 END AS is_run
      FROM vals
    ),
    stats AS (
      SELECT col,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
             CAST(SUM(is_run) AS BIGINT) AS n_runs,
             CAST(SUM(length(val)) AS BIGINT) AS bytes_plain,
             CAST(SUM(CASE WHEN is_run = 1 THEN length(val) + 4
                           ELSE 0 END) AS BIGINT) AS bytes_rle
      FROM runs GROUP BY col
    ),
    dict_ AS (
      SELECT col, CAST(SUM(length(val)) AS BIGINT) AS dict_bytes
      FROM (SELECT DISTINCT col, val FROM vals) GROUP BY col
    )
    SELECT s.col, s.n, s.n_distinct, s.n_runs, s.bytes_plain,
           s.bytes_rle,
           d.dict_bytes
           + (s.n * length(bin(s.n_distinct - 1)) + 7) // 8
             AS bytes_dict,
           CASE WHEN s.bytes_rle <= s.bytes_plain
                 AND s.bytes_rle <= d.dict_bytes
                     + (s.n * length(bin(s.n_distinct - 1)) + 7) // 8
                THEN 'rle'
                WHEN d.dict_bytes
                     + (s.n * length(bin(s.n_distinct - 1)) + 7) // 8
                     <= s.bytes_plain
                THEN 'dict'
                ELSE 'plain' END AS advice
    FROM stats s JOIN dict_ d ON s.col = d.col
    """,
)
def q_encoding_advisor(spark, sf_dir):
    """COLUMN-ENCODING ADVISOR — the ANALYZE step a columnar writer
    runs per column before choosing its encoding (the decision behind
    parquet's dictionary fallback and q_compaction_plan's upstream):
    exact byte models for PLAIN (Σ value lengths), RLE (run count ×
    (value + 4-byte length)), and DICTIONARY (distinct payload +
    n·⌈log₂ distinct⌉ bits packed), picked per column by a
    deterministic ≤-chain (rle ≤ dict ≤ plain on ties).

    The five profiled columns are chosen to exercise every branch of
    the chooser: a low-cardinality label and two numeric casts land on
    DICT, the time-ordered day column is run-heavy and lands on RLE,
    and the all-distinct row-hash column defeats both (dict pays its
    index bits for nothing) and lands on PLAIN.
    Run counting needs a TOTAL physical order — event_id is unique, so
    run boundaries are engine-independent (lag() IS DISTINCT FROM);
    the bit width is length(bin(distinct−1)) — exact ⌈log₂⌉ on the
    integer lattice, no float log (the q_latency_histogram idiom).
    Three stacked column projections scan the table once each (a real
    writer piggybacks these stats on the write pass); everything else
    is two rollups."""
    ev = _t(spark, sf_dir, "events")
    vals = (
        ev.select(
            F.lit("event_type").alias("col"),
            F.col("event_id").alias("pos"),
            F.col("event_type").alias("val"),
        )
        .unionByName(
            ev.select(
                F.lit("user_id").alias("col"),
                F.col("event_id").alias("pos"),
                F.col("user_id").cast("string").alias("val"),
            )
        )
        .unionByName(
            ev.select(
                F.lit("value_i").alias("col"),
                F.col("event_id").alias("pos"),
                F.floor("value").cast("bigint").cast("string").alias("val"),
            )
        )
        .unionByName(
            ev.select(
                F.lit("day").alias("col"),
                F.col("event_id").alias("pos"),
                F.date_format("ts", "yyyy-MM-dd").alias("val"),
            )
        )
        .unionByName(
            ev.select(
                F.lit("row_hash").alias("col"),
                F.col("event_id").alias("pos"),
                F.md5(F.col("event_id").cast("string")).alias("val"),
            )
        )
    )
    w = Window.partitionBy("col").orderBy("pos")
    runs = vals.select(
        "col",
        "val",
        F.when(
            ~F.lag("val").over(w).eqNullSafe(F.col("val")), 1
        )
        .otherwise(0)
        .alias("is_run"),
    )
    stats = runs.groupBy("col").agg(
        F.count("*").cast("bigint").alias("n"),
        F.countDistinct("val").cast("bigint").alias("n_distinct"),
        F.sum("is_run").cast("bigint").alias("n_runs"),
        F.sum(F.length("val")).cast("bigint").alias("bytes_plain"),
        F.sum(
            F.when(F.col("is_run") == 1, F.length("val") + 4).otherwise(0)
        )
        .cast("bigint")
        .alias("bytes_rle"),
    )
    dict_ = (
        vals.select("col", "val")
        .distinct()
        .groupBy("col")
        .agg(F.sum(F.length("val")).cast("bigint").alias("dict_bytes"))
    )
    bytes_dict = F.col("dict_bytes") + F.expr(
        "CAST((n * length(bin(n_distinct - 1)) + 7) div 8 AS BIGINT)"
    )
    return (
        stats.join(dict_, "col")
        .select(
            "col",
            "n",
            "n_distinct",
            "n_runs",
            "bytes_plain",
            "bytes_rle",
            bytes_dict.alias("bytes_dict"),
            F.when(
                (F.col("bytes_rle") <= F.col("bytes_plain"))
                & (F.col("bytes_rle") <= bytes_dict),
                F.lit("rle"),
            )
            .when(bytes_dict <= F.col("bytes_plain"), F.lit("dict"))
            .otherwise(F.lit("plain"))
            .alias("advice"),
        )
    )


@staged(
    "q_merkle_levels",
    oracle="""
    WITH l0 AS (
      SELECT l_orderkey // 64 AS b1,
             md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),
                 CAST(l_linenumber AS VARCHAR),
                 CAST(l_partkey AS VARCHAR))) AS h
      FROM lineitem
    ),
    l1 AS (
      SELECT b1, md5(string_agg(h, '' ORDER BY h)) AS h,
             CAST(COUNT(*) AS BIGINT) AS n_children
      FROM l0 GROUP BY b1
    ),
    l2 AS (
      SELECT b1 // 16 AS b2, md5(string_agg(h, '' ORDER BY h)) AS h,
             CAST(COUNT(*) AS BIGINT) AS n_children
      FROM l1 GROUP BY b2
    )
    SELECT CAST(1 AS INT) AS level, CAST(b1 AS BIGINT) AS node,
           h, n_children
    FROM l1
    UNION ALL
    SELECT CAST(2 AS INT), CAST(b2 AS BIGINT), h, n_children FROM l2
    """,
)
def q_merkle_levels(spark, sf_dir):
    """MERKLE TREE LEVELS over key-bucketed row hashes — the
    hierarchical extension of q_table_checksum that turns "the tables
    differ" into "they differ in THIS key range" with log-many
    comparisons (the anti-entropy structure Dynamo-style replication
    and lakehouse sync tools walk): level-0 row digests bucket by
    orderkey div 64, each bucket's digest is the md5 of its children's
    hashes in SORTED order (order-insensitivity by canonical ordering
    rather than by commutative combine — the alternative trade to
    q_table_checksum's XOR: collision-resistant, but requires the
    in-bucket sort), and level 2 re-buckets 16:1.

    Emitting levels 1 and 2 as one relation keeps the comparison
    granular. The in-bucket string_agg ORDER BY h is the only sort,
    each over ≤64 (then ≤16) rows — at 100 TB every level is a
    map-side-combinable-after-repartition agg keyed by its bucket."""
    li = _t(spark, sf_dir, "lineitem")
    l0 = li.select(
        F.expr("l_orderkey div 64").alias("b1"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("l_partkey").cast("string"),
            )
        ).alias("h"),
    )
    l1 = l0.groupBy("b1").agg(
        F.md5(
            F.array_join(F.array_sort(F.collect_list("h")), "")
        ).alias("h"),
        F.count("*").cast("bigint").alias("n_children"),
    )
    l2 = l1.groupBy(F.expr("b1 div 16").alias("b2")).agg(
        F.md5(
            F.array_join(F.array_sort(F.collect_list("h")), "")
        ).alias("h"),
        F.count("*").cast("bigint").alias("n_children"),
    )
    return l1.select(
        F.lit(1).cast("int").alias("level"),
        F.col("b1").cast("bigint").alias("node"),
        "h",
        "n_children",
    ).unionByName(
        l2.select(
            F.lit(2).cast("int").alias("level"),
            F.col("b2").cast("bigint").alias("node"),
            "h",
            "n_children",
        )
    )


@staged(
    "q_mix_rate_decomposition",
    oracle="""
    WITH cells AS (
      SELECT event_type AS seg, CAST(event_id % 2 AS BIGINT) AS p,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN CAST(floor(value) AS BIGINT) % 4 = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM events GROUP BY seg, p
    ),
    tot AS (
      SELECT p, CAST(SUM(n) AS BIGINT) AS np FROM cells GROUP BY p
    ),
    wide AS (
      SELECT c0.seg,
             c0.n AS n0, c0.c AS conv0, c1.n AS n1, c1.c AS conv1,
             t0.np AS np0, t1.np AS np1
      FROM cells c0
      JOIN cells c1 ON c0.seg = c1.seg AND c0.p = 0 AND c1.p = 1
      JOIN tot t0 ON t0.p = 0
      JOIN tot t1 ON t1.p = 1
    )
    SELECT seg, n0, n1, conv0, conv1,
           CAST(n0 AS DOUBLE) / CAST(np0 AS DOUBLE) AS share0,
           CAST(n1 AS DOUBLE) / CAST(np1 AS DOUBLE) AS share1,
           CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS rate0,
           CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS rate1,
           (CAST(n1 AS DOUBLE) / CAST(np1 AS DOUBLE)
            - CAST(n0 AS DOUBLE) / CAST(np0 AS DOUBLE))
           * (CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS mix_effect,
           (CAST(n0 AS DOUBLE) / CAST(np0 AS DOUBLE))
           * (CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS rate_effect,
           (CAST(n1 AS DOUBLE) / CAST(np1 AS DOUBLE)
            - CAST(n0 AS DOUBLE) / CAST(np0 AS DOUBLE))
           * (CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             AS interaction
    FROM wide
    """,
)
def q_mix_rate_decomposition(spark, sf_dir):
    """MIX/RATE DECOMPOSITION of a KPI change — the metric-tree
    explainer ("why did the overall conversion rate move?"): between
    two periods, each segment's contribution splits into a MIX effect
    (its traffic share shifted, valued at the old rate), a RATE effect
    (its own rate moved, weighted by the old share), and the
    interaction — and the three terms per segment SUM EXACTLY to the
    overall ΔR, the accounting identity the witness pins (because
    R_p = Σ_s share_sp·rate_sp telescopes).

    One (segment × period) cell aggregation, a per-period total
    broadcast, and fixed division chains written in the identical
    operation order on both engines — every effect is a product of two
    differences of single divisions off the integer lattice."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("seg"),
        (F.col("event_id") % 2).cast("bigint").alias("p"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            F.when(F.floor("value").cast("bigint") % 4 == 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("c"),
    )
    tot = cells.groupBy("p").agg(F.sum("n").cast("bigint").alias("np"))
    c0 = cells.filter("p = 0").select(
        "seg",
        F.col("n").alias("n0"),
        F.col("c").alias("conv0"),
    )
    c1 = cells.filter("p = 1").select(
        "seg",
        F.col("n").alias("n1"),
        F.col("c").alias("conv1"),
    )
    t0 = tot.filter("p = 0").select(F.col("np").alias("np0"))
    t1 = tot.filter("p = 1").select(F.col("np").alias("np1"))
    wide = (
        c0.join(c1, "seg")
        .crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(t1))
    )
    share0 = F.col("n0").cast("double") / F.col("np0").cast("double")
    share1 = F.col("n1").cast("double") / F.col("np1").cast("double")
    rate0 = F.col("conv0").cast("double") / F.col("n0").cast("double")
    rate1 = F.col("conv1").cast("double") / F.col("n1").cast("double")
    return wide.select(
        "seg",
        "n0",
        "n1",
        "conv0",
        "conv1",
        share0.alias("share0"),
        share1.alias("share1"),
        rate0.alias("rate0"),
        rate1.alias("rate1"),
        ((share1 - share0) * rate0).alias("mix_effect"),
        (share0 * (rate1 - rate0)).alias("rate_effect"),
        ((share1 - share0) * (rate1 - rate0)).alias("interaction"),
    )


@staged(
    "q_t_closeness",
    oracle="""
    WITH rows_ AS (
      SELECT user_id % 10 AS grp,
             CAST(floor(value) AS BIGINT) % 8 AS attr
      FROM events
    ),
    grid AS (
      SELECT g.grp, a.attr, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      FROM (SELECT DISTINCT grp FROM rows_) g
      CROSS JOIN (SELECT unnest(range(0, 8)) AS attr) a
      LEFT JOIN (SELECT grp, attr, COUNT(*) AS n
                 FROM rows_ GROUP BY grp, attr) c
        ON c.grp = g.grp AND c.attr = a.attr
    ),
    cums AS (
      SELECT grp, attr, n,
             CAST(SUM(n) OVER (PARTITION BY grp ORDER BY attr)
                  AS BIGINT) AS cum_g,
             CAST(SUM(n) OVER (PARTITION BY grp) AS BIGINT) AS n_g
      FROM grid
    ),
    gcdf AS (
      SELECT attr,
             CAST(SUM(SUM(n)) OVER (ORDER BY attr) AS BIGINT) AS cum_all,
             CAST(SUM(SUM(n)) OVER () AS BIGINT) AS n_all
      FROM grid GROUP BY attr
    )
    SELECT c.grp, MAX(c.n_g) AS n_g,
           CAST(SUM(abs(c.cum_g * g.n_all - g.cum_all * c.n_g))
                AS BIGINT) AS emd_num,
           CAST(SUM(abs(c.cum_g * g.n_all - g.cum_all * c.n_g))
                AS DOUBLE)
             / CAST(MAX(c.n_g) * MAX(g.n_all) * 7 AS DOUBLE) AS emd,
           CASE WHEN CAST(SUM(abs(c.cum_g * g.n_all
                                  - g.cum_all * c.n_g)) AS DOUBLE)
                     / CAST(MAX(c.n_g) * MAX(g.n_all) * 7 AS DOUBLE)
                     <= 0.25
                THEN 1 ELSE 0 END AS t_ok
    FROM cums c JOIN gcdf g ON c.attr = g.attr
    GROUP BY c.grp
    """,
)
def q_t_closeness(spark, sf_dir):
    """T-CLOSENESS audit — the third rung of the privacy ladder
    (q_k_anonymity: groups big enough; q_l_diversity: enough distinct
    sensitive values; this: the group's sensitive-attribute
    DISTRIBUTION must sit within t of the global one, or the group
    leaks by skew): for an ORDERED sensitive attribute the distance is
    the Earth Mover's Distance, which in 1-D collapses to the mean
    absolute CDF gap — Σ_j |F_g(j) − F(j)| / (m−1).

    The whole computation stays on the integer lattice by clearing
    denominators: |cum_g·N − cum_all·n_g| summed over the 8-level
    attribute grid (dense per group, so absent levels contribute their
    true zero mass), divided ONCE by n_g·N·(m−1). Per-group cumulative
    windows run over the bounded attribute domain; the global CDF is
    an 8-row broadcast. t = 0.25 flags the leaking groups."""
    ev = _t(spark, sf_dir, "events")
    rows_ = ev.select(
        (F.col("user_id") % 10).alias("grp"),
        (F.floor("value").cast("bigint") % 8).alias("attr"),
    )
    counts = rows_.groupBy("grp", "attr").agg(F.count("*").alias("n"))
    grid = (
        rows_.select("grp")
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(8).select(F.col("id").alias("attr")))
        )
        .join(counts, ["grp", "attr"], "left")
        .select(
            "grp",
            "attr",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        )
    )
    wg = Window.partitionBy("grp").orderBy("attr")
    wga = Window.partitionBy("grp")
    cums = grid.select(
        "grp",
        "attr",
        F.sum("n").over(wg).cast("bigint").alias("cum_g"),
        F.sum("n").over(wga).cast("bigint").alias("n_g"),
    )
    # the 8-row global CDF via a triangular self-join rather than an
    # unpartitioned window: same result, keeps the catalog's
    # no-unpartitioned-window posture (and the WindowExec warning out
    # of the logs) on a frame this small
    gn = grid.groupBy("attr").agg(F.sum("n").cast("bigint").alias("gn"))
    glob = (
        gn.alias("a")
        .join(F.broadcast(gn.alias("b")),
              F.col("b.attr") <= F.col("a.attr"))
        .groupBy(F.col("a.attr").alias("attr"))
        .agg(F.sum("b.gn").cast("bigint").alias("cum_all"))
        .crossJoin(
            F.broadcast(
                gn.agg(F.sum("gn").cast("bigint").alias("n_all"))
            )
        )
    )
    term = F.abs(
        F.col("cum_g") * F.col("n_all") - F.col("cum_all") * F.col("n_g")
    )
    emd = F.col("emd_num").cast("double") / (
        F.col("n_g") * F.col("n_all") * 7
    ).cast("double")
    return (
        cums.join(F.broadcast(glob), "attr")
        .groupBy("grp")
        .agg(
            F.max("n_g").cast("bigint").alias("n_g"),
            F.sum(term).cast("bigint").alias("emd_num"),
            F.max("n_all").cast("bigint").alias("n_all"),
        )
        .select(
            "grp",
            "n_g",
            "emd_num",
            emd.alias("emd"),
            F.when(emd <= 0.25, 1).otherwise(0).alias("t_ok"),
        )
    )


@staged(
    "q_conformal_interval",
    oracle="""
    WITH cal AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_cal,
             CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sx
      FROM events WHERE event_id % 2 = 0 GROUP BY event_type
    ),
    cal_resid AS (
      SELECT e.event_type,
             abs(CAST(floor(e.value) AS BIGINT) * c.n_cal - c.sx)
               AS rnum,
             ROW_NUMBER() OVER (PARTITION BY e.event_type
               ORDER BY abs(CAST(floor(e.value) AS BIGINT) * c.n_cal
                            - c.sx), e.event_id) AS rk,
             c.n_cal, c.sx
      FROM events e JOIN cal c ON e.event_type = c.event_type
      WHERE e.event_id % 2 = 0
    ),
    qhat AS (
      SELECT event_type, n_cal, sx,
             CAST(rnum AS BIGINT) AS q_num
      FROM cal_resid
      WHERE rk = least(CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT), n_cal)
    ),
    test_ AS (
      SELECT q.event_type, q.n_cal, q.q_num,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN abs(CAST(floor(e.value) AS BIGINT)
                                    * q.n_cal - q.sx) <= q.q_num
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM events e JOIN qhat q ON e.event_type = q.event_type
      WHERE e.event_id % 2 = 1
      GROUP BY q.event_type, q.n_cal, q.q_num
    )
    SELECT event_type, n_cal, n_test, q_num,
           CAST(q_num AS DOUBLE) / CAST(n_cal AS DOUBLE) AS q_hat,
           CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE)
             AS coverage
    FROM test_
    """,
)
def q_conformal_interval(spark, sf_dir):
    """SPLIT-CONFORMAL PREDICTION INTERVALS — the distribution-free
    calibration wrapper every production model gets before its
    point predictions ship ("the interval covers 90% of future points,
    guaranteed"): even rows calibrate, odd rows test; the predictor is
    the per-key calibration mean; q̂ is the ⌈0.9(n+1)⌉-th smallest
    calibration residual; coverage on the test half should land near
    (and, by the conformal guarantee, in expectation at least) 90%.

    The exactness trick: residuals are |x − sx/n| — a DIVISION — but
    their per-key ORDER is decided entirely by the integer numerator
    |x·n − sx| (same denominator within a key), so ranking, the q̂
    order statistic, and every coverage comparison run on the integer
    lattice; only the two reported ratios divide. One ranking window
    per key + one broadcast of the 1-row-per-key q̂ frame."""
    ev = _t(spark, sf_dir, "events")
    cal_rows = ev.filter(F.col("event_id") % 2 == 0)
    cal = cal_rows.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_cal"),
        F.sum(F.floor("value").cast("bigint")).cast("bigint").alias("sx"),
    )
    joined = cal_rows.join(F.broadcast(cal), "event_type")
    rnum = F.abs(
        F.floor("value").cast("bigint") * F.col("n_cal") - F.col("sx")
    )
    ranked = joined.select(
        "event_type",
        "n_cal",
        "sx",
        rnum.alias("rnum"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                rnum, F.col("event_id")
            )
        )
        .alias("rk"),
    )
    qhat = ranked.filter(
        F.col("rk")
        == F.least(
            F.ceil(0.9 * (F.col("n_cal") + 1)).cast("bigint"),
            F.col("n_cal"),
        )
    ).select(
        "event_type",
        "n_cal",
        "sx",
        F.col("rnum").cast("bigint").alias("q_num"),
    )
    test = (
        ev.filter(F.col("event_id") % 2 == 1)
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_cal", "q_num")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(
                        F.floor("value").cast("bigint") * F.col("n_cal")
                        - F.col("sx")
                    )
                    <= F.col("q_num"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return test.select(
        "event_type",
        "n_cal",
        "n_test",
        "q_num",
        (F.col("q_num").cast("double") / F.col("n_cal").cast("double"))
        .alias("q_hat"),
        (
            F.col("n_covered").cast("double")
            / F.col("n_test").cast("double")
        ).alias("coverage"),
    )


@staged(
    "q_apdex",
    oracle="""
    WITH scored AS (
      SELECT event_type,
             CASE WHEN CAST(floor(value) AS BIGINT) <= 100 THEN 'sat'
                  WHEN CAST(floor(value) AS BIGINT) <= 300 THEN 'tol'
                  ELSE 'fru' END AS bucket
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN bucket = 'sat' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_satisfied,
           CAST(SUM(CASE WHEN bucket = 'tol' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tolerating,
           CAST(SUM(CASE WHEN bucket = 'fru' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_frustrated,
           (CAST(SUM(CASE WHEN bucket = 'sat' THEN 1 ELSE 0 END)
                 AS DOUBLE)
            + CAST(SUM(CASE WHEN bucket = 'tol' THEN 1 ELSE 0 END)
                   AS DOUBLE) / 2.0)
           / CAST(COUNT(*) AS DOUBLE) AS apdex
    FROM scored GROUP BY event_type
    """,
)
def q_apdex(spark, sf_dir):
    """APDEX SCORE per key — the SLO industry's standard user-satisfaction
    rollup (Apdex_T = (satisfied + tolerating/2) / total with
    tolerating ≤ 4T): threshold T = 100 on the integer value lattice,
    so every bucket edge is an exact comparison and the score is one
    fixed division chain off three counts. One map-side-combined agg;
    the half-weight is applied to the COUNT (ties impossible), never to
    per-row doubles. Complements q_slo_burn (budget consumption over
    time) with the point-in-time satisfaction summary."""
    ev = _t(spark, sf_dir, "events")
    px = F.floor("value").cast("bigint")
    scored = ev.select(
        "event_type",
        F.when(px <= 100, F.lit("sat"))
        .when(px <= 300, F.lit("tol"))
        .otherwise(F.lit("fru"))
        .alias("bucket"),
    )
    sat = F.sum(F.when(F.col("bucket") == "sat", 1).otherwise(0))
    tol = F.sum(F.when(F.col("bucket") == "tol", 1).otherwise(0))
    fru = F.sum(F.when(F.col("bucket") == "fru", 1).otherwise(0))
    return scored.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        sat.cast("bigint").alias("n_satisfied"),
        tol.cast("bigint").alias("n_tolerating"),
        fru.cast("bigint").alias("n_frustrated"),
        (
            (sat.cast("double") + tol.cast("double") / F.lit(2.0))
            / F.count("*").cast("double")
        ).alias("apdex"),
    )


@staged(
    "q_backfill_plan",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events GROUP BY event_type
    ),
    spine AS (
      SELECT b.event_type,
             unnest(generate_series(b.lo, b.hi,
                                    INTERVAL 1 HOUR)) AS hour
      FROM bounds b
    ),
    have AS (
      SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour
      FROM events
    ),
    missing AS (
      SELECT s.event_type, s.hour,
             CAST(floor(epoch(s.hour)) AS BIGINT) // 3600
             - ROW_NUMBER() OVER (PARTITION BY s.event_type
                                  ORDER BY s.hour) AS island
      FROM spine s LEFT JOIN have h
        ON h.event_type = s.event_type AND h.hour = s.hour
      WHERE h.hour IS NULL
    )
    SELECT event_type,
           strftime(MIN(hour), '%Y-%m-%d %H:%M:%S') AS gap_start,
           strftime(MAX(hour), '%Y-%m-%d %H:%M:%S') AS gap_end,
           CAST(COUNT(*) AS BIGINT) AS n_hours
    FROM missing GROUP BY event_type, island
    """,
)
def q_backfill_plan(spark, sf_dir):
    """BACKFILL PLANNER — the operational readout over q_gap_fill's
    dense spine: instead of zero-filling missing (key, hour) cells,
    EMIT them as merged contiguous ranges (gap_start, gap_end,
    n_hours) — exactly the job list an orchestrator submits to repair
    a feed, one run per island rather than one per hour.

    Islands merge by the gaps-and-islands identity on the hour lattice
    (epoch//3600 − row_number is constant exactly on consecutive
    missing hours); the spine is derived per key from its own observed
    bounds (no external calendar), the anti-join finds holes, and the
    per-key window runs over the bounded spine, not raw events.
    Timestamps compare as formatted strings per the catalog's
    exactness rules."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.expr("sequence(lo, hi, interval 1 hour)")
        ).alias("hour"),
    )
    have = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).distinct()
    missing = (
        spine.join(have, ["event_type", "hour"], "left_anti")
        .select(
            "event_type",
            "hour",
            (
                F.expr(
                    "CAST(floor(unix_timestamp(hour)) AS BIGINT) div 3600"
                )
                - F.row_number().over(
                    Window.partitionBy("event_type").orderBy("hour")
                )
            ).alias("island"),
        )
    )
    return missing.groupBy("event_type", "island").agg(
        F.date_format(F.min("hour"), "yyyy-MM-dd HH:mm:ss").alias(
            "gap_start"
        ),
        F.date_format(F.max("hour"), "yyyy-MM-dd HH:mm:ss").alias(
            "gap_end"
        ),
        F.count("*").cast("bigint").alias("n_hours"),
    ).drop("island")
