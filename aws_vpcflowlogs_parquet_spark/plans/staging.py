"""Round-5 staging catalog — implemented, oracle-paired, pytest-verified
queries that are NOT yet in ``queries()``.

The external driver verifies at most 50 pending queries per round, and
round 4's pending queue is exactly at that cap (VERDICT r3 item 1:
"add nothing that would push pending past 50"). These entries are built
and proven now — the identical oracle-replica gate runs over them in
tests/test_staging_oracle.py — and promote to plans/catalog.py the
moment the queue drains: promotion is moving the @register blocks (the
decorator, `_t`, and conventions are identical by construction).

Contents (24, inventoried in SURVEY.md §2.5): the three TPC-H queries
whose canonical forms need columns the synthetic schema lacks, adapted
like the round-4 set (completing all 22 shapes), plus seventeen
pipeline/analytic operators — changepoint detection, vocabulary growth,
burstiness, prefix-filtered exact near-dup join, conversion lag, segment
overlap, Gini + Lorenz, SAX symbolization, k-core, top paths,
period-over-period change, discrete percentiles, mode, rolling distinct
actives (exact and HLL-sketched), Theil-Sen robust trend, the
time-windowed funnel, an on-engine evaluation confusion matrix, and
the LSH candidate-set recall/precision audit plus per-source
near-duplication rates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import ensure_session_posture
from .catalog import _DUCK_TOKENS, _t

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


# ------------------------------------------------------- TPC-H Q2/Q20/Q21

_TPCH_TABLES_STAGED: dict[str, tuple[str, ...]] = {}


def _tpch(spark: SparkSession, sf_dir: str, tag: str, sql: str) -> DataFrame:
    for name in _TPCH_TABLES_STAGED[tag]:
        _t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_{tag}")
    return spark.sql(sql.format(s=f"_{tag}"))


_TPCH_Q2 = """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem{s} GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supplycost
    FROM part{s}
    JOIN ps ON p_partkey = l_partkey
    JOIN supplier{s} ON s_suppkey = l_suppkey
    JOIN nation{s} ON s_nationkey = n_nationkey
    JOIN region{s} ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND r_name = 'ASIA'
      AND supplycost = (
        SELECT MIN(ps2.supplycost)
        FROM ps ps2
        JOIN supplier{s} s2 ON s2.s_suppkey = ps2.l_suppkey
        JOIN nation{s} n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region{s} r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'ASIA'
      )
"""
_TPCH_TABLES_STAGED["q2"] = (
    "lineitem", "part", "supplier", "nation", "region",
)


@staged("q_tpch_q2", oracle=_TPCH_Q2.format(s=""))
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier), adapted: the supply relation
    derives from shipped lines (no partsupp), with per-(part, supplier)
    cost = MIN observed unit price — a deterministic double (single
    division per row, MIN picks one; no accumulation). Shape intact:
    the 5-way snowflake plus the famous CORRELATED MIN subquery over
    the same relation, decorrelated by Catalyst into a per-part
    min-aggregate join. The region filter applies inside both the
    outer block and the subquery, exactly as in the spec."""
    return _tpch(spark, sf_dir, "q2", _TPCH_Q2)


_TPCH_Q20 = """
    SELECT s_name, s_nationkey
    FROM supplier{s}
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem{s}
      WHERE l_partkey IN (
        SELECT p_partkey FROM part{s} WHERE p_name LIKE 'small%'
      )
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 50
    )
"""
_TPCH_TABLES_STAGED["q20"] = ("supplier", "lineitem", "part")


@staged("q_tpch_q20", oracle=_TPCH_Q20.format(s=""))
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion), adapted: 'excess stock'
    becomes 'shipped more than 50 units of a small* part in the year'
    (no partsupp availqty). The defining shape survives: a two-level
    nested IN chain (supplier ← grouped lineitem ← filtered part) with
    a HAVING threshold, planned as semi joins all the way down;
    quantity sums are exact BIGINTs."""
    return _tpch(spark, sf_dir, "q20", _TPCH_Q20)


_TPCH_Q21 = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier{s}
    JOIN lineitem{s} l1 ON s_suppkey = l1.l_suppkey
    JOIN orders{s} ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem{s} l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem{s} l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
"""
_TPCH_TABLES_STAGED["q21"] = ("supplier", "lineitem", "orders")


@staged("q_tpch_q21", oracle=_TPCH_Q21.format(s=""))
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: lateness
    is ship-lag > 90 days against the order date (no commit/receipt
    dates). The hardest subquery shape in the suite survives intact —
    EXISTS (another supplier contributed to the order) AND NOT EXISTS
    (any OTHER supplier was also late, with the lateness predicate
    correlated to the OUTER order's date): one positive and one negated
    correlated semi join over the same fact table, both non-equi on the
    outer date. Counts are exact."""
    return _tpch(spark, sf_dir, "q21", _TPCH_Q21)


# ------------------------------------------------- pipeline analytics


@staged(
    "q_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(floor(CAST(SUM(n) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5)
                  AS BIGINT) AS mean_scaled
      FROM daily GROUP BY event_type
    ),
    c AS (
      SELECT d.event_type, d.day,
             SUM(d.n * 1000000 - mean_scaled) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cusum_scaled
      FROM daily d JOIN stats ON d.event_type = stats.event_type
    )
    SELECT event_type, day AS changepoint_day,
           CAST(cusum_scaled AS DOUBLE) / 1000000.0 AS peak_cusum
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY abs(cusum_scaled) DESC, day
      ) AS rk
      FROM c
    ) t WHERE rk = 1
    """,
)
def q_changepoint_cusum(spark, sf_dir):
    """CUSUM changepoint detection per event type: cumulative sum of
    (daily count − series mean), whose |peak| marks the most likely
    level-shift day — the standard drift screen for event-rate
    monitoring. Everything after the daily rollup runs on the exact
    integer lattice: deviations are (n·1e6 − quantized mean), so the
    running window sum is bigint arithmetic and the argmax (with a day
    tie-break) can never flip between engines. Costs one daily
    pre-aggregation; the windows run over days-per-type rows."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.floor(
            F.sum("n").cast("double") / F.count("*") * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("mean_scaled")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        F.sum(F.col("n") * 1000000 - F.col("mean_scaled"))
        .over(w_cum)
        .alias("cusum_scaled"),
    )
    w_rk = Window.partitionBy("event_type").orderBy(
        F.abs("cusum_scaled").desc(), "day"
    )
    return (
        c.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            (F.col("cusum_scaled").cast("double") / F.lit(1000000.0)).alias(
                "peak_cusum"
            ),
        )
    )


@staged(
    "q_vocab_growth",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS t FROM documents
    ),
    firsts AS (SELECT t, MIN(doc_id) AS first_doc FROM tok GROUP BY t),
    nw AS (
      SELECT CAST(first_doc // 100 AS BIGINT) AS bucket, COUNT(*) AS new_types
      FROM firsts GROUP BY 1
    ),
    tk AS (
      SELECT CAST(doc_id // 100 AS BIGINT) AS bucket, COUNT(*) AS n_tokens
      FROM tok GROUP BY 1
    )
    SELECT tk.bucket, tk.n_tokens, COALESCE(nw.new_types, 0) AS new_types,
           SUM(tk.n_tokens) OVER (ORDER BY tk.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens,
           SUM(COALESCE(nw.new_types, 0)) OVER (ORDER BY tk.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vocab
    FROM tk LEFT JOIN nw ON tk.bucket = nw.bucket
    """,
)
def q_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth: per 100-document bucket, how many
    token TYPES appear for the first time, plus cumulative token and
    vocab counts — the curve that tells a corpus builder when new data
    stops adding vocabulary (dedup/diversity health at ingest). A type's
    first appearance is MIN(doc_id) over the exploded token stream (one
    shuffle keyed by token; the later rollups are bucket-cardinality).
    All-integer output; the cumulative windows run over ≤ n_docs/100
    rows on a single partition — driver-scale by construction."""
    docs = _t(spark, sf_dir, "documents")
    import aws_vpcflowlogs_parquet_spark.operators.dedup as dd

    tok = docs.select("doc_id", F.explode(dd.tokens_col("text")).alias("t"))
    firsts = tok.groupBy("t").agg(F.min("doc_id").alias("first_doc"))
    nw = firsts.groupBy(
        F.expr("CAST(first_doc div 100 AS BIGINT)").alias("bucket")
    ).agg(F.count("*").alias("new_types"))
    tk = tok.groupBy(
        F.expr("CAST(doc_id div 100 AS BIGINT)").alias("bucket")
    ).agg(F.count("*").alias("n_tokens"))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = tk.join(nw, "bucket", "left").select(
        "bucket",
        "n_tokens",
        F.coalesce("new_types", F.lit(0)).alias("new_types"),
    )
    return joined.select(
        "bucket",
        "n_tokens",
        "new_types",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum("new_types").over(w).alias("cum_vocab"),
    )


@staged(
    "q_burstiness",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS t FROM documents
    ),
    per_doc AS (
      SELECT t, doc_id, COUNT(*) AS c FROM tok GROUP BY t, doc_id
    ),
    stats AS (
      SELECT t, COUNT(*) AS n_docs,
             SUM(c) AS sc, SUM(c * c) AS sc2
      FROM per_doc GROUP BY t
    )
    SELECT t, CAST(n_docs AS BIGINT) AS n_docs, CAST(sc AS BIGINT) AS total,
           CAST(n_docs * sc2 - sc * sc AS DOUBLE)
             / CAST(n_docs * sc AS DOUBLE) AS vmr
    FROM stats
    WHERE n_docs >= 20
    ORDER BY CAST(n_docs * sc2 - sc * sc AS DOUBLE)
               / CAST(n_docs * sc AS DOUBLE) DESC, t
    LIMIT 25
    """,
)
def q_burstiness(spark, sf_dir):
    """Token burstiness — the variance-to-mean ratio of a token's
    per-document counts (over documents containing it). Bursty tokens
    (VMR >> 1) concentrate in few documents (topical/boilerplate);
    VMR ≈ 1 is Poisson background — a standard corpus-quality and
    keyword-extraction signal. The statistic is computed on the exact
    integer lattice: per-token (n, Σc, Σc²) are bigints, and
    VMR = (n·Σc² − (Σc)²) / (n·Σc) is ONE double division of exact
    integers — deterministic, so even the ORDER BY on the ratio is
    engine-stable (plus a token tie-break). Two shuffles — (token, doc)
    then token — both count-carrying, map-side combined."""
    docs = _t(spark, sf_dir, "documents")
    import aws_vpcflowlogs_parquet_spark.operators.dedup as dd

    tok = docs.select("doc_id", F.explode(dd.tokens_col("text")).alias("t"))
    per_doc = tok.groupBy("t", "doc_id").agg(F.count("*").alias("c"))
    stats = per_doc.groupBy("t").agg(
        F.count("*").alias("n_docs"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    vmr = (
        (F.col("n_docs") * F.col("sc2") - F.col("sc") * F.col("sc")).cast(
            "double"
        )
        / (F.col("n_docs") * F.col("sc")).cast("double")
    )
    return (
        stats.filter(F.col("n_docs") >= 20)
        .select(
            "t",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sc").cast("bigint").alias("total"),
            vmr.alias("vmr"),
        )
        .orderBy(F.col("vmr").desc(), "t")
        .limit(25)
    )


@staged(
    "q_conversion_lag",
    oracle="""
    WITH f AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT (CAST(floor(epoch(first_purchase)) AS BIGINT)
            - CAST(floor(epoch(first_view)) AS BIGINT)) // 86400 AS lag_days,
           COUNT(*) AS n_users
    FROM f
    WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
      AND first_purchase >= first_view
    GROUP BY 1
    """,
)
def q_conversion_lag(spark, sf_dir):
    """Time-to-conversion distribution: per user, days between FIRST
    view and FIRST purchase (conversion funnels report steps, this
    reports the latency between them — the survival-analysis front
    end). One conditional-MIN aggregation per user, then an integer
    day-bucket histogram; epoch subtraction and floor-div stay on the
    integer lattice, so the buckets are engine-exact. Negative lags
    (purchase-first users) are excluded by contract."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    lag_days = F.expr(
        "(CAST(floor(unix_timestamp(first_purchase)) AS BIGINT)"
        " - CAST(floor(unix_timestamp(first_view)) AS BIGINT)) div 86400"
    )
    return (
        f.filter(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        )
        .groupBy(lag_days.alias("lag_days"))
        .agg(F.count("*").alias("n_users"))
    )


@staged(
    "q_segment_overlap",
    oracle="""
    WITH s AS (SELECT DISTINCT event_type AS t, user_id FROM events),
    sizes AS (SELECT t, COUNT(*) AS n FROM s GROUP BY t),
    inter AS (
      SELECT a.t AS t1, b.t AS t2, COUNT(*) AS n_inter
      FROM s a JOIN s b ON a.user_id = b.user_id AND a.t < b.t
      GROUP BY a.t, b.t
    )
    SELECT t1, t2, n_inter, na.n AS n1, nb.n AS n2,
           CAST(n_inter AS DOUBLE)
             / CAST(na.n + nb.n - n_inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes na ON na.t = t1
    JOIN sizes nb ON nb.t = t2
    """,
)
def q_segment_overlap(spark, sf_dir):
    """Exact pairwise segment overlap: Jaccard of the user sets behind
    every event-type pair — the audience-overlap matrix (and the exact
    audit twin of q_kmv_intersection's sketch algebra). Dedup to
    (type, user), self-join on user with t1 < t2 (each pair once), then
    broadcast the tiny per-type sizes; Jaccard is one double division
    of exact integers. At 100 TB the self-join shuffles only deduped
    (type, user) pairs — bounded by users × segments, not events."""
    ev = _t(spark, sf_dir, "events")
    s = ev.select(F.col("event_type").alias("t"), "user_id").distinct()
    sizes = s.groupBy("t").agg(F.count("*").alias("n"))
    a = s.select(F.col("t").alias("t1"), "user_id")
    b = s.select(F.col("t").alias("t2"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col("t").alias("t1"), F.col("n").alias("n1"))
    nb = sizes.select(F.col("t").alias("t2"), F.col("n").alias("n2"))
    return (
        inter.join(F.broadcast(na), "t1")
        .join(F.broadcast(nb), "t2")
        .select(
            "t1", "t2", "n_inter", "n1", "n2",
            (
                F.col("n_inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_inter")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


@staged(
    "q_gini",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS x
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM spend
    )
    SELECT COUNT(*) AS n_customers,
           CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
             / CAST(COUNT(*) * SUM(x) AS DOUBLE) AS gini
    FROM ranked
    """,
)
def q_gini(spark, sf_dir):
    """Gini coefficient of customer spend concentration — the standard
    inequality measure ('do 20% of customers drive 80% of revenue'),
    equally used to audit dataset source balance. Spend lands on the
    cents lattice, the classic rank formula
    G = (2·Σ i·x(i) − (n+1)·Σx) / (n·Σx) runs in pure bigints with ONE
    final double division, and equal-spend ties can't perturb it
    (swapping ranks among equal x leaves Σ i·x unchanged). The global
    rank is a window over PER-CUSTOMER aggregates — cardinality
    customers, not orders; at larger scale the same formula runs on a
    quantile-bucketed Lorenz curve (q_decile_stats' machinery)."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
        ).alias("x")
    )
    ranked = spend.select(
        "x", F.row_number().over(Window.orderBy("x", "o_custkey")).alias("i")
    )
    return ranked.agg(
        F.count("*").alias("n_customers"),
        (
            (
                2 * F.sum(F.col("i") * F.col("x"))
                - (F.count("*") + 1) * F.sum("x")
            ).cast("double")
            / (F.count("*") * F.sum("x")).cast("double")
        ).alias("gini"),
    )


@staged(
    "q_sax_symbolize",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
             (ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) - 1) // 8 AS widx
      FROM events
    ),
    paa AS (
      SELECT user_id, widx, SUM(v) AS sv, COUNT(*) AS cnt
      FROM seq GROUP BY user_id, widx
    ),
    bounds AS (
      SELECT user_id, MIN(v) AS lo, MAX(v) AS hi FROM seq GROUP BY user_id
    ),
    sym AS (
      SELECT p.user_id, p.widx,
             CASE
               WHEN 4 * sv >= cnt * (lo + 3 * hi) THEN 'd'
               WHEN 4 * sv >= cnt * (2 * lo + 2 * hi) THEN 'c'
               WHEN 4 * sv >= cnt * (3 * lo + hi) THEN 'b'
               ELSE 'a'
             END AS s
      FROM paa p JOIN bounds b ON p.user_id = b.user_id
    )
    SELECT user_id, COUNT(*) AS n_windows,
           string_agg(s, '' ORDER BY widx) AS sax
    FROM sym GROUP BY user_id
    """,
)
def q_sax_symbolize(spark, sf_dir):
    """SAX (Symbolic Aggregate approXimation) of each user's value
    series: piecewise-aggregate means over 8-event windows, quantized
    into 4 symbols spanning the user's own [min, max] — the string form
    that makes time-series motif search a substring problem. Everything
    is exact: values on the cents lattice, and each breakpoint test
    'paa >= lo + q·(hi−lo)/4' cross-multiplied to
    '4·Σv >= cnt·((4−q)·lo + q·hi)' in bigints, so symbols can never
    flip between engines. One shuffle for the (ts, event_id)-ordered
    windowing; the per-user string assembles from an ordered array —
    deterministic, no collect_list order dependence."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint").alias("v"),
        ((F.row_number().over(w) - 1) / 8).cast("bigint").alias("widx"),
    )
    paa = seq.groupBy("user_id", "widx").agg(
        F.sum("v").alias("sv"), F.count("*").alias("cnt")
    )
    bounds = seq.groupBy("user_id").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    sv, cnt, lo, hi = (F.col(c) for c in ("sv", "cnt", "lo", "hi"))
    sym = paa.join(bounds, "user_id").select(
        "user_id",
        "widx",
        F.when(4 * sv >= cnt * (lo + 3 * hi), F.lit("d"))
        .when(4 * sv >= cnt * (2 * lo + 2 * hi), F.lit("c"))
        .when(4 * sv >= cnt * (3 * lo + hi), F.lit("b"))
        .otherwise(F.lit("a"))
        .alias("s"),
    )
    return sym.groupBy("user_id").agg(
        F.count("*").alias("n_windows"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("widx", "s"))),
                lambda x: x["s"],
            ),
            "",
        ).alias("sax"),
    )


@staged(
    "q_dedup_prefix_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x != '') AS tk
      FROM documents
    ),
    sigs AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(tk) >= 3 THEN
               list_transform(generate_series(1, len(tk) - 2),
                 i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
             ELSE [] END) AS sh
      FROM t
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
             AS jaccard
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE len(a.sh) > 0 AND len(b.sh) > 0
      AND 6 * len(list_intersect(a.sh, b.sh)) >= len(a.sh) + len(b.sh)
    """,
)
def q_dedup_prefix_filter(spark, sf_dir):
    """Exact Jaccard >= 0.2 near-dup pairs over the WHOLE corpus via
    prefix filtering (AllPairs/PPJoin scheme) — no doc_id bound, no
    quadratic step, unlike the q_dedup_ngram verification kernel whose
    200-doc guard exists precisely because it is all-pairs. The rarest-
    first global shingle order makes each doc's |x|-ceil(t|x|)+1 prefix
    tiny and low-frequency, the prefix equi-join provably loses no
    qualifying pair, and acceptance is the cross-multiplied integer
    test 6·|A∩B| >= |A|+|B|. The ORACLE is the quadratic brute force —
    DuckDB can afford n²/2 at this SF — so the driver check certifies
    the pruning is lossless, while the Spark plan is the one that runs
    at 100 TB (two shingle-keyed shuffles + one pair-keyed, proven
    equal in tests/test_dedup_prefix_filter.py)."""
    import aws_vpcflowlogs_parquet_spark.operators.dedup as dd

    return dd.prefix_filtered_pairs(
        _t(spark, sf_dir, "documents"), threshold_num=1, threshold_den=5
    )


# k-core oracle: the peel loop unrolled into chained CTEs — both engines
# run the SAME bounded number of rounds, so parity holds even before the
# fixpoint (the Spark loop matches round-for-round).
_KCORE_K = 3
_KCORE_ROUNDS = 8
_EDGE_SQL = """
      SELECT DISTINCT least(user_id % 41, (2 * user_id + event_id) % 41) AS lo,
             greatest(user_id % 41, (2 * user_id + event_id) % 41) AS hi
      FROM events
      WHERE user_id % 41 != (2 * user_id + event_id) % 41
"""


def _kcore_oracle() -> str:
    parts = [f"WITH e0 AS MATERIALIZED ({_EDGE_SQL})"]
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f""",
    k{r} AS MATERIALIZED (
      SELECT n FROM (
        SELECT lo AS n FROM e{r - 1} UNION ALL SELECT hi FROM e{r - 1}
      ) u GROUP BY n HAVING COUNT(*) >= {_KCORE_K}
    ),
    e{r} AS MATERIALIZED (
      SELECT e.lo, e.hi FROM e{r - 1} e
      JOIN k{r} a ON e.lo = a.n JOIN k{r} b ON e.hi = b.n
    )"""
        )
    parts.append(
        f"""
    SELECT n AS node, COUNT(*) AS core_degree
    FROM (SELECT lo AS n FROM e{_KCORE_ROUNDS}
          UNION ALL SELECT hi FROM e{_KCORE_ROUNDS}) u
    GROUP BY n"""
    )
    return "".join(parts)


@staged("q_kcore", oracle=_kcore_oracle())
def q_kcore(spark, sf_dir):
    """k-core decomposition (k=3) by iterative peeling: repeatedly drop
    nodes with degree < k and their incident edges; survivors form the
    3-core — the dense-subgraph screen behind community seeding and
    spam-ring detection. Both engines run the SAME bounded peel count
    (8 rounds; the oracle is the loop unrolled into chained CTEs), so
    parity holds round-for-round even before the fixpoint; at scale the
    loop adds a convergence probe (edge count unchanged → stop) and
    checkpoints per round exactly like operators/graph.py's PageRank
    discipline. Per round: one degree aggregation + one semi join —
    both keyed on node ids only."""
    ev = _t(spark, sf_dir, "events")
    lo = F.least(
        F.col("user_id") % 41, (2 * F.col("user_id") + F.col("event_id")) % 41
    )
    hi = F.greatest(
        F.col("user_id") % 41, (2 * F.col("user_id") + F.col("event_id")) % 41
    )
    edges = (
        ev.select(lo.alias("lo"), hi.alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(_KCORE_ROUNDS):
        deg = (
            edges.select(F.col("lo").alias("n"))
            .unionAll(edges.select(F.col("hi").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("n")
        )
        edges = (
            edges.join(deg.withColumnRenamed("n", "lo"), "lo", "left_semi")
            .join(deg.withColumnRenamed("n", "hi"), "hi", "left_semi")
            .select("lo", "hi")
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
    return (
        edges.select(F.col("lo").alias("node"))
        .unionAll(edges.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("core_degree"))
    )


@staged(
    "q_lorenz_curve",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS x
      FROM orders GROUP BY o_custkey
    ),
    deciled AS (
      SELECT x, NTILE(10) OVER (ORDER BY x, o_custkey) AS decile FROM spend
    ),
    per AS (
      SELECT decile, COUNT(*) AS n_customers, SUM(x) AS dx
      FROM deciled GROUP BY decile
    )
    SELECT decile, n_customers,
           CAST(SUM(dx) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(SUM(dx) OVER () AS DOUBLE) AS cum_share
    FROM per
    """,
)
def q_lorenz_curve(spark, sf_dir):
    """Lorenz curve of customer spend: cumulative revenue share per
    spend decile — the plot q_gini summarizes into one number ('the top
    decile holds X% of revenue'). Spend on the cents lattice, NTILE
    with a total (x, custkey) order, then per-decile bigint sums whose
    10-row cumulative window is driver-scale; each share is one double
    division of exact integers. The global NTILE runs over per-customer
    AGGREGATES (cardinality customers, not orders) — at larger scale
    the decile boundaries come from q_decile_stats' distributed
    histogram instead of a global sort."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
        ).alias("x")
    )
    deciled = spend.select(
        "x",
        F.ntile(10).over(Window.orderBy("x", "o_custkey")).alias("decile"),
    )
    per = deciled.groupBy("decile").agg(
        F.count("*").alias("n_customers"), F.sum("x").alias("dx")
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.select(
        "decile",
        "n_customers",
        (
            F.sum("dx").over(w_cum).cast("double")
            / F.sum("dx").over(Window.partitionBy()).cast("double")
        ).alias("cum_share"),
    )


@staged(
    "q_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, d,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM seq WHERE rn <= 5 GROUP BY user_id, d
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def q_top_paths(spark, sf_dir):
    """Top user journey prefixes: each (user, day) session's first five
    event types as an ordered path string, ranked by frequency — the
    path-analysis query behind funnel discovery (q_funnel checks ONE
    known path; this FINDS the paths). The path assembles from an
    ordered array (sort by the explicit (rn) key inside the group), not
    raw collect_list order — deterministic under any partitioning. One
    shuffle for the per-session window, one for the path count; top-20
    via TakeOrderedAndProject."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", F.date_trunc("day", "ts")
    ).orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("d"),
        "event_type",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 5)
    paths = seq.groupBy("user_id", "d").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


@staged(
    "q_pop_change",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n, prev_n,
           CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE) AS pct_change
    FROM (
      SELECT event_type, day, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
      FROM daily
    ) t WHERE prev_n IS NOT NULL
    """,
)
def q_pop_change(spark, sf_dir):
    """Period-over-period change: day-over-day count delta per event
    type as a percentage — the default trend panel of any operational
    dashboard. Day counts are exact integers; the lag window shares the
    daily rollup's (event_type) keying; pct_change is one double
    division of exact ints, so every row is engine-identical. First day
    per series drops (no prior period) by contract."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        daily.withColumn("prev_n", F.lag("n").over(w))
        .filter(F.col("prev_n").isNotNull())
        .select(
            "event_type", "day", "n", "prev_n",
            (
                (F.col("n") - F.col("prev_n")).cast("double")
                / F.col("prev_n").cast("double")
            ).alias("pct_change"),
        )
    )


@staged(
    "q_percentile_disc",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS q,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY CAST(l_quantity AS BIGINT),
                                         l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT grp,
           MIN(CASE WHEN 4 * rn >= n THEN q END) AS p25,
           MIN(CASE WHEN 2 * rn >= n THEN q END) AS p50,
           MIN(CASE WHEN 4 * rn >= 3 * n THEN q END) AS p75,
           MIN(CASE WHEN 20 * rn >= 19 * n THEN q END) AS p95,
           MIN(n) AS n
    FROM v GROUP BY grp
    """,
)
def q_percentile_disc(spark, sf_dir):
    """Discrete percentiles (percentile_disc semantics: the SMALLEST
    actual value whose rank reaches ceil(q*n)) — the twin of
    q_percentiles' interpolated percentile_cont, needed wherever the
    answer must be a value that exists in the data (latency SLOs,
    size-class cutoffs). The rank test 'rn >= ceil(q*n)' is
    cross-multiplied to integers (4rn >= n, 2rn >= n, 4rn >= 3n,
    20rn >= 19n) and quantities are exact bigints — not a float
    anywhere. One (grp)-keyed window; the 100 TB form swaps the exact
    sort for q_decile_stats_approx's histogram ranks, same selection
    arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity").cast("bigint"), "l_orderkey", "l_linenumber"
    )
    v = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("bigint").alias("q"),
        F.row_number().over(w).alias("rn"),
        F.count("*")
        .over(Window.partitionBy("l_returnflag"))
        .alias("n"),
    )

    def pick(mult: int, rhs: int, name: str):
        return F.min(
            F.when(F.col("rn") * mult >= F.col("n") * rhs, F.col("q"))
        ).alias(name)

    return v.groupBy("grp").agg(
        pick(4, 1, "p25"),
        pick(2, 1, "p50"),
        pick(4, 3, "p75"),
        pick(20, 19, "p95"),
        F.min("n").alias("n"),
    )


@staged(
    "q_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS v,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    r AS (
      SELECT grp, v, cnt,
             ROW_NUMBER() OVER (PARTITION BY grp
                                ORDER BY cnt DESC, v) AS rk,
             MAX(cnt) OVER (PARTITION BY grp) AS max_cnt
      FROM c
    )
    SELECT grp, MIN(CASE WHEN rk = 1 THEN v END) AS mode_value,
           MIN(max_cnt) AS mode_count,
           SUM(CASE WHEN cnt = max_cnt THEN 1 ELSE 0 END) AS n_tied
    FROM r GROUP BY grp
    """,
)
def q_mode(spark, sf_dir):
    """Mode aggregate: the most frequent value per group with an
    explicit smallest-value tie-break, plus how many values tie at the
    top — the argmax-over-COUNTS twin of q_argmax (which is argmax over
    a measure). Two hash aggs — (grp, value) counts, then the grp
    rollup — with a window only over the distinct-value table; every
    column is an exact integer. n_tied matters operationally: a mode
    with 50 ties is not a mode."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("bigint").alias("v"),
    ).agg(F.count("*").alias("cnt"))
    wg = Window.partitionBy("grp")
    r = c.select(
        "grp", "v", "cnt",
        F.row_number()
        .over(wg.orderBy(F.col("cnt").desc(), "v"))
        .alias("rk"),
        F.max("cnt").over(wg).alias("max_cnt"),
    )
    return r.groupBy("grp").agg(
        F.min(F.when(F.col("rk") == 1, F.col("v"))).alias("mode_value"),
        F.min("max_cnt").alias("mode_count"),
        F.sum(
            F.when(F.col("cnt") == F.col("max_cnt"), 1).otherwise(0)
        ).alias("n_tied"),
    )


@staged(
    "q_rolling_active",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ),
    contrib AS (
      SELECT du.day + CAST(o.o AS INT) AS window_day, du.user_id
      FROM du CROSS JOIN (
        SELECT UNNEST(generate_series(0, 6)) AS o
      ) o
    )
    SELECT window_day, COUNT(DISTINCT user_id) AS active_7d
    FROM contrib GROUP BY window_day
    """,
)
def q_rolling_active(spark, sf_dir):
    """Rolling 7-day active users — THE engagement metric, and the
    shape that breaks naive windowing: COUNT(DISTINCT) over a sliding
    range has no mergeable frame form. The scalable rewrite: dedup to
    (day, user), fan each out to the 7 window-ends it contributes to
    (a constant 7x on the ALREADY-DEDUPED day-user table, not on
    events), then one distinct-count per window day. Compare
    q_cumulative_distinct (all-history prefix) — this is the bounded-
    horizon version. Leading/trailing partial windows are kept by
    contract (identical in both engines); all integers."""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct()
    offsets = ev.sparkSession.range(7).select(
        F.col("id").cast("int").alias("o")
    )
    contrib = du.crossJoin(F.broadcast(offsets)).select(
        F.date_add("day", F.col("o")).alias("window_day"), "user_id"
    )
    return contrib.groupBy("window_day").agg(
        F.countDistinct("user_id").alias("active_7d")
    )


@staged(
    "q_theilsen",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
               AS d,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             CAST(b.n - a.n AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope,
             a.d AS d1, b.d AS d2
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    ),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope, d1, d2) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM slopes
    )
    SELECT event_type,
           MIN(CASE WHEN 2 * rn >= m THEN slope END) AS ts_slope,
           MIN(m) AS n_pairs
    FROM ranked GROUP BY event_type
    """,
)
def q_theilsen(spark, sf_dir):
    """Theil–Sen robust trend: the MEDIAN of all pairwise day-count
    slopes per event type — outlier-days move OLS arbitrarily but shift
    a median slope by one rank at most. The pairwise join is over DAILY
    PRE-AGGREGATES, so its size is C(days, 2) per type — bounded by the
    time range, NOT by event volume; at 100 TB the daily rollup absorbs
    the data scale and this stays a ~10^4-row computation. Each slope
    is one double division of exact integers (identical in both
    engines), the median is the discrete rank pick 2rn >= m under a
    total (slope, d1, d2) order — no averaging of middle elements, no
    float accumulation."""
    ev = _t(spark, sf_dir, "events")
    day_idx = F.expr(
        "CAST(floor(unix_timestamp(date_trunc('day', ts))) AS BIGINT)"
        " div 86400"
    )
    daily = ev.groupBy(
        "event_type", day_idx.alias("d")
    ).agg(F.count("*").alias("n"))
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("n").alias("n1")
    )
    b = daily.select(
        "event_type", F.col("d").alias("d2"), F.col("n").alias("n2")
    )
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "event_type",
            (
                (F.col("n2") - F.col("n1")).cast("double")
                / (F.col("d2") - F.col("d1")).cast("double")
            ).alias("slope"),
            "d1",
            "d2",
        )
    )
    wt = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(wt.orderBy("slope", "d1", "d2")).alias("rn"),
        F.count("*").over(wt).alias("m"),
    )
    return ranked.groupBy("event_type").agg(
        F.min(
            F.when(2 * F.col("rn") >= F.col("m"), F.col("slope"))
        ).alias("ts_slope"),
        F.min("m").alias("n_pairs"),
    )


@staged(
    "q_rolling_hll",
    oracle="""
    WITH h AS (
      SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
               AS d,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM events
    ),
    day_regs AS (
      SELECT d, hv & 15 AS reg,
             MAX(CASE
               WHEN (hv >> 4) = 0 THEN 21
               WHEN ((hv >> 4) & -(hv >> 4)) = 1 THEN 1
               WHEN ((hv >> 4) & -(hv >> 4)) = 2 THEN 2
               WHEN ((hv >> 4) & -(hv >> 4)) = 4 THEN 3
               WHEN ((hv >> 4) & -(hv >> 4)) = 8 THEN 4
               WHEN ((hv >> 4) & -(hv >> 4)) = 16 THEN 5
               WHEN ((hv >> 4) & -(hv >> 4)) = 32 THEN 6
               WHEN ((hv >> 4) & -(hv >> 4)) = 64 THEN 7
               WHEN ((hv >> 4) & -(hv >> 4)) = 128 THEN 8
               WHEN ((hv >> 4) & -(hv >> 4)) = 256 THEN 9
               WHEN ((hv >> 4) & -(hv >> 4)) = 512 THEN 10
               WHEN ((hv >> 4) & -(hv >> 4)) = 1024 THEN 11
               WHEN ((hv >> 4) & -(hv >> 4)) = 2048 THEN 12
               WHEN ((hv >> 4) & -(hv >> 4)) = 4096 THEN 13
               WHEN ((hv >> 4) & -(hv >> 4)) = 8192 THEN 14
               WHEN ((hv >> 4) & -(hv >> 4)) = 16384 THEN 15
               WHEN ((hv >> 4) & -(hv >> 4)) = 32768 THEN 16
               WHEN ((hv >> 4) & -(hv >> 4)) = 65536 THEN 17
               WHEN ((hv >> 4) & -(hv >> 4)) = 131072 THEN 18
               WHEN ((hv >> 4) & -(hv >> 4)) = 262144 THEN 19
               WHEN ((hv >> 4) & -(hv >> 4)) = 524288 THEN 20
               ELSE 21 END) AS m
      FROM h GROUP BY 1, 2
    ),
    grid AS (
      SELECT dd.d, r.reg
      FROM (SELECT DISTINCT d FROM day_regs) dd
      CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS reg) r
    ),
    dense AS (
      SELECT g.d, g.reg, dr.m
      FROM grid g LEFT JOIN day_regs dr ON g.d = dr.d AND g.reg = dr.reg
    ),
    rolled AS (
      SELECT d, reg,
             MAX(m) OVER (PARTITION BY reg ORDER BY d
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS m7
      FROM dense
    ),
    sums AS (
      SELECT d,
             SUM(CASE WHEN m7 IS NULL THEN CAST(1 AS BIGINT) << 56
                 ELSE CAST(1 AS BIGINT) << CAST(56 - m7 AS INT) END) AS s
      FROM rolled GROUP BY d
    )
    SELECT d AS day_idx,
           CAST(0.673 AS DOUBLE) * CAST(256.0 AS DOUBLE)
             * CAST(72057594037927936.0 AS DOUBLE) / CAST(s AS DOUBLE)
             AS est_active_7d
    FROM sums
    """,
)
def q_rolling_hll(spark, sf_dir):
    """Rolling 7-day distinct actives, SKETCHED — the approximate twin
    of q_rolling_active that survives any window length at 100 TB: per
    day, a 16-register HLL of user hashes (fixed-size state, map-side
    combined); the trailing-week sketch is an elementwise register MAX
    over a RANGE frame on the day index — merging sketches, never
    touching users again. Densification is single-pass: the per-day agg
    emits all 16 registers as conditional-max columns (absent ones
    NULL) and stack() unpivots to (day, reg) rows — a register-day with
    no row would silently drop from the window frame, and a grid join
    would scan events twice; absent registers contribute the 2^56
    zero-register term. Integer-rho arithmetic
    throughout (same trick as q_sketch_hll), so the approximation
    itself is oracle-exact. Cost: daily rollup + a days×16 window —
    compare q_rolling_active's (day,user)×7 fan-out, which grows with
    user count; this one never does."""
    ev = _t(spark, sf_dir, "events")
    day_idx = F.expr(
        "CAST(floor(unix_timestamp(date_trunc('day', ts))) AS BIGINT)"
        " div 86400"
    )
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    h = ev.select(day_idx.alias("d"), hv.alias("hv"))
    w = F.shiftright(F.col("hv"), 4)
    bbit = w.bitwiseAND(-w)
    rho = F.when(w == 0, F.lit(21))
    for k in range(20):
        rho = rho.when(bbit == (1 << k), F.lit(k + 1))
    rho = rho.otherwise(F.lit(21))
    # ONE scan: per-day row with 16 conditional register maxes (absent
    # registers stay NULL), then stack() back to (d, reg, m) — dense by
    # construction, no grid join, no second pass over events
    tagged = h.select(
        "d", F.col("hv").bitwiseAND(F.lit(15)).alias("reg"), rho.alias("rho")
    )
    day_row = tagged.groupBy("d").agg(
        *[
            F.max(F.when(F.col("reg") == j, F.col("rho"))).alias(f"m{j}")
            for j in range(16)
        ]
    )
    stack_expr = "stack(16, " + ", ".join(
        f"{j}, m{j}" for j in range(16)
    ) + ") AS (reg, m)"
    dense = day_row.selectExpr("d", stack_expr)
    w7 = (
        Window.partitionBy("reg").orderBy("d").rangeBetween(-6, 0)
    )
    rolled = dense.select(
        "d", "reg", F.max("m").over(w7).alias("m7")
    )
    sums = rolled.groupBy("d").agg(
        F.sum(
            F.when(
                F.col("m7").isNull(), F.lit(1 << 56).cast("bigint")
            ).otherwise(
                F.expr("shiftleft(cast(1 as bigint), cast(56 - m7 as int))")
            )
        ).alias("s")
    )
    return sums.select(
        F.col("d").alias("day_idx"),
        (
            F.lit(0.673) * F.lit(256.0) * F.lit(72057594037927936.0)
            / F.col("s").cast("double")
        ).alias("est_active_7d"),
    )


@staged(
    "q_window_funnel",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (SELECT user_id, ts AS t1 FROM events WHERE event_type = 'view'),
    c AS (
      SELECT v.user_id, v.t1, MIN(e.ts) AS t2
      FROM v JOIN events e
        ON e.user_id = v.user_id AND e.event_type = 'click' AND e.ts > v.t1
      GROUP BY v.user_id, v.t1
    ),
    p AS (
      SELECT c.user_id, c.t1, MIN(e.ts) AS t3
      FROM c JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase'
           AND e.ts > c.t2
      GROUP BY c.user_id, c.t1
    ),
    lvl AS (
      SELECT u.user_id,
             CASE
               WHEN EXISTS (SELECT 1 FROM p WHERE p.user_id = u.user_id
                            AND p.t3 <= p.t1 + INTERVAL 24 HOUR) THEN 3
               WHEN EXISTS (SELECT 1 FROM c WHERE c.user_id = u.user_id
                            AND c.t2 <= c.t1 + INTERVAL 24 HOUR) THEN 2
               WHEN EXISTS (SELECT 1 FROM v WHERE v.user_id = u.user_id)
                 THEN 1
               ELSE 0
             END AS level
      FROM u
    )
    SELECT level, COUNT(*) AS n_users FROM lvl GROUP BY level
    """,
)
def q_window_funnel(spark, sf_dir):
    """Time-WINDOWED funnel (the windowFunnel of product analytics):
    the deepest view→click→purchase chain completing within 24 h of its
    OWN first step — unlike q_funnel, which only orders stages, the
    clock restarts at every candidate view, so a user converts if ANY
    view anchors a fast-enough chain. Exactness requires evaluating
    every anchor: each view takes its first subsequent click, then the
    first purchase after that click (greedy-first is optimal per
    anchor), and the per-user level is the best anchor's depth. The
    anchor×event join is bounded by per-user activity — at 100 TB the
    standard prelude is sessionization (q_sessionize), which caps
    anchors per session. All timestamp comparisons, zero floats."""
    ev = _t(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("t1")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("tc")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("tp")
    )
    c = (
        v.join(clicks, "user_id")
        .filter(F.col("tc") > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("tc").alias("t2"))
    )
    p = (
        c.join(purchases, "user_id")
        .filter(F.col("tp") > F.col("t2"))
        .groupBy("user_id", "t1")
        .agg(F.min("tp").alias("t3"))
    )
    day = F.expr("INTERVAL 24 HOURS")
    l3 = (
        p.filter(F.col("t3") <= F.col("t1") + day)
        .select("user_id")
        .distinct()
        .withColumn("l3", F.lit(1))
    )
    l2 = (
        c.filter(F.col("t2") <= F.col("t1") + day)
        .select("user_id")
        .distinct()
        .withColumn("l2", F.lit(1))
    )
    l1 = v.select("user_id").distinct().withColumn("l1", F.lit(1))
    lvl = (
        u.join(l3, "user_id", "left")
        .join(l2, "user_id", "left")
        .join(l1, "user_id", "left")
        .select(
            F.when(F.col("l3").isNotNull(), 3)
            .when(F.col("l2").isNotNull(), 2)
            .when(F.col("l1").isNotNull(), 1)
            .otherwise(0)
            .alias("level")
        )
    )
    return lvl.groupBy("level").agg(F.count("*").alias("n_users"))


def _confusion_oracle() -> str:
    from .catalog import _duck_lang_id

    return f"""
    WITH base AS ({_duck_lang_id()})
    SELECT lang, pred_lang, COUNT(*) AS n,
           CAST(SUM(COUNT(*)) OVER (PARTITION BY lang) AS BIGINT)
             AS class_total,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER (PARTITION BY lang) AS DOUBLE)
             AS cell_rate
    FROM base GROUP BY lang, pred_lang
    """


@staged("q_eval_confusion", oracle=_confusion_oracle())
def q_eval_confusion(spark, sf_dir):
    """Model-evaluation confusion matrix ON the engine: true language ×
    predicted language cell counts with per-true-class rates (the
    diagonal rate is recall) — training pipelines score quality
    classifiers and lang-id at corpus scale exactly like this, and
    shipping the evaluation to the data beats exporting predictions.
    Reuses q_lang_id's deterministic argmax; the matrix is one hash agg
    over (true, pred) and the class totals are a window over the ≤
    |langs|² cells. cell_rate is one double division of exact
    integers."""
    import aws_vpcflowlogs_parquet_spark.operators.text as tx

    base = tx.lang_id(_t(spark, sf_dir, "documents"))
    cells = base.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    wl = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "pred_lang",
        "n",
        F.sum("n").over(wl).cast("bigint").alias("class_total"),
        (
            F.col("n").cast("double")
            / F.sum("n").over(wl).cast("double")
        ).alias("cell_rate"),
    )


def _lsh_recall_oracle() -> str:
    from .catalog import _DUCK_BANDS, _DUCK_MINS, _DUCK_SHINGLES, _DUCK_TOKENS

    return f"""
    WITH sigs AS MATERIALIZED (
      SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS sh
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents)
    ),
    nonempty AS MATERIALIZED (
      SELECT doc_id, sh FROM sigs WHERE len(sh) > 0
    ),
    exact AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM nonempty a JOIN nonempty b ON a.doc_id < b.doc_id
      WHERE 6 * len(list_intersect(a.sh, b.sh)) >= len(a.sh) + len(b.sh)
    ),
    hs AS MATERIALIZED (
      SELECT doc_id,
             ('0x' || substring(md5(s), 1, 8))::BIGINT AS h1,
             ('0x' || substring(md5(s), 9, 8))::BIGINT AS h2
      FROM (SELECT doc_id, unnest(sh) AS s FROM nonempty)
    ),
    mins AS MATERIALIZED (SELECT doc_id, {_DUCK_MINS} FROM hs GROUP BY doc_id),
    bands AS MATERIALIZED (
      SELECT doc_id, unnest([{_DUCK_BANDS}]) AS band FROM mins
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
    ),
    caught AS (
      SELECT e.doc_a, e.doc_b FROM exact e
      JOIN cand c ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b
    )
    SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
           (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM caught) AS n_caught,
           CASE WHEN (SELECT COUNT(*) FROM exact) = 0 THEN NULL
                ELSE CAST((SELECT COUNT(*) FROM caught) AS DOUBLE)
                     / CAST((SELECT COUNT(*) FROM exact) AS DOUBLE) END
             AS recall,
           CASE WHEN (SELECT COUNT(*) FROM cand) = 0 THEN NULL
                ELSE CAST((SELECT COUNT(*) FROM caught) AS DOUBLE)
                     / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE) END
             AS precision
    """


@staged("q_lsh_recall", oracle=_lsh_recall_oracle())
def q_lsh_recall(spark, sf_dir):
    """LSH quality audit ON the engine: recall and precision of the
    MinHash band-bucket CANDIDATE pairs against the exact Jaccard >= 0.2
    pair relation over the WHOLE corpus — the measurement that sizes
    bands x rows before anyone trusts sketch-only dedup at 100 TB
    (q_minhash_est_error audits the per-pair ESTIMATE; this audits the
    CANDIDATE SET). The exact side runs the prefix-filtered join (no
    quadratic step); the candidate side is the standard banding
    pipeline; both shuffle ids/signatures only. The oracle replays both
    pipelines in SQL — brute force for the exact side — so the whole
    evaluation is value-verified. Counts exact, ratios one division
    each."""
    import aws_vpcflowlogs_parquet_spark.operators.dedup as dd

    docs = _t(spark, sf_dir, "documents")
    exact = dd.prefix_filtered_pairs(docs, 1, 5).select("doc_a", "doc_b")
    sigs = dd.shingled(docs).persist()
    sigs.count()
    bands = dd.band_keys(dd.minhash_signatures(sigs))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    caught = exact.join(cand, ["doc_a", "doc_b"])
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_caught = caught.agg(F.count("*").alias("n_caught"))
    row = (
        n_exact.crossJoin(F.broadcast(n_cand)).crossJoin(
            F.broadcast(n_caught)
        )
    )
    return row.select(
        "n_exact",
        "n_candidates",
        "n_caught",
        F.when(
            F.col("n_exact") == 0, F.lit(None).cast("double")
        )
        .otherwise(
            F.col("n_caught").cast("double") / F.col("n_exact").cast("double")
        )
        .alias("recall"),
        F.when(
            F.col("n_candidates") == 0, F.lit(None).cast("double")
        )
        .otherwise(
            F.col("n_caught").cast("double")
            / F.col("n_candidates").cast("double")
        )
        .alias("precision"),
    )


@staged(
    "q_near_dup_rate",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x != '') AS tk
      FROM documents
    ),
    sigs AS MATERIALIZED (
      SELECT doc_id, source,
             list_distinct(CASE WHEN len(tk) >= 3 THEN
               list_transform(generate_series(1, len(tk) - 2),
                 i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
             ELSE [] END) AS sh
      FROM t
    ),
    ne AS MATERIALIZED (SELECT doc_id, source, sh FROM sigs WHERE len(sh) > 0),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ne a JOIN ne b ON a.doc_id < b.doc_id
      WHERE 6 * len(list_intersect(a.sh, b.sh)) >= len(a.sh) + len(b.sh)
    ),
    dupped AS (
      SELECT doc_a AS doc_id FROM pairs
      UNION SELECT doc_b FROM pairs
    )
    SELECT s.source,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS n_near_dup,
           CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS dup_rate
    FROM sigs s LEFT JOIN dupped d ON s.doc_id = d.doc_id
    GROUP BY s.source
    """,
)
def q_near_dup_rate(spark, sf_dir):
    """Near-duplication health per source: the fraction of each
    source's documents participating in ANY Jaccard >= 0.2 pair — the
    number a dataset card reports ('source X is 40% internally
    redundant') and the trigger for targeted re-crawling or dedup
    policy. Pair discovery is the prefix-filtered exact join (no
    quadratic step); participants reduce to a distinct doc set, and the
    per-source rollup is one left-join + hash agg. Counts exact,
    dup_rate one division. The oracle replays it with the brute-force
    pair relation, so the pruning's losslessness is re-certified
    through a second consumer."""
    import aws_vpcflowlogs_parquet_spark.operators.dedup as dd

    docs = _t(spark, sf_dir, "documents")
    pairs = dd.prefix_filtered_pairs(docs, 1, 5)
    dupped = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(dupped, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("is_dup").isNotNull(), 1).otherwise(0)
            ).alias("n_near_dup"),
            (
                F.sum(
                    F.when(F.col("is_dup").isNotNull(), 1).otherwise(0)
                ).cast("double")
                / F.count("*")
            ).alias("dup_rate"),
        )
    )
