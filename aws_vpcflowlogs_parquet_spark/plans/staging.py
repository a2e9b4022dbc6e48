"""Staging catalog — queries built ahead of the external driver's
50-pending-per-round verification capacity, held out of ``queries()``
until the queue drains.

Round-6 status: THIRTEEN queries staged for round-7 promotion (the round-6
catalog closed at 263 with 43 pending — the cap leaves no safe headroom,
so this batch waits out the round fully built and gated). The 24 queries
staged during round 4 were promoted verbatim in round 5; the same
promotion path applies: move the ``@staged`` block to catalog.py, switch
the decorator to ``@register``, add the SURVEY §2.3 row, confirm pending
≤ 50, re-run the sf0.01 drive.

Staged set (SURVEY §2.5): q_resource_alloc (link prediction on the
integer-quantized resource-allocation index), q_rolling_regression
(24-observation rolling OLS slope), q_conversion_curve (signup→purchase
conversion by horizon), q_negative_sampling (deterministic negative
pairs for recommender training), q_weighted_jaccard (multiset Jaccard
source matrix), q_snapshot_diff (dataset-version reconciliation),
q_lag_features (leakage-safe lag/rolling feature matrix),
q_calendar_dim (generated date dimension with zero-filled activity),
q_stream_cep (streaming CEP pattern match with O(1)-per-key suffix
state, the Flink-CEP shape), q_dim_stats (per-dimension embedding
profile on exact decimal means), q_pit_audit (point-in-time leakage
audit), q_compaction_plan (greedy bin-packed table maintenance),
q_tokenizer_fertility (per-language tokenizer evaluation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..session import ensure_session_posture
from ..sources.tables import load_table
from .catalog import _DUCK_TOKENS

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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@staged(
    "q_resource_alloc",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT
             LEAST(user_id % 499, (2 * user_id + event_id) % 499) AS lo,
             GREATEST(user_id % 499, (2 * user_id + event_id) % 499) AS hi
      FROM events
      WHERE user_id % 499 != (2 * user_id + event_id) % 499
    ),
    sym AS (
      SELECT lo AS a, hi AS b FROM raw
      UNION ALL SELECT hi, lo FROM raw
    ),
    deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY a),
    wedge AS (
      SELECT e1.a, e1.b AS z, e2.b AS c
      FROM sym e1 JOIN sym e2 ON e1.b = e2.a
      WHERE e1.a < e2.b
    ),
    cand AS (
      SELECT w.a, w.z, w.c
      FROM wedge w
      LEFT JOIN sym s ON s.a = w.a AND s.b = w.c
      WHERE s.a IS NULL
    ),
    scored AS (
      SELECT cand.a, cand.c,
             CAST(COUNT(*) AS BIGINT) AS common,
             CAST(SUM(1000000 // dz.d) AS BIGINT) AS ra_micro
      FROM cand JOIN deg dz ON cand.z = dz.a
      GROUP BY cand.a, cand.c
    )
    SELECT a, c, common, ra_micro
    FROM scored ORDER BY ra_micro DESC, a, c LIMIT 20
    """,
)
def q_resource_alloc(spark, sf_dir):
    """Link prediction by the resource-allocation index RA(a,c) =
    Σ_z∈Γ(a)∩Γ(c) 1/deg(z), on the sparse mod-499 graph (the
    mod-41 wedge graph saturates to complete at sf0.01, leaving no
    non-adjacent pairs) — the strongest of the classic local
    similarity indices (Zhou et al. 2009), which down-weights hub
    intermediaries where q_node_jaccard's common-neighbor count does
    not. Each wedge contributes the exact integer 10⁶ div deg(z), so
    the score is a BIGINT sum — no rational arithmetic, no floats,
    and the identical quantization on both engines. Same physical
    shape as the other wedge queries: one distinct-edge shuffle, the
    wedge equi-join (Σdeg² bound, hub-capping documented), a left-anti
    for non-adjacency, one broadcast degree join keyed on the
    intermediate node, one grouped sum, TakeOrdered(20) on the
    (ra_micro, a, c) total order."""
    from ..operators.graph import sym_edges

    sym = sym_edges(_t(spark, sf_dir, "events"), 499)
    deg = sym.groupBy("a").agg(F.count("*").cast("bigint").alias("d"))
    e2 = sym.select(F.col("a").alias("z"), F.col("b").alias("c"))
    wedge = (
        sym.select("a", F.col("b").alias("z"))
        .join(e2, "z")
        .filter(F.col("a") < F.col("c"))
    )
    cand = wedge.join(
        sym.select("a", F.col("b").alias("c")), ["a", "c"], "left_anti"
    )
    dz = deg.select(F.col("a").alias("z"), F.col("d").alias("dz"))
    scored = (
        cand.join(F.broadcast(dz), "z")
        .groupBy("a", "c")
        .agg(
            F.count("*").cast("bigint").alias("common"),
            F.sum(F.expr("1000000 div dz")).cast("bigint").alias("ra_micro"),
        )
    )
    return (
        scored.select("a", "c", "common", "ra_micro")
        .orderBy(F.desc("ra_micro"), "a", "c")
        .limit(20)
    )


@staged(
    "q_rolling_regression",
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY hr
    ),
    rolled AS (
      SELECT hr,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_w,
             CAST(SUM(hr) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(hr * hr) OVER w AS BIGINT) AS sxx,
             CAST(SUM(hr * y) OVER w AS BIGINT) AS sxy
      FROM hourly
      WINDOW w AS (ORDER BY hr ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT hr,
           CAST(n_w * sxy - sx * sy AS BIGINT) AS num,
           CAST(n_w * sxx - sx * sx AS BIGINT) AS den,
           CAST(n_w * sxy - sx * sy AS DOUBLE)
             / CAST(n_w * sxx - sx * sx AS DOUBLE) AS slope
    FROM rolled WHERE n_w = 24 ORDER BY hr
    """,
)
def q_rolling_regression(spark, sf_dir):
    """Rolling 24-observation OLS trend of the hourly click rate — the
    windowed generalization of q_trend_ols, i.e. the 'is this metric
    accelerating right now' sparkline behind ops and growth
    dashboards. The corpus collapses to the hourly aggregate first;
    the five sufficient statistics then come from ONE window pass
    (ROWS 23 PRECEDING) over |hours| rows, so no self-joins and no
    per-window recomputation. Slope numerator and denominator are
    exact BIGINTs on the epoch-hour lattice (magnitudes sized to stay
    in range at 100× test scale); partial head windows are excluded
    by the exact n_w = 24 predicate. One identical double division."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.expr("unix_timestamp(ts) div 3600").cast("bigint").alias("hr")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("y")
    )
    w = Window.orderBy("hr").rowsBetween(-23, Window.currentRow)
    rolled = hourly.select(
        "hr",
        F.count("*").over(w).cast("bigint").alias("n_w"),
        F.sum("hr").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("hr") * F.col("hr")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("hr") * F.col("y")).over(w).cast("bigint").alias("sxy"),
    )
    num = F.col("n_w") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_w") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        rolled.filter(F.col("n_w") == 24)
        .select(
            "hr",
            num.cast("bigint").alias("num"),
            den.cast("bigint").alias("den"),
            (num.cast("double") / den.cast("double")).alias("slope"),
        )
        .orderBy("hr")
    )


@staged(
    "q_conversion_curve",
    oracle="""
    WITH signup AS (
      SELECT user_id,
             CAST(MIN(floor(epoch(ts))) AS BIGINT) AS s
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT signup.user_id, s,
             CAST(MIN(CASE WHEN floor(epoch(e.ts)) >= s
                           THEN floor(epoch(e.ts)) END) AS BIGINT) AS p
      FROM signup
      LEFT JOIN events e
        ON e.user_id = signup.user_id AND e.event_type = 'purchase'
      GROUP BY signup.user_id, s
    ),
    horizons AS (SELECT unnest([1, 3, 7, 14]) AS k)
    SELECT CAST(k AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_cohort,
           CAST(SUM(CASE WHEN p IS NOT NULL AND p - s <= k * 86400
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_conv,
           CAST((SUM(CASE WHEN p IS NOT NULL AND p - s <= k * 86400
                          THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
                AS BIGINT) AS rate_micro,
           CAST(SUM(CASE WHEN p IS NOT NULL AND p - s <= k * 86400
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS rate
    FROM conv, horizons GROUP BY k ORDER BY k
    """,
)
def q_conversion_curve(spark, sf_dir):
    """Signup→purchase conversion curve by horizon (1/3/7/14 days) —
    the growth team's activation curve, and the label-generation
    query for a churn/conversion model (the k-day label is exactly
    the n_conv predicate). First-signup and first-purchase-after-
    signup reduce to per-user aggs on the epoch-second lattice (the
    purchase probe is a user-keyed equi-join — co-partitioned with
    the signup agg at scale); the horizon grid is a 4-row broadcast
    and each rate is one integer comparison away. No calendar
    arithmetic — k·86400 on BIGINTs."""
    ev = _t(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_timestamp("ts")).cast("bigint").alias("s"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_timestamp("ts").cast("bigint").alias("pe")
    )
    conv = (
        signup.join(purchases, "user_id", "left")
        .groupBy("user_id", "s")
        .agg(
            F.min(F.when(F.col("pe") >= F.col("s"), F.col("pe")))
            .cast("bigint")
            .alias("p")
        )
    )
    horizons = spark.range(0, 4).select(
        F.element_at(F.array(F.lit(1), F.lit(3), F.lit(7), F.lit(14)),
                     (F.col("id") + 1).cast("int")).alias("k")
    )
    converted = F.when(
        F.col("p").isNotNull()
        & (F.col("p") - F.col("s") <= F.col("k") * 86400),
        1,
    ).otherwise(0)
    return (
        conv.crossJoin(F.broadcast(horizons))
        .groupBy(F.col("k").cast("int").alias("k"))
        .agg(
            F.count("*").cast("bigint").alias("n_cohort"),
            F.sum(converted).cast("bigint").alias("n_conv"),
            F.expr(
                "CAST((SUM(CASE WHEN p IS NOT NULL AND p - s <= k * 86400"
                " THEN 1 ELSE 0 END) * 1000000) div COUNT(*) AS BIGINT)"
            ).alias("rate_micro"),
            (
                F.sum(converted).cast("double") / F.count("*").cast("double")
            ).alias("rate"),
        )
        .orderBy("k")
    )


@staged(
    "q_negative_sampling",
    oracle="""
    WITH pos AS (
      SELECT DISTINCT user_id, event_id % 1000 AS item FROM events
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    items AS (SELECT DISTINCT event_id % 1000 AS item FROM events),
    neg AS (
      SELECT u.user_id, i.item
      FROM users u CROSS JOIN items i
      LEFT JOIN pos p ON p.user_id = u.user_id AND p.item = i.item
      WHERE p.user_id IS NULL
    ),
    chosen AS (
      SELECT user_id, CAST(MIN(item) AS BIGINT) AS neg_item
      FROM neg GROUP BY user_id
    )
    SELECT CAST(neg_item % 10 AS BIGINT) AS item_band,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(neg_item) AS BIGINT) AS min_item,
           CAST(MAX(neg_item) AS BIGINT) AS max_item
    FROM chosen GROUP BY item_band ORDER BY item_band
    """,
)
def q_negative_sampling(spark, sf_dir):
    """Deterministic negative sampling for recommender / contrastive
    training: for each user, the smallest item (the event_id mod-1000
    pseudo-catalog) they have NEVER interacted with — the
    reproducible analogue of random negative sampling
    (training-data pipelines need the deterministic form for
    replayable builds). The positives relation is one distinct agg;
    the user × item grid is a broadcast cross join against the
    |items| dimension; negatives fall out of a left-anti probe and
    the per-user pick is a MIN agg (total order, no randomness).
    Users who touched the full catalog produce no negative and drop
    out identically on both sides; the report buckets chosen
    negatives into 10 item bands. At 100 TB the grid is
    |users|·|items| rows streamed through one co-partitioned
    anti-join — never materialized — and the real-catalog variant
    swaps the broadcast for the bucketed-grid join."""
    ev = _t(spark, sf_dir, "events")
    pos = ev.select(
        "user_id", (F.col("event_id") % 1000).alias("item")
    ).distinct()
    users = ev.select("user_id").distinct()
    items = ev.select((F.col("event_id") % 1000).alias("item")).distinct()
    grid = users.crossJoin(F.broadcast(items))
    neg = grid.join(pos, ["user_id", "item"], "left_anti")
    chosen = neg.groupBy("user_id").agg(
        F.min("item").cast("bigint").alias("neg_item")
    )
    return (
        chosen.groupBy((F.col("neg_item") % 10).alias("item_band"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("neg_item").cast("bigint").alias("min_item"),
            F.max("neg_item").cast("bigint").alias("max_item"),
        )
        .orderBy("item_band")
    )


@staged(
    "q_weighted_jaccard",
    oracle=f"""
    WITH tf AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, unnest({_DUCK_TOKENS}) AS tok FROM documents)
      GROUP BY source, tok
    ),
    totals AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY source
    ),
    mins AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS sum_min
      FROM tf a JOIN tf b ON a.tok = b.tok AND a.source < b.source
      GROUP BY src_a, src_b
    )
    SELECT src_a, src_b, sum_min,
           CAST(na.n + nb.n - sum_min AS BIGINT) AS sum_max,
           CAST((sum_min * 1000000) // (na.n + nb.n - sum_min) AS BIGINT)
             AS wj_micro,
           CAST(sum_min AS DOUBLE)
             / CAST(na.n + nb.n - sum_min AS DOUBLE) AS weighted_jaccard
    FROM mins
    JOIN totals na ON mins.src_a = na.source
    JOIN totals nb ON mins.src_b = nb.source
    ORDER BY src_a, src_b
    """,
)
def q_weighted_jaccard(spark, sf_dir):
    """Multiset (weighted) Jaccard similarity between every source
    pair's token bags — the duplication-aware complement to
    q_source_similarity's cosine: Σmin(cₐ,c_b) / Σmax(cₐ,c_b), where
    the max-sum needs NO outer join because Σmax = Nₐ + N_b − Σmin
    (multiset identity) — so the whole matrix is the same inner
    token equi-join as the cosine Gram plus two broadcast totals.
    All numerators/denominators are exact BIGINTs; wj_micro ranks on
    the integer lattice and one identical double division reports
    the ratio. Same 100 TB posture as q_source_similarity: one
    (source, token) corpus-scale agg, token-keyed join with the
    stopword-cut hub mitigation."""
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(dd.tokens_col("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    totals = tf.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    a = tf.select(F.col("source").alias("src_a"), "tok", F.col("c").alias("c_a"))
    b = tf.select(F.col("source").alias("src_b"), "tok", F.col("c").alias("c_b"))
    mins = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.least(F.col("c_a"), F.col("c_b")))
            .cast("bigint")
            .alias("sum_min")
        )
    )
    na = totals.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = totals.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    smax = F.col("n_a") + F.col("n_b") - F.col("sum_min")
    return (
        mins.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            "sum_min",
            smax.cast("bigint").alias("sum_max"),
            F.expr(
                "CAST((sum_min * 1000000) div (n_a + n_b - sum_min)"
                " AS BIGINT)"
            ).alias("wj_micro"),
            (F.col("sum_min").cast("double") / smax.cast("double")).alias(
                "weighted_jaccard"
            ),
        )
        .orderBy("src_a", "src_b")
    )


@staged(
    "q_snapshot_diff",
    oracle="""
    WITH base AS (
      SELECT event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    v1 AS (SELECT * FROM base WHERE event_id % 13 != 0),
    v2 AS (
      SELECT event_id,
             cents + CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS cents
      FROM base WHERE event_id % 11 != 0
    ),
    diff AS (
      SELECT COALESCE(v1.event_id, v2.event_id) AS event_id,
             v1.cents AS c1, v2.cents AS c2,
             CASE WHEN v1.event_id IS NULL THEN 'added'
                  WHEN v2.event_id IS NULL THEN 'removed'
                  WHEN v1.cents != v2.cents THEN 'changed'
                  ELSE 'same' END AS status
      FROM v1 FULL OUTER JOIN v2 ON v1.event_id = v2.event_id
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(COALESCE(c1, 0)) AS BIGINT) AS cents_v1,
           CAST(SUM(COALESCE(c2, 0)) AS BIGINT) AS cents_v2
    FROM diff GROUP BY status ORDER BY status
    """,
)
def q_snapshot_diff(spark, sf_dir):
    """Dataset-version reconciliation: a full-outer key join between
    two snapshot views (deterministically derived from events — v2
    drops the mod-11 rows, adds the mod-13 rows v1 lacks, and
    perturbs the mod-7 values) classifying every key as
    added / removed / changed / same with per-class row counts and
    value mass. This is the diff report every pipeline publishes
    between snapshot publishes (and the CDC-validation twin of
    q_cdc_merge). The join is key-equi and co-partitioned; values
    compare on the exact cent lattice (floor(x·100 + 0.5), identical
    IEEE tree). At 100 TB: one full-outer shuffle on the key plus a
    4-group agg — the minimal reconciliation cost."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        F.expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").alias("cents"),
    )
    v1 = base.filter(F.col("event_id") % 13 != 0).select(
        F.col("event_id").alias("k1"), F.col("cents").alias("c1")
    )
    v2 = (
        base.filter(F.col("event_id") % 11 != 0)
        .select(
            F.col("event_id").alias("k2"),
            (
                F.col("cents")
                + F.when(F.col("event_id") % 7 == 0, 1).otherwise(0)
            ).alias("c2"),
        )
    )
    diff = v1.join(v2, F.col("k1") == F.col("k2"), "full_outer").select(
        F.when(F.col("k1").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .when(F.col("c1") != F.col("c2"), "changed")
        .otherwise("same")
        .alias("status"),
        "c1",
        "c2",
    )
    return (
        diff.groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.coalesce(F.col("c1"), F.lit(0)))
            .cast("bigint")
            .alias("cents_v1"),
            F.sum(F.coalesce(F.col("c2"), F.lit(0)))
            .cast("bigint")
            .alias("cents_v2"),
        )
        .orderBy("status")
    )


@staged(
    "q_lag_features",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             event_type, ts
      FROM events
    )
    SELECT event_id, user_id, cents,
           lag(cents, 1) OVER w AS lag1,
           lag(cents, 2) OVER w AS lag2,
           CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum3,
           CAST(CASE WHEN lead(event_type, 1) OVER w = 'purchase'
                     THEN 1 ELSE 0 END AS INT) AS next_purchase
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
    """,
)
def q_lag_features(spark, sf_dir):
    """Leakage-safe lag/rolling feature matrix — the canonical
    training-data transform for sequential models: per user-ordered
    stream, the two previous values, a trailing 3-row sum, and the
    one-step-ahead purchase label (lead — the only column allowed to
    look forward, because it IS the label). Everything computes in
    ONE (user, time) window pass with a total order (ts, event_id),
    so the matrix is reproducible row-for-row; values ride the exact
    cent lattice and nulls at sequence edges are preserved (models
    see true missingness, not imputed zeros). At 100 TB this is one
    shuffle on user_id shared by all four features — the reason
    feature stores batch lag features together."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        F.expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").alias("cents"),
        "event_type",
        "ts",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        base.select(
            "event_id",
            "user_id",
            "cents",
            F.lag("cents", 1).over(w).alias("lag1"),
            F.lag("cents", 2).over(w).alias("lag2"),
            F.sum("cents")
            .over(w.rowsBetween(-2, Window.currentRow))
            .cast("bigint")
            .alias("sum3"),
            F.when(F.lead("event_type", 1).over(w) == "purchase", 1)
            .otherwise(0)
            .cast("int")
            .alias("next_purchase"),
        )
        .orderBy("event_id")
    )


@staged(
    "q_calendar_dim",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events
    ),
    days AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY day
    )
    SELECT strftime(days.day, '%Y-%m-%d') AS day,
           CAST(isodow(days.day) - 1 AS INT) AS dow,
           CAST(month(days.day) AS INT) AS month,
           CAST(CASE WHEN isodow(days.day) >= 6 THEN 1 ELSE 0 END AS INT)
             AS is_weekend,
           CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
    FROM days LEFT JOIN daily ON days.day = daily.day
    ORDER BY day
    """,
)
def q_calendar_dim(spark, sf_dir):
    """Generated date dimension over the observed event span with
    zero-filled daily activity — the dim-table every warehouse
    derives rather than stores, and the gap-free axis reporting
    layers join against (q_gap_fill's calendar twin). The span comes
    from one min/max agg; the day axis is a codegen'd sequence()
    explode of that one row (never a stored table); daily counts are
    a map-side-combined agg left-joined with COALESCE(0). Weekday
    uses the Monday=0 convention on both engines (Spark weekday ↔
    DuckDB isodow−1 — the documented cross-engine calendar trap;
    ISO week numbers are avoided entirely). At 100 TB the only
    data-scale work is the daily agg; the dimension itself is
    |days| rows."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    return (
        days.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.weekday("day").cast("int").alias("dow"),
            F.month("day").cast("int").alias("month"),
            F.when(F.weekday("day") >= 5, 1).otherwise(0).cast("int").alias(
                "is_weekend"
            ),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        )
        .orderBy("day")
    )


@staged(
    "q_stream_cep",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, value,
             lag(value, 2) OVER w AS v2,
             lag(value, 1) OVER w AS v1,
             lead(value, 1) OVER w AS v_next
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    peaks AS (
      SELECT user_id, event_type FROM seq
      WHERE v2 IS NOT NULL AND v1 IS NOT NULL AND v_next IS NOT NULL
        AND v2 < v1 AND v1 < value AND v_next < value
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_peaks,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM peaks GROUP BY event_type ORDER BY event_type
    """,
)
def q_stream_cep(spark, sf_dir):
    """Streaming CEP: the rise-rise-peak pattern of q_cep_pattern run
    as a STREAM through the custom stateful operator
    (streaming/windows.py stream_cep_peaks, applyInPandasWithState) —
    the Flink-CEP capability Spark lacks natively, expressed with an
    O(1)-per-key suffix state that survives micro-batch boundaries
    (cross-batch confirmation is unit-tested in
    tests/test_streaming.py with a time-split two-batch feed). One
    availableNow pass over the staged events file emits per-user
    per-type peak deltas to the parquet sink; the returned frame
    aggregates them to the per-type totals, which equal the batch
    window query — the oracle. At 100 TB/day: state is 3 floats + a
    tag per user, partitioned by the groupBy hash; the sink carries
    only confirmed-peak deltas, not events."""
    from .catalog import _run_stream_to_parquet, _staged_event_stream
    from ..streaming.windows import stream_cep_peaks

    stream = _staged_event_stream(spark, sf_dir, "q_stream_cep")
    peaks = stream_cep_peaks(stream)
    emitted = _run_stream_to_parquet(spark, peaks, "q_stream_cep", mode="update")
    return (
        emitted.groupBy("event_type")
        .agg(
            F.sum("n_peaks").cast("bigint").alias("n_peaks"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("event_type")
    )


@staged(
    "q_dim_stats",
    oracle="""
    WITH vals AS (
      SELECT generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    )
    SELECT CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(v) AS min_v, MAX(v) AS max_v,
           CAST(CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)
                 ::DECIMAL(38,0)) AS BIGINT) AS DOUBLE) / 1000000.0
             / COUNT(*) AS mean_v,
           CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
    FROM vals GROUP BY dim ORDER BY dim
    """,
)
def q_dim_stats(spark, sf_dir):
    """Per-dimension embedding statistics (the PCA-prep / whitening
    profile): min, max, exact order-independent mean, and the negative
    count for every one of the 64 dimensions — the feature-store
    normalization table a training pipeline computes before
    standardizing vectors, and the complement of q_embedding_qc's
    per-VECTOR audit. The mean rides the engine's exact decimal
    summation (functions/casts.py): values quantize to micro units
    before the sum, so the aggregate is order-independent and
    bit-identical across engines and partitionings — a plain double
    SUM over millions of float32s would be neither. One posexplode →
    (dim) hash agg, map-side combined, 64 output rows; at 100 TB the
    explode fans out ×64 but the agg state is constant per dim."""
    from ..functions.casts import exact_avg

    emb = _t(spark, sf_dir, "embeddings")
    vals = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim0", "v"
        )
    ).select((F.col("dim0") + 1).cast("int").alias("dim"), "v")
    return (
        vals.groupBy("dim")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            exact_avg("v", 6).alias("mean_v"),
            F.sum(F.when(F.col("v") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_neg"),
        )
        .orderBy("dim")
    )


@staged(
    "q_pit_audit",
    oracle="""
    WITH tagged AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_label,
             CASE WHEN event_type = 'view'
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END AS feat_t
      FROM events
      WHERE event_type IN ('purchase', 'view')
    ),
    carried AS (
      SELECT user_id, t, is_label,
             LAST_VALUE(feat_t IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, is_label, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS ft
      FROM tagged
    ),
    labels AS (
      SELECT CASE WHEN ft IS NULL THEN 'missing'
                  WHEN ft > t THEN 'leak'
                  WHEN t - ft <= 3600 THEN 'fresh_1h'
                  WHEN t - ft <= 86400 THEN 'fresh_1d'
                  ELSE 'stale' END AS bucket
      FROM carried WHERE is_label = 1
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_labels
    FROM labels GROUP BY bucket ORDER BY bucket
    """,
)
def q_pit_audit(spark, sf_dir):
    """Point-in-time correctness audit for feature-store joins: for
    every label event (purchase), the as-of feature timestamp (latest
    view at or before the label) and its staleness bucket — fresh
    within the hour, within the day, stale, missing, or LEAK (feature
    from the future, which a correct as-of join makes structurally
    impossible; the audit proves it stays zero). This is the check ML
    platforms run before training to guarantee no target leakage. The
    as-of carry is one last-non-null window over the union of labels
    and features — the same single-pass shape as q_asof_join, with the
    total (t, is_label, event_id) order making same-second
    feature-before-label deterministic in both engines. Time lives on
    the epoch-second lattice; one shuffle on user_id; bucket math is
    integer comparisons."""
    ev = _t(spark, sf_dir, "events")
    tagged = ev.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("t"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "is_label"
        ),
        F.when(
            F.col("event_type") == "view",
            F.unix_timestamp("ts").cast("bigint"),
        ).alias("feat_t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_label", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "t",
        "is_label",
        F.last("feat_t", ignorenulls=True).over(w).alias("ft"),
    )
    labels = carried.filter(F.col("is_label") == 1).select(
        F.when(F.col("ft").isNull(), "missing")
        .when(F.col("ft") > F.col("t"), "leak")
        .when(F.col("t") - F.col("ft") <= 3600, "fresh_1h")
        .when(F.col("t") - F.col("ft") <= 86400, "fresh_1d")
        .otherwise("stale")
        .alias("bucket")
    )
    return (
        labels.groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_labels"))
        .orderBy("bucket")
    )


@staged(
    "q_compaction_plan",
    oracle="""
    WITH files AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
             o_orderkey % 16 AS slot,
             CAST(SUM(CAST(floor(o_totalprice + 0.5) AS BIGINT))
                  AS BIGINT) AS bytes
      FROM orders GROUP BY month, slot
    ),
    packed AS (
      SELECT month, slot, bytes,
             CAST((CAST(SUM(bytes) OVER (PARTITION BY month ORDER BY slot
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) - bytes) // 25000000 AS BIGINT) AS grp
      FROM files
    ),
    groups AS (
      SELECT month, grp, CAST(SUM(bytes) AS BIGINT) AS grp_bytes,
             CAST(COUNT(*) AS BIGINT) AS grp_files
      FROM packed GROUP BY month, grp
    )
    SELECT month,
           CAST(SUM(grp_files) AS BIGINT) AS n_files,
           CAST(SUM(grp_bytes) AS BIGINT) AS total_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MAX(grp_bytes) AS BIGINT) AS max_group_bytes
    FROM groups GROUP BY month ORDER BY month
    """,
)
def q_compaction_plan(spark, sf_dir):
    """Small-file compaction planning as a query — the analytic twin
    of operators/layout.py's compact(): a synthetic per-partition file
    inventory (month × 16 write slots, byte sizes from the exact
    order-value lattice) is greedily packed into ~25 MB output groups
    by a running-sum window (group = prefix_bytes div target, the
    sequential first-fit every table-maintenance service uses), and
    the plan report gives per-month file counts, group counts, and
    the largest output group. The inventory agg is the only
    data-scale pass; the packing window runs over |files| rows
    partitioned by month. Everything is BIGINT — no float sizes. At
    100 TB the real inventory comes from the transaction log, and
    this exact plan shape (agg → per-partition cumulative window →
    rollup) is unchanged."""
    orders = _t(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        (F.col("o_orderkey") % 16).alias("slot"),
    ).agg(
        F.sum(F.expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)"))
        .cast("bigint")
        .alias("bytes")
    )
    w = (
        Window.partitionBy("month")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = files.select(
        "month",
        "bytes",
        F.expr(
            "CAST((SUM(bytes) OVER (PARTITION BY month ORDER BY slot"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes)"
            " div 25000000 AS BIGINT)"
        ).alias("grp"),
    )
    groups = packed.groupBy("month", "grp").agg(
        F.sum("bytes").cast("bigint").alias("grp_bytes"),
        F.count("*").cast("bigint").alias("grp_files"),
    )
    return (
        groups.groupBy("month")
        .agg(
            F.sum("grp_files").cast("bigint").alias("n_files"),
            F.sum("grp_bytes").cast("bigint").alias("total_bytes"),
            F.count("*").cast("bigint").alias("n_groups"),
            F.max("grp_bytes").cast("bigint").alias("max_group_bytes"),
        )
        .orderBy("month")
    )


@staged(
    "q_tokenizer_fertility",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             CAST(len({_DUCK_TOKENS}) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(lower(text),
                  '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS subtoks,
             CAST(len(replace(text, ' ', '')) AS BIGINT) AS chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS n_words,
           CAST(SUM(subtoks) AS BIGINT) AS n_subtoks,
           CAST(SUM(chars) AS BIGINT) AS n_chars,
           CAST((SUM(subtoks) * 1000000) // SUM(words) AS BIGINT)
             AS fertility_micro,
           CAST((SUM(chars) * 1000000) // SUM(subtoks) AS BIGINT)
             AS chars_per_subtok_micro
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility by language — the standard multilingual
    tokenizer-evaluation metric (subword tokens per whitespace word;
    high fertility = the language is over-fragmented and
    under-represented per compute budget) plus bytes-per-token, both
    on the micro lattice from three exact integer sums. Uses the
    engine's two tokenizers against each other: the whitespace word
    splitter and the BPE-style pre-tokenization regex
    (q_tokenize_regex), evaluated per document inside codegen (array
    lengths only — the token arrays never explode). One scan, one
    per-lang hash agg with constant state. This is the report that
    decides per-language sampling weights in a multilingual corpus
    mix."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(dd.tokens_col("text")).cast("bigint").alias("words"),
        F.size(
            F.expr(
                "regexp_extract_all(lower(text),"
                " '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"
            )
        )
        .cast("bigint")
        .alias("subtoks"),
        F.length(F.regexp_replace("text", " ", "")).cast("bigint").alias(
            "chars"
        ),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("words").cast("bigint").alias("n_words"),
            F.sum("subtoks").cast("bigint").alias("n_subtoks"),
            F.sum("chars").cast("bigint").alias("n_chars"),
            F.expr(
                "CAST((SUM(subtoks) * 1000000) div SUM(words) AS BIGINT)"
            ).alias("fertility_micro"),
            F.expr(
                "CAST((SUM(chars) * 1000000) div SUM(subtoks) AS BIGINT)"
            ).alias("chars_per_subtok_micro"),
        )
        .orderBy("lang")
    )
