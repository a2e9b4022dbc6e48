"""Property depth for the round-3 operator families (VERDICT r3 item 5):

- recursive-CTE clamped balance: the Spark recursion must equal a plain
  Python fold of the non-associative recurrence for ARBITRARY delta
  sequences, and must stop exactly at the depth bound;
- PQ encoding: nested codebooks give monotonically non-increasing
  reconstruction error, and every assignment is a true argmin;
- KMV sketches: merging two k-min sketches is EXACT — identical to
  sketching the union directly — and the union estimate sits inside the
  theoretical KMV error bound.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from .conftest import SF_DIR

# ------------------------------------------------------- clamped balance

# mirror of plans/catalog.py::_CLAMPED_BALANCE with a parametric depth,
# driven over a tiny synthetic view (one account) so hypothesis controls
# the delta sequence directly
_RECURSIVE_TPL = """
    WITH RECURSIVE deltas AS (
      SELECT account, rn, d FROM prop_deltas WHERE rn <= {depth}
    ),
    bal(account, rn, b, n_clamps) AS (
      SELECT DISTINCT account, 0, CAST(0 AS BIGINT), 0 FROM deltas
      UNION ALL
      SELECT d.account, r.rn + 1,
             GREATEST(CAST(0 AS BIGINT), r.b + d.d),
             r.n_clamps + CASE WHEN r.b + d.d < 0 THEN 1 ELSE 0 END
      FROM bal r JOIN deltas d ON d.account = r.account AND d.rn = r.rn + 1
      WHERE r.rn < {depth}
    )
    SELECT account, rn, b, n_clamps FROM bal
"""


def _py_clamped_fold(deltas: list[int]) -> tuple[int, int]:
    b, clamps = 0, 0
    for d in deltas:
        if b + d < 0:
            clamps += 1
        b = max(0, b + d)
    return b, clamps


@given(
    deltas=st.lists(st.integers(-1000, 1000), min_size=1, max_size=8),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_recursive_clamped_balance_matches_fold(spark, deltas):
    depth = len(deltas)
    rows = [(0, i + 1, d) for i, d in enumerate(deltas)]
    spark.createDataFrame(
        rows, "account int, rn int, d bigint"
    ).createOrReplaceTempView("prop_deltas")
    out = spark.sql(_RECURSIVE_TPL.format(depth=depth)).collect()
    # depth bound: exactly depth+1 rows (anchor rn=0 .. final rn=depth),
    # i.e. the recursion terminated at the WHERE bound, no runaway
    assert sorted(r.rn for r in out) == list(range(depth + 1))
    final = next(r for r in out if r.rn == depth)
    want_b, want_clamps = _py_clamped_fold(deltas)
    assert (final.b, final.n_clamps) == (want_b, want_clamps)


def test_recursive_depth_bound_excludes_deeper_rows(spark):
    # rows beyond the depth bound must not influence the result
    rows = [(0, i + 1, 100) for i in range(12)]  # 12 deltas staged
    spark.createDataFrame(
        rows, "account int, rn int, d bigint"
    ).createOrReplaceTempView("prop_deltas")
    out = spark.sql(_RECURSIVE_TPL.format(depth=5)).collect()
    assert max(r.rn for r in out) == 5
    assert next(r for r in out if r.rn == 5).b == 500  # 5 steps, not 12


# ----------------------------------------------------------- PQ encoding

_PQ_SUB = 16
_PQ_BLOCKS = 4


def _pq_total_err(spark, n_codes: int) -> float:
    """Re-express q_pq_encode's assign pipeline with a parametric
    codebook size (codes = first n_codes vectors — nested by
    construction) and return the total reconstruction error."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    blocks = emb.crossJoin(
        F.broadcast(
            emb.sparkSession.range(_PQ_BLOCKS).select(
                F.col("id").cast("int").alias("blk")
            )
        )
    ).select(
        "vec_id", "blk",
        F.expr(f"slice(e, blk * {_PQ_SUB} + 1, {_PQ_SUB})").alias("sv"),
    )
    codebook = blocks.filter(F.col("vec_id") < n_codes).select(
        "blk", F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )
    d = F.expr(
        "aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (p, v) -> p + v)"
    )
    per_vec = (
        blocks.join(F.broadcast(codebook), "blk")
        .select("vec_id", "blk", d.alias("d"))
        .groupBy("vec_id", "blk")
        .agg(F.min("d").alias("dmin"))
    )
    return per_vec.agg(F.sum("dmin")).collect()[0][0]


def test_pq_reconstruction_error_monotone_in_codebook_size(spark):
    # codebooks are NESTED (first n vectors), so the per-(vector, block)
    # min over a superset can never exceed the min over the subset —
    # total reconstruction error must be non-increasing in codebook size
    errs = [_pq_total_err(spark, k) for k in (1, 2, 4, 8)]
    assert all(a >= b - 1e-9 for a, b in zip(errs, errs[1:])), errs
    # and strictly positive: quantization is lossy on real data
    assert errs[-1] > 0


def test_pq_assignment_is_argmin(spark):
    # every assigned code's distance equals the row-wise minimum over
    # ALL codebook entries for that (vector, block) — the invariant that
    # makes ADC search admissible against the codes table
    from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES

    enc = QUERIES["q_pq_encode"](spark, SF_DIR)
    # reconstruct per-(vec, blk) assigned-vs-min distance independently
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    blocks = emb.crossJoin(
        F.broadcast(
            emb.sparkSession.range(_PQ_BLOCKS).select(
                F.col("id").cast("int").alias("blk")
            )
        )
    ).select(
        "vec_id", "blk",
        F.expr(f"slice(e, blk * {_PQ_SUB} + 1, {_PQ_SUB})").alias("sv"),
    )
    codebook = blocks.filter(F.col("vec_id") < 4).select(
        "blk", F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )
    d = F.expr(
        "aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (p, v) -> p + v)"
    )
    dists = blocks.join(F.broadcast(codebook), "blk").select(
        "vec_id", "blk", "code", d.alias("d")
    )
    assigned = dists.groupBy("vec_id", "blk").agg(
        F.min_by("code", F.struct("d", "code")).alias("code"),
        F.min("d").alias("dmin"),
    )
    chosen = dists.join(assigned, ["vec_id", "blk", "code"])
    bad = chosen.filter(F.col("d") > F.col("dmin") + 1e-12).count()
    assert bad == 0
    # the catalog query's per-(blk, code) populations cover every vector
    n_vec = emb.count()
    pops = enc.agg(F.sum("n_vectors")).collect()[0][0]
    assert pops == n_vec * _PQ_BLOCKS


# ----------------------------------------------------------- KMV merges


def _kmv(spark, df, col: str, k: int = 64):
    h = df.select(
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("h")
    ).distinct()
    return h.orderBy("h").limit(k)


def test_kmv_merge_equals_direct_union_sketch(spark):
    # THE mergeability property: k smallest of (sketch(A) ∪ sketch(B))
    # == k smallest of A ∪ B, exactly — no approximation in the merge
    # step itself (the approximation is only in the cardinality formula)
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    a = o.filter("o_orderstatus = 'O'").select("o_custkey")
    b = o.filter("o_orderstatus = 'F'").select("o_custkey")
    merged = (
        _kmv(spark, a, "o_custkey")
        .unionByName(_kmv(spark, b, "o_custkey"))
        .distinct()
        .orderBy("h")
        .limit(64)
    )
    direct = _kmv(spark, a.unionByName(b), "o_custkey")
    got = [r.h for r in merged.collect()]
    want = [r.h for r in direct.collect()]
    assert got == want


def test_kmv_union_estimate_within_bound(spark):
    # KMV with k=64: relative standard error ~ 1/sqrt(k-2) ≈ 12.7 %.
    # Assert the union estimate from the catalog query lands within
    # 4 sigma of the exact union cardinality.
    from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES

    row = QUERIES["q_kmv_intersection"](spark, SF_DIR).collect()[0]
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact_union = (
        o.filter("o_orderstatus IN ('O', 'F')")
        .select("o_custkey")
        .distinct()
        .count()
    )
    if row.n_union_sketch < 64:
        assert row.est_union == exact_union  # sub-k sketch is exact
    else:
        rse = 1.0 / (62.0 ** 0.5)
        assert abs(row.est_union - exact_union) <= 4 * rse * exact_union
    # intersection estimate bounded by the union estimate, and the
    # Jaccard estimate is a proper fraction
    assert 0.0 <= row.est_jaccard <= 1.0
    assert row.est_intersection <= row.est_union + 1e-9


# ------------------------------------------- driver-session state probe


def test_filter_gate_stable_across_session_activity(spark, duck):
    """CORRECTNESS_r03 hash-FAIL forensics (VERDICT r3 item 3): the
    failure never reproduced in isolation, so pin the session-state
    angle — q_filter_gate must hash-match its oracle TWICE in one
    session, the second time after a streaming query has run (altered
    shuffle-partition conf, registered state stores, temp views)."""
    from aws_vpcflowlogs_parquet_spark.plans.catalog import ORACLES, QUERIES

    from .conftest import SF_DIR, compare_spark_duck

    ok, msg = compare_spark_duck(
        QUERIES["q_filter_gate"](spark, SF_DIR), duck, ORACLES["q_filter_gate"]
    )
    assert ok, msg
    # run a streaming query in between (conf churn + state store usage)
    QUERIES["q_stream_time_bucket"](spark, SF_DIR).count()
    ok, msg = compare_spark_duck(
        QUERIES["q_filter_gate"](spark, SF_DIR), duck, ORACLES["q_filter_gate"]
    )
    assert ok, msg
