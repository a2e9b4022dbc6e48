"""Round-8 engine-surface mechanisms, pinned at the PLAN/contract level:
CBO statistics driving size estimates and a join-strategy flip, the
streaming checkpoint restart/upgrade contract (compatible downstream
change runs; state-schema change fails CLEANLY), and shared-scan
multi-aggregate execution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR


# ------------------------------------------------------------- CBO

def test_analyze_statistics_drive_estimates_and_join_choice(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS r8_cbo_orders")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").write.mode(
        "overwrite"
    ).saveAsTable("r8_cbo_orders")
    prior_cbo = spark.conf.get("spark.sql.cbo.enabled")
    prior_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        def filtered():
            return spark.table("r8_cbo_orders").filter("o_custkey <= 5")

        def est(df):
            st = df._jdf.queryExecution().optimizedPlan().stats()
            rc = st.rowCount()
            return int(st.sizeInBytes()), (
                int(str(rc.get())) if rc.isDefined() else None
            )

        pre_size, pre_rows = est(filtered())
        assert pre_rows is None  # no stats: row count unknown...
        full_size, _ = est(spark.table("r8_cbo_orders"))
        assert pre_size == full_size  # ...and the filter shrinks NOTHING

        spark.sql(
            "ANALYZE TABLE r8_cbo_orders COMPUTE STATISTICS "
            "FOR COLUMNS o_custkey"
        )
        post_size, post_rows = est(filtered())
        post_full_size, post_full_rows = est(spark.table("r8_cbo_orders"))
        n = spark.table("r8_cbo_orders").count()
        exact = filtered().count()
        assert post_full_rows == n  # the catalog row count is now EXACT
        assert post_rows is not None and 0 < post_rows <= n
        # column stats make the filter selective in the ESTIMATE
        # (compare within the post-stats sizing model: stats-based row
        # widths differ from the file-size model pre-ANALYZE), close to
        # the true ~5/|custkeys| selectivity — this is what flips
        # downstream join strategies
        assert post_size < post_full_size / 4
        assert post_rows <= 4 * max(exact, 1)

        # the join flip itself: filtered ⋈ full self-join; threshold sits
        # between the post-stats filtered estimate and everything else
        thresh = max(post_size * 2, 1024)
        assert thresh < min(full_size, post_full_size)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thresh))
        join = filtered().alias("l").join(
            spark.table("r8_cbo_orders").alias("r"),
            F.col("l.o_orderkey") == F.col("r.o_orderkey"),
        )
        plan_post = join._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_post, plan_post

        # rebuild WITHOUT stats: same threshold, no broadcast — the
        # strategy change is attributable to ANALYZE alone
        spark.sql("DROP TABLE IF EXISTS r8_cbo_orders2")
        spark.read.parquet(f"{SF_DIR}/orders.parquet").write.mode(
            "overwrite"
        ).saveAsTable("r8_cbo_orders2")
        j2 = (
            spark.table("r8_cbo_orders2")
            .filter("o_custkey <= 5")
            .alias("l")
            .join(
                spark.table("r8_cbo_orders2").alias("r"),
                F.col("l.o_orderkey") == F.col("r.o_orderkey"),
            )
        )
        plan_pre = j2._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_pre, plan_pre
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prior_cbo)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior_thresh)
        spark.sql("DROP TABLE IF EXISTS r8_cbo_orders")
        spark.sql("DROP TABLE IF EXISTS r8_cbo_orders2")


# ------------------------------------- checkpoint restart / upgrade

def _write_batch_file(spark, path, lo, hi):
    spark.range(lo, hi).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    ).coalesce(1).write.mode("append").parquet(path)


def test_checkpoint_restart_upgrade_contract(spark, tmp_path):
    """A restarted stream may change everything DOWNSTREAM of its
    stateful operator (projection, sink prep) and keep running from the
    same checkpoint; changing the STATE schema (count-only → count+sum
    aggregation) must fail loudly with the state-schema error, never
    silently corrupt or reset state."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch_file(spark, src, 0, 100)
    stream = spark.readStream.schema("k long, v long").parquet(src)

    def run(agg_df):
        q = (
            agg_df.writeStream.foreachBatch(
                lambda b, _eid: b.write.mode("overwrite").parquet(out)
            )
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    v1 = stream.groupBy("k").agg(F.count("*").alias("n"))
    run(v1)
    first = {r.k: r.n for r in spark.read.parquet(out).collect()}
    assert sum(first.values()) == 100

    # compatible upgrade: same state (count), new downstream projection
    _write_batch_file(spark, src, 100, 150)
    v1b = stream.groupBy("k").agg(F.count("*").alias("n")).withColumn(
        "n_doubled", F.col("n") * 2
    )
    run(v1b)
    second = {r.k: (r.n, r.n_doubled) for r in spark.read.parquet(out).collect()}
    assert sum(n for n, _ in second.values()) == 150  # state carried
    assert all(d == 2 * n for n, d in second.values())

    # incompatible upgrade: state schema gains a sum column (new data
    # staged first — a restart with no pending files never plans a
    # batch, so the state schema would not even be consulted)
    _write_batch_file(spark, src, 150, 160)
    v2 = stream.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    with pytest.raises(Exception, match="(?i)schema"):
        run(v2)


# ----------------------------------------------- shared-scan multi-query

def test_shared_scan_multi_aggregate_equivalence(spark):
    """N independent aggregate queries over one fact table vs ONE pass
    computing all of them (the multi-query / shared-scan execution
    pattern): identical results, and the shared form's physical plan
    touches the scan once."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")

    independent = (
        ev.agg(F.count("*")).collect()[0][0],
        ev.agg(F.sum(cents)).collect()[0][0],
        ev.agg(F.countDistinct("user_id")).collect()[0][0],
        ev.agg(F.max("event_id")).collect()[0][0],
    )
    shared_df = ev.agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s"),
        F.countDistinct("user_id").alias("u"),
        F.max("event_id").alias("m"),
    )
    shared = tuple(shared_df.collect()[0])
    assert shared == independent
    # plan inspected pre-execution: a post-AQE executed plan prints
    # materialized query stages instead of the scan node
    fresh = ev.agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s"),
        F.countDistinct("user_id").alias("u"),
        F.max("event_id").alias("m"),
    )
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan
