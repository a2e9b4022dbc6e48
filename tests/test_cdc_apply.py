"""Streaming CDC apply: versioned snapshots must evolve correctly under
insert/update/delete change batches, survive restarts, and keep older
versions readable (time travel)."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from aws_vpcflowlogs_parquet_spark.streaming.cdc_apply import (
    apply_changes,
    current_version,
    read_snapshot,
    start_cdc_apply_stream,
)

from .conftest import SF_DIR


def _changes(spark, rows):
    return spark.createDataFrame(rows, "op string, k bigint, val string, ts bigint")


def test_apply_changes_kernel(spark):
    c1 = _changes(spark, [("I", 1, "a", 1), ("I", 2, "b", 1)])
    s1 = apply_changes(None, c1, ["k"], ["ts"])
    assert sorted((r.k, r.val) for r in s1.collect()) == [(1, "a"), (2, "b")]
    # update 1, delete 2, insert 3; a late duplicate for k=1 loses to the
    # later ts deterministically
    c2 = _changes(
        spark,
        [("U", 1, "a2", 3), ("U", 1, "aX", 2), ("D", 2, None, 2), ("I", 3, "c", 2)],
    )
    s2 = apply_changes(s1, c2, ["k"], ["ts"])
    assert sorted((r.k, r.val) for r in s2.collect()) == [(1, "a2"), (3, "c")]


def test_cdc_stream_versions_and_time_travel(spark, tmp_path):
    src = tmp_path / "cdc_src"
    src.mkdir()
    base = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "snap").mkdir()

    # derive a deterministic change feed from the events table: first
    # half inserts, second half updates/deletes on the same keys
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200)
    ins = ev.select(
        F.lit("I").alias("op"), (F.col("event_id") % 50).alias("k"),
        F.col("event_type").alias("val"), F.col("event_id").alias("ts"),
    )
    upd = ev.select(
        F.when(F.col("event_id") % 10 == 0, "D").otherwise("U").alias("op"),
        (F.col("event_id") % 50).alias("k"),
        F.concat(F.lit("v2_"), F.col("event_type")).alias("val"),
        (F.col("event_id") + 100000).alias("ts"),
    )

    def stage(df, name):
        tmp = str(tmp_path / f"_c_{name}")
        df.coalesce(1).write.parquet(tmp)
        shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], str(src / name))

    stage(ins, "events.parquet")  # schema probe name

    def run():
        stream = (
            spark.readStream.schema(ins.schema).parquet(str(src))
        )
        q = start_cdc_apply_stream(spark, stream, base, ckpt, ["k"], ["ts"])
        q.awaitTermination()

    run()
    assert current_version(base) == 1
    v1 = read_snapshot(spark, base)
    assert v1.select("k").distinct().count() == 50

    stage(upd, "changes2.parquet")
    run()
    assert current_version(base) == 2
    v2 = read_snapshot(spark, base)
    # batch-equivalent result: apply both change sets over nothing
    expected = apply_changes(None, ins.unionByName(upd), ["k"], ["ts"])
    assert v2.count() == expected.count()
    assert v2.exceptAll(expected).count() == 0
    # deletes happened and updates took effect
    assert v2.filter(F.col("val").startswith("v2_")).count() == v2.count()
    # time travel: version 1 still reads intact
    assert read_snapshot(spark, base, 1).select("k").distinct().count() == 50
