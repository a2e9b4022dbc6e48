"""Layout-management tests: clustering must measurably improve footer
min-max data skipping — the property that pays at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_vpcflowlogs_parquet_spark.operators.layout import (
    file_skip_fraction,
    optimize_layout,
    zorder_key,
)

from .conftest import SF_DIR


def _pts(spark):
    # multiplicative spread so both coordinates cover the full 8-bit
    # space (raw user_id spans only 0..14 at sf0.001)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return ev.select(
        ((F.col("event_id") * 37) % 256).alias("x"),
        ((F.col("event_id") * 101 + 7) % 256).alias("y"),
        "event_id",
    )


def test_range_clustering_enables_skipping(spark, tmp_path):
    pts = _pts(spark)
    base, opt = str(tmp_path / "base"), str(tmp_path / "opt")
    # baseline: hash-scattered layout (every file spans the full x range)
    pts.repartition(8).write.parquet(base)
    optimize_layout(pts, opt, cluster_by=["x"], n_files=8)
    q = (10, 20)  # narrow x range
    assert file_skip_fraction(base, "x", *q) == 0.0
    # ~1/8 of the value space → ideally 7/8 skipped; sampled range
    # boundaries on a 256-value key can straddle one extra file
    assert file_skip_fraction(opt, "x", *q) >= 0.6


def test_zorder_improves_skipping_on_both_columns(spark, tmp_path):
    pts = _pts(spark)
    base, opt = str(tmp_path / "base"), str(tmp_path / "opt")
    pts.repartition(16).write.parquet(base)
    optimize_layout(pts, opt, cluster_by=["x", "y"], n_files=16, bits=8)
    # a box predicate must prune on EITHER clustered column — the whole
    # point of the curve vs. single-column sort (which helps only x)
    for col in ("x", "y"):
        assert file_skip_fraction(base, col, 0, 31) == 0.0
        assert file_skip_fraction(opt, col, 0, 31) >= 0.5, col


def test_zorder_write_is_single_shuffle_and_schema_stable(spark, tmp_path):
    pts = _pts(spark)
    out = str(tmp_path / "z")
    optimize_layout(pts, out, cluster_by=["x", "y"], n_files=4, bits=8)
    back = spark.read.parquet(out)
    assert back.columns == pts.columns  # helper key projected away
    assert back.count() == pts.count()
    # the rewrite plan: exactly one exchange (the range repartition); the
    # sort rides it
    plan = (
        pts.withColumn("_ck", zorder_key(["x", "y"], 8))
        .repartitionByRange(4, "_ck")
        .sortWithinPartitions("_ck")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_compact_merges_small_files(spark, tmp_path):
    from aws_vpcflowlogs_parquet_spark.operators.layout import compact

    pts = _pts(spark)
    path = str(tmp_path / "frag")
    pts.repartition(32).write.parquet(path)  # fragmented sink output
    before = spark.read.parquet(path)
    n_rows, checksum = before.count(), before.agg(F.sum("event_id")).collect()[0][0]
    stats = compact(spark, path, target_bytes=10 * 1024 * 1024)
    assert stats["files_before"] == 32
    assert stats["files_after"] <= 2
    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert after.agg(F.sum("event_id")).collect()[0][0] == checksum


def test_zorder_key_never_touches_sign_bit(spark):
    # 4 columns at the default 16 bits/dim would land a bit at position
    # 63 (bigint sign): the clamp (bits = 63 // n_cols) must keep every
    # key non-negative so range-partitioning preserves Morton order
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    four = ev.select(
        *[((F.col("event_id") * m) % 65536).alias(c)
          for c, m in (("a", 37), ("b", 101), ("c", 13), ("d", 7))]
    )
    mn = four.select(
        F.min(zorder_key(["a", "b", "c", "d"])).alias("mn")
    ).collect()[0]["mn"]
    assert mn >= 0


def test_zorder_clamp_keeps_curve_locality(spark):
    # with the clamp, two points differing only in high coordinates must
    # still produce distinct ordered keys within the representable domain
    df = spark.createDataFrame(
        [(1, 1, 1, 1), (2, 2, 2, 2)], "a int, b int, c int, d int"
    )
    keys = [
        r["k"]
        for r in df.select(
            zorder_key(["a", "b", "c", "d"]).alias("k")
        ).orderBy("k").collect()
    ]
    assert keys[0] < keys[1]


def test_compact_recovers_from_interrupted_swap(spark, tmp_path):
    """Crash window between the two swap renames: path gone, __old_*
    stranded. A subsequent compact() must restore the snapshot, sweep
    temps, and complete normally (ADVICE r3)."""
    import os

    from aws_vpcflowlogs_parquet_spark.operators.layout import compact

    pts = _pts(spark)
    path = str(tmp_path / "t")
    pts.repartition(8).write.parquet(path)
    n_rows = spark.read.parquet(path).count()
    # simulate the crash: first rename done, second never happened, plus
    # a stale temp dir from the dead run
    os.rename(path, f"{path}__old_deadbeef")
    os.makedirs(f"{path}__compact_deadbeef")
    stats = compact(spark, path, target_bytes=10 * 1024 * 1024)
    assert stats["files_before"] == 8
    assert spark.read.parquet(path).count() == n_rows
    import glob

    assert glob.glob(f"{path}__*") == []  # no strays left behind


def test_compact_preserves_clustering(spark, tmp_path):
    from aws_vpcflowlogs_parquet_spark.operators.layout import compact

    pts = _pts(spark)
    path = str(tmp_path / "clustered")
    optimize_layout(pts, path, cluster_by=["x"], n_files=16)
    assert file_skip_fraction(path, "x", 10, 20) > 0.5
    compact(spark, path, target_bytes=20 * 1024, preserve_sort="x")
    # the rewrite must keep the layout's skipping property (fewer, larger
    # files → each covers a wider range, so the bar is lower than above)
    assert file_skip_fraction(path, "x", 10, 20) >= 0.5


def test_compact_rejects_concurrent_run_and_breaks_stale_lock(spark, tmp_path):
    """ADVICE r4: the startup sweep deletes __compact_*/__old_* siblings,
    which under a concurrent compactor would be the other run's live
    state — so compact() must be single-writer. A fresh lock file makes
    a second invocation fail fast; a stale lock (crashed run) is broken
    and the compaction proceeds."""
    import os
    import time

    import pytest as _pytest

    from aws_vpcflowlogs_parquet_spark.operators.layout import compact

    pts = _pts(spark)
    path = str(tmp_path / "locked")
    pts.repartition(4).write.parquet(path)

    lock = f"{path}__compact_lock"
    with open(lock, "w") as f:
        f.write("12345")
    with _pytest.raises(RuntimeError, match="already running"):
        compact(spark, path, target_bytes=10 * 1024 * 1024)
    assert os.path.exists(lock)  # a held lock is NOT cleaned up by the loser

    # age the lock past the staleness threshold → broken and taken over
    old = time.time() - 25 * 3600
    os.utime(lock, (old, old))
    stats = compact(spark, path, target_bytes=10 * 1024 * 1024)
    assert stats["files_before"] == 4
    assert not os.path.exists(lock)  # released after a successful run


def test_compact_stale_lock_takeover_is_atomic(spark, tmp_path):
    """ADVICE r5 (+ r6 hardening): breaking a stale lock must be a
    one-winner operation. The serialization point is an O_EXCL
    ``.breaking`` claim file — only the claim holder may remove the
    stale lock (rename-by-path had a TOCTOU hole: a descheduled breaker
    could rename a competitor's FRESH lock aside). A fresh claim makes
    a racing breaker fail fast; a STALE claim (crashed breaker) is
    never auto-swept — remove-by-path of the shared claim path cannot
    be made one-winner (ADVICE r6) — so it demands one manual rm, and
    the takeover proceeds after that cleanup."""
    import os
    import time

    import pytest as _pytest

    from aws_vpcflowlogs_parquet_spark.operators.layout import compact

    pts = _pts(spark)
    path = str(tmp_path / "atomic")
    pts.repartition(4).write.parquet(path)
    lock = f"{path}__compact_lock"
    claim = f"{lock}.breaking"

    # a crashed breaker's stale claim + a stale lock: fail fast with
    # the manual-cleanup instruction, touching NEITHER file
    old = time.time() - 25 * 3600
    with open(lock, "w") as f:
        f.write("999")
    os.utime(lock, (old, old))
    with open(claim, "w") as f:
        f.write("998")
    os.utime(claim, (old, old))
    with _pytest.raises(RuntimeError, match="remove the claim file"):
        compact(spark, path, target_bytes=10 * 1024 * 1024)
    assert os.path.exists(lock) and os.path.exists(claim)

    # after the manual rm the error demanded, the takeover proceeds
    os.remove(claim)
    stats = compact(spark, path, target_bytes=10 * 1024 * 1024)
    assert stats["files_before"] == 4
    assert not os.path.exists(lock)
    assert not os.path.exists(claim)

    # an ACTIVE breaker (fresh claim + stale lock): the racer must fail
    # fast and leave both files for the claim holder
    with open(lock, "w") as f:
        f.write("999")
    os.utime(lock, (old, old))
    with open(claim, "w") as f:
        f.write("winner")
    with _pytest.raises(RuntimeError, match="takeover already in progress"):
        compact(spark, path, target_bytes=10 * 1024 * 1024)
    assert os.path.exists(lock) and os.path.exists(claim)
    os.remove(claim)
    os.remove(lock)

    # the loser path: a FRESH lock (what a losing breaker observes after
    # the winner re-creates) fails fast and leaves the winner's lock
    with open(lock, "w") as f:
        f.write("win")
    with _pytest.raises(RuntimeError, match="already running"):
        compact(spark, path, target_bytes=10 * 1024 * 1024)
    assert os.path.exists(lock)
    os.remove(lock)
