"""foreachBatch incremental-dedup sink — the streaming upsert pattern.

`dropDuplicatesWithinWatermark` (streaming/windows.py) bounds its state
by the watermark: a duplicate arriving AFTER the horizon is re-admitted.
Pipelines that need *forever* dedup (ingest-once semantics over months of
backfill) instead keep the seen-key set as a TABLE and let each
micro-batch join against it — state lives in the lake, not the state
store, so it survives checkpoints, scales past executor memory, and is
queryable/compactable like any other table.

Per micro-batch (the classic Delta MERGE loop, expressed on plain
parquet):

1. collapse duplicates WITHIN the batch (row_number over an explicit
   total order — deterministic survivor);
2. anti-join the 16-byte key-hash state table (never the payload);
3. append the survivors to the output, partitioned by ``batch_id`` and
   written with dynamic partition overwrite — a retried batch REPLACES
   its own partition instead of duplicating it (idempotence under
   foreachBatch's at-least-once contract);
4. append the survivors' hashes to the state table the same way.

At 100 TB the state table is bucketed/clustered on the hash so step 2 is
a co-located join; here it is plain parquet with the identical plan
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


# Bumped whenever _key_hash's encoding changes: a state table written
# under one scheme is UNREADABLE garbage to another (every historical key
# hashes differently, so one batch of old duplicates would be silently
# re-admitted — ADVICE r4). v1 = md5(concat_ws) (round ≤3, retired);
# v2 = md5(to_json(struct)) (null-safe, round 4+).
_KEY_SCHEME = "v2-md5-to_json-struct"


def _key_hash(keys: list[str]) -> F.Column:
    """Null-safe composite-key hash. concat_ws silently SKIPS null
    elements, which would collapse ('a', NULL), (NULL, 'a') and ('a')
    into one hash — and the anti-join would then silently drop a live
    record as a duplicate (ADVICE r3). to_json(struct(...)) keeps the
    field names in the encoding, so a null in any position yields a
    distinct document from a value shifted into another position.

    Changing this encoding REQUIRES bumping ``_KEY_SCHEME``: the scheme
    marker persisted next to the state table makes a mismatched upgrade
    fail fast instead of silently re-admitting duplicates."""
    return F.md5(F.to_json(F.struct(*[F.col(k) for k in keys])))


def _state_exists(sp: SparkSession, state_dir: str) -> bool:
    """Hadoop-FS existence probe — scheme-agnostic (file://, s3a://, …),
    so 'no state yet' is decided by the filesystem, never inferred from
    a read failure."""
    jpath = sp._jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = jpath.getFileSystem(sp._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def _check_and_stamp_scheme(sp: SparkSession, state_dir: str) -> None:
    """Fail fast on a key-scheme mismatch (ADVICE r4). The marker file
    ``_key_scheme`` lives INSIDE the state dir (underscore prefix →
    invisible to parquet discovery). A state dir with a DIFFERENT marker
    aborts the stream: continuing would hash every historical key
    differently and silently re-admit one batch of old duplicates. A
    state dir with NO marker predates versioning (round ≤4); those were
    all written under the current scheme, so it is stamped in place —
    any future scheme bump then trips the check for them too."""
    jvm = sp._jvm
    marker = jvm.org.apache.hadoop.fs.Path(state_dir + "/_key_scheme")
    fs = marker.getFileSystem(sp._jsc.hadoopConfiguration())
    if fs.exists(marker):
        stream = fs.open(marker)
        try:
            found = bytes(
                stream.readAllBytes()
            ).decode("utf-8").strip()
        finally:
            stream.close()
        if found != _KEY_SCHEME:
            raise RuntimeError(
                f"incremental-dedup state at {state_dir} was written under "
                f"key scheme {found!r} but this engine uses "
                f"{_KEY_SCHEME!r}; rebuild the state table (or run the "
                f"old engine) — continuing would re-admit duplicates"
            )
        return
    out = fs.create(marker, True)
    try:
        out.write(bytearray(_KEY_SCHEME.encode("utf-8")))
    finally:
        out.close()


def start_incremental_dedup_stream(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint: str,
    keys: list[str],
    order: list[str],
):
    """Start the stream; returns the StreamingQuery. ``order`` is the
    total order picking the within-batch survivor per key."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        w = Window.partitionBy(*keys).orderBy(*order)
        collapsed = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("_kh", _key_hash(keys))
        )
        # Explicit existence probe, NOT a broad try/except around the
        # read: a transient/corrupt-read failure must ABORT the batch
        # (foreachBatch retries it) rather than masquerade as "first
        # batch, no state yet" and re-admit duplicates (ADVICE r3).
        if _state_exists(sp, state_dir):
            _check_and_stamp_scheme(sp, state_dir)
            seen = sp.read.parquet(state_dir).select("_kh")
            # no broadcast hint: the state table GROWS without bound, so
            # the join strategy must stay AQE's runtime call (broadcast
            # while small, shuffled/co-located once it isn't)
            fresh = collapsed.join(seen, "_kh", "left_anti")
        else:
            fresh = collapsed
        fresh = fresh.withColumn("batch_id", F.lit(batch_id)).persist()
        # per-write dynamic-overwrite option (NOT the session conf, which
        # would leak overwrite semantics to unrelated writers — ADVICE r3)
        (
            fresh.drop("_kh")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        (
            fresh.select("_kh", "batch_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )
        fresh.unpersist()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
