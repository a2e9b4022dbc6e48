"""Join strategy helpers for the 100 TB posture.

The reference has no joins at all (single-table model, SURVEY §2.2); the
analytic surface it enables leans entirely on the engine's join execution.
Catalyst + AQE already pick broadcast/sort-merge/shuffled-hash and split
skewed partitions (spark.sql.adaptive.skewJoin); these helpers cover the
two cases that still need explicit plan shaping at scale:

- **salted join** — when ONE key is so hot that even AQE's skew split
  leaves a straggler (AQE splits partitions, not keys, so a single key
  hotter than a partition still serializes). Salting fans the hot build
  rows out across N sub-keys at the cost of replicating the probe side N×.
- **bucketed co-located join** — pre-shuffling both fact tables into the
  same bucket layout at write time removes the per-query shuffle entirely;
  the repeated-join workload's amortized win (verified shuffle-free in
  tests/test_join_strategies.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting to break a skewed build key.

    The skewed (probe) side gets a deterministic salt in [0, salts) hashed
    from the whole row; the small (build) side is replicated across every
    salt value. Join keys become (on…, _salt), so rows of one hot key
    spread over ``salts`` shuffle partitions. Result set is identical to
    ``skewed.join(small, on, how)`` — only the partitioning changes.

    Use when a single key exceeds one executor's partition budget; AQE's
    skew-join split cannot subdivide a single key, salting can.
    """
    salt = F.pmod(F.hash(F.struct(*[F.col(c) for c in skewed.columns])), F.lit(salts))
    skewed_s = skewed.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return skewed_s.join(small_s, [*on, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table pre-shuffled into a fixed bucket layout.

    Two tables bucketed on the same keys with the same bucket count join
    with ZERO exchange (and zero sort, if also sorted) — the write-time
    shuffle is paid once instead of per query. This is the Spark-native
    analogue of the reference's partition-key fan-out (convert.go:57-67)
    applied to join keys instead of output paths.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a warehouse dir left by a previous *process* is an orphan to this
    # session's in-memory catalog, and saveAsTable refuses the location
    # (LOCATION_ALREADY_EXISTS); clear it for local filesystems
    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    if wh.scheme in ("", "file"):
        shutil.rmtree(os.path.join(wh.path, table.lower()), ignore_errors=True)

    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def ensure_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> str:
    """Idempotent :func:`write_bucketed`: write once per session, reuse after.

    Bucketing's whole point is paying the layout shuffle ONCE for a
    repeated-join workload — a query that re-writes its bucket tables on
    every invocation (round-2 ``q_join_bucketed``) times the write, not
    the join, and churns the warehouse. The bucketed table is an
    immutable function of (input data, layout), so an existing table
    with this name is reused; a fresh session (fresh in-memory catalog)
    rewrites it. Callers key ``table`` by the input (e.g. a hash of the
    source directory) so different datasets never alias. Returns the
    table name for chaining.
    """
    if not df.sparkSession.catalog.tableExists(table):
        write_bucketed(df, table, bucket_cols, n_buckets, sort_cols)
    return table
