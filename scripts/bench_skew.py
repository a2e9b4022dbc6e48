"""Skew-join strategy measurement: quantify what AQE skew-join splitting
and explicit salting buy on a pathologically hot key.

Builds a fact table where ~90% of rows share ONE join key (the shape that
strands a 1000-executor cluster behind a single straggler task) and joins
it to a 1k-row dim three ways:

  smj_no_aqe   one sort-merge partition owns 90% of the data (baseline)
  smj_aqe      AQE splits the oversized partition at runtime
  salted       explicit 16-way salt (operators/joins.py pattern):
               fact key -> (key, salt), dim replicated 16x

Prints one JSON line with wall seconds per strategy. Local results are
directional (32 threads share one box; the straggler effect is bounded by
core count, not cluster size) — the plan shapes are what carry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_vpcflowlogs_parquet_spark.session import get_spark

N_FACT = 4_000_000
N_DIM = 1_000
SALT = 16


def main() -> None:
    spark = get_spark("bench_skew")
    fact = (
        spark.range(N_FACT)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % N_DIM)
            .alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .persist()
    )
    dim = (
        spark.range(N_DIM)
        .select(F.col("id").alias("k"), (F.col("id") * 7).alias("w"))
        .persist()
    )
    fact.count(), dim.count()

    def run(tag: str, df) -> float:
        t0 = time.time()
        df.groupBy().agg(F.sum(F.col("v") + F.col("w"))).collect()
        return round(time.time() - t0, 3)

    results = {}
    # force SMJ (no broadcast) so the skewed shuffle is the bottleneck
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    results["smj_no_aqe"] = run("smj_no_aqe", fact.join(dim.hint("merge"), "k"))

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    results["smj_aqe"] = run("smj_aqe", fact.join(dim.hint("merge"), "k"))

    salted_fact = fact.withColumn("s", F.pmod(F.col("v"), F.lit(SALT)))
    salted_dim = dim.crossJoin(
        spark.range(SALT).select(F.col("id").cast("int").alias("s"))
    )
    results["salted"] = run(
        "salted", salted_fact.join(salted_dim.hint("merge"), ["k", "s"])
    )

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    print(json.dumps({"n_fact": N_FACT, "hot_share": 0.9, **results}))


if __name__ == "__main__":
    main()
