#!/usr/bin/env python
"""Benchmark harness: run the full query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion through the noop sink (full compute,
no driver-side row transfer — the fair analogue of a cluster write).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The driver parses ONE JSON line from stdout. Spark logs go to stderr,
# but the JVM gateway / Python workers can still emit stray stdout lines
# (warnings, accumulator chatter). Guarantee a clean channel: save the
# real stdout fd, then point fd 1 at stderr for the whole run — the JSON
# line is written to the saved fd at the end, and is the ONLY stdout.
_REAL_STDOUT_FD = os.dup(1)
os.dup2(2, 1)
sys.stdout = sys.stderr

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES  # noqa: E402
from aws_vpcflowlogs_parquet_spark.session import get_spark  # noqa: E402


def _emit(payload: dict) -> None:
    line = json.dumps(payload) + "\n"
    os.write(_REAL_STDOUT_FD, line.encode("utf-8"))


def _versions(spark) -> dict:
    import platform

    import duckdb
    import pyarrow

    return {
        "spark": spark.version,
        "duckdb": duckdb.__version__,
        "pyarrow": pyarrow.__version__,
        "python": platform.python_version(),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warm the JVM/codegen once on the flagship before timing
    QUERIES["q_agg_sum_group"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warm the Python worker pool so the first pandas-UDF query doesn't
    # pay one-time worker startup (the pool is reused across queries)
    from pyspark.sql import functions as F  # noqa: E402

    spark.range(32).withColumn("g", F.col("id") % 4).groupBy("g").applyInPandas(
        lambda pdf: pdf.head(1), schema="id long, g long"
    ).write.format("noop").mode("overwrite").save()

    # Steady-state timing, denoised (r10 VERDICT item 3: the sub-2 s
    # tail swung up to ~2× between single runs — scheduler noise, not
    # regression signal). Every query runs twice (the first execution
    # pays one-time JIT/codegen a long-lived cluster amortizes away);
    # queries in the noise-prone short tail get a THIRD run and report
    # the median of 3, heavy queries (≥ 2 s, where scheduler jitter is
    # proportionally small) keep the prior best-of-2 so total bench
    # wall stays bounded. SPARK_GRAFT_BENCH_RUNS=n forces median-of-n
    # for every query (quiet-host artifact runs).
    forced = os.environ.get("SPARK_GRAFT_BENCH_RUNS")
    timings: dict[str, float] = {}
    for name in sorted(QUERIES):

        def _one_run() -> float:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            # queries are self-contained: drop any blocks an operator
            # persisted (minhash/ngram/cluster staging) so later timings
            # aren't polluted by another query's cache pressure —
            # measured 2.2× on the total
            spark.catalog.clearCache()
            return dt

        samples = [_one_run(), _one_run()]
        want = int(forced) if forced else (3 if min(samples) < 2.0 else 2)
        while len(samples) < want:
            samples.append(_one_run())
        samples.sort()
        # odd n → true median; even n → best (min of 2 is the prior
        # rounds' steady-state convention for the stable heavy tail)
        timings[name] = round(
            samples[len(samples) // 2] if len(samples) % 2 else samples[0], 3
        )

    total = round(sum(timings.values()), 3)
    # The driver's stdout capture truncated the round-2 line once it
    # carried 125 inline timings (~4 KB; BENCH_r02.json "parsed": null).
    # Keep stdout to ONE compact line and sidecar the per-query map.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w", encoding="utf-8") as fh:
        json.dump(
            {"sf": float(sf), "total_sec": total, "queries": timings},
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    # headline subset keeps the {"queries": {name: sec}} contract shape
    # while the stdout line stays well under 1 KB
    headline = [
        "q_agg_sum_group", "q_topk", "q_join_multiway", "q_window_rank",
        "q_dedup_minhash", "q_ann_ivf", "q_tfidf", "q_flowlog_parse",
    ]
    _emit(
        {
            "metric": "catalog_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": {k: timings[k] for k in headline if k in timings},
            "sf": float(sf),
            "n_queries": len(timings),
            "detail": detail_path,
            # engine versions, so cross-environment hash/timing skews are
            # diagnosable from the artifact alone (VERDICT r3 item 7)
            "versions": _versions(spark),
        }
    )


if __name__ == "__main__":
    main()
