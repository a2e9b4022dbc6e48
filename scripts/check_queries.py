"""Ad-hoc single-query oracle check (same comparison as the test suite /
driver) for fast iteration while authoring catalog entries.

Usage: python scripts/check_queries.py q_entropy q_markov_transitions ...
       python scripts/check_queries.py --sf /root/testdata/sf0.01 q_entropy
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from aws_vpcflowlogs_parquet_spark.plans.catalog import ORACLES, QUERIES
from aws_vpcflowlogs_parquet_spark.session import get_spark
from aws_vpcflowlogs_parquet_spark.sources.tables import TABLE_NAMES
from tests.conftest import compare_spark_duck


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args or sorted(QUERIES)
    spark = get_spark("check")
    duck = duckdb.connect()
    for name in TABLE_NAMES:
        duck.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    rc = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            ok, msg = compare_spark_duck(sdf, duck, ORACLES[name])
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'} {name} ({time.time() - t0:.1f}s)"
              + ("" if ok else f" — {msg[:500]}"))
        rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
