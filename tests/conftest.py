from __future__ import annotations

import math
import os

import duckdb
import pytest

from aws_vpcflowlogs_parquet_spark.session import get_spark
from aws_vpcflowlogs_parquet_spark.sources.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"

#: Exhaustive tier (r13 test-gate tiering, VERDICT r12 item 2): these
#: files gate the plans/staging.py candidates — queries that are NOT in
#: queries() and that no driver surface executes until a future build
#: round promotes them. They are ~25% of the suite's wall time (537 s
#: of 2170 measured), and the driver's verify window cannot fit the full
#: suite (r12: tests_ok false, truncated at 78% with zero failures).
#: Default run = every REGISTERED query path covered once; set
#: SPARK_GRAFT_FULL_TESTS=1 to run the staged-candidate gates too (done
#: before promoting candidates, and once per round as a committed
#: artifact — see OPTIMIZATION_r13.md).
_EXHAUSTIVE_FILES = {
    "test_staging_oracle.py",
    "test_round12_staging_witness.py",
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="staged-candidate exhaustive tier; set SPARK_GRAFT_FULL_TESTS=1"
    )
    for item in items:
        if os.path.basename(str(item.fspath)) in _EXHAUSTIVE_FILES:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def _canon_cell(v):
    """Canonical, exact representation of one value (floats bit-exact)."""
    if v is None:
        return "\0null"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0nan"
        return v.hex()
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_spark_duck(sdf, duck_con, sql: str) -> tuple[bool, str]:
    """Replicates the driver's t2 check: row count + column names + exact
    order-insensitive values. Returns (ok, message)."""
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck_con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    a = canon_rows(spark_cols, spark_rows)
    b = canon_rows(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
