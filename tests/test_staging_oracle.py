"""Staging gate: every staged query passes the SAME oracle replica the
catalog queries do, at sf0.001 — so promotion is a move, not a build.
Round-5 status: the staging area is EMPTY (the 24 round-4-staged queries
were promoted to plans/catalog.py and are covered by
test_queries_oracle.py); the gate stays armed for future staging."""

from __future__ import annotations

import pytest

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES
from aws_vpcflowlogs_parquet_spark.plans.staging import (
    STAGED_ORACLES,
    STAGED_QUERIES,
)

from .conftest import SF_DIR, compare_spark_duck


def test_staged_names_do_not_collide_with_catalog():
    assert not set(STAGED_QUERIES) & set(QUERIES)
    assert set(STAGED_QUERIES) == set(STAGED_ORACLES)


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_QUERIES[name](spark, SF_DIR)
    ok, msg = compare_spark_duck(sdf, duck, STAGED_ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_nonempty(spark, name):
    assert STAGED_QUERIES[name](spark, SF_DIR).limit(1).count() == 1, name


# 10x re-check: the same gate at sf0.01 (the driver's own scale factor)
# so promotion-time behavior is pinned at BOTH scales before the move.
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    from aws_vpcflowlogs_parquet_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF01_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle_sf01(spark, duck01, name):
    sdf = STAGED_QUERIES[name](spark, SF01_DIR)
    ok, msg = compare_spark_duck(sdf, duck01, STAGED_ORACLES[name])
    assert ok, f"{name}: {msg}"
