"""Driver-replica correctness gate: every catalog query vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01).

This is the engine's version of the reference's round-trip test
(main_test.go:27-70) generalized to the whole query surface — SURVEY §5.
"""

from __future__ import annotations

import pytest

from aws_vpcflowlogs_parquet_spark.plans.catalog import ORACLES, QUERIES

from .conftest import SF_DIR, compare_spark_duck


def test_every_query_has_oracle():
    assert set(ORACLES) == set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    ok, msg = compare_spark_duck(sdf, duck, ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_nonempty(spark, name):
    # every query should exercise real rows at sf0.001 except the
    # threshold-dependent near-dup detectors (empty is a valid answer there)
    may_be_empty = {"q_dedup_minhash", "q_embed_dup", "q_dedup_ngram"}
    if name in may_be_empty:
        return
    assert QUERIES[name](spark, SF_DIR).limit(1).count() == 1, f"{name} returned 0 rows"
