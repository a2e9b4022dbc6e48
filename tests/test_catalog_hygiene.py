"""Catalog hygiene: the registry invariants the correctness gate and the
parity review depend on."""

from __future__ import annotations

from aws_vpcflowlogs_parquet_spark.plans.catalog import ORACLES, QUERIES


def test_registry_consistent():
    assert set(ORACLES) == set(QUERIES)
    assert len(QUERIES) >= 102


def test_every_oracle_is_substantive():
    trivial = [n for n, sql in ORACLES.items() if len(sql.strip()) < 30]
    assert not trivial, trivial


def test_query_names_are_stable_identifiers():
    assert all(n.startswith("q_") and n.islower() for n in QUERIES)
