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


def test_no_hugeint_in_oracle_results(duck):
    """Round-5 regression guard for the r3/r4 driver-only hash failures:
    DuckDB HUGEINT (e.g. a bare integer SUM) round-trips exactly through
    fetchall() — so every local replica passes — but becomes float64 /
    decimal128 through the pandas/Arrow fetch path, silently breaking the
    driver's value hash. Ban it from every oracle's result schema.
    (The deliberate q_probe_sum_bare diagnostic carried the one
    exemption until the probe family was retired in round 6.)"""
    offenders = {}
    for name, sql in ORACLES.items():
        types = [str(t) for t in duck.sql(sql).types]
        bad = [t for t in types if "HUGEINT" in t]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def _type_family(t: str) -> str:
    t = str(t).upper()
    if "HUGEINT" in t:
        return "hugeint"
    if "DECIMAL" in t:
        return "dec"
    for k in ("TINYINT", "SMALLINT", "UINTEGER", "UBIGINT", "BIGINT",
              "INTEGER", "INT", "LONG", "SHORT", "BYTE"):
        if k in t:
            return "int"
    for k in ("DOUBLE", "FLOAT", "REAL"):
        if k in t:
            return "float"
    if "BOOL" in t:
        return "bool"
    for k in ("VARCHAR", "STRING", "CHAR", "JSON"):
        if k in t:
            return "str"
    if "TIMESTAMP" in t or "DATE" in t:
        return "ts"
    return "other:" + t


def test_no_cross_engine_dtype_family_mismatch(spark, duck):
    """Broader form of the HUGEINT ban: for every query, each output
    column's Spark type and DuckDB type must be in the same rendering
    family (int/float/str/…). A family mismatch (e.g. DuckDB DECIMAL vs
    Spark double) survives a fetchall() value compare but can render
    differently through the driver's pandas/Arrow fetch path — the
    round-5 root-cause class. Schema analysis only, nothing executes.
    DuckDB JSON is classed with strings: it is VARCHAR-backed and
    renders identically (driver-proven green on q_json_funcs since
    r2)."""
    offenders = []
    for name in sorted(QUERIES):
        rel = duck.sql(ORACLES[name])
        duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        spark_types = dict(QUERIES[name](spark, SF_DIR).dtypes)
        for col, st in spark_types.items():
            dt = duck_types.get(col)
            if dt is not None and _type_family(st) != _type_family(dt):
                offenders.append((name, col, st, dt))
    assert not offenders, offenders


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_nonempty(spark, name):
    # every query should exercise real rows at sf0.001 except the
    # threshold-dependent near-dup detectors (empty is a valid answer there)
    may_be_empty = {"q_dedup_minhash", "q_embed_dup", "q_dedup_ngram"}
    if name in may_be_empty:
        return
    assert QUERIES[name](spark, SF_DIR).limit(1).count() == 1, f"{name} returned 0 rows"
