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


#: queries where an empty result is a valid answer at sf0.001
#: (threshold-dependent near-dup detectors)
MAY_BE_EMPTY = {"q_dedup_minhash", "q_embed_dup", "q_dedup_ngram"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    """Oracle value compare + dtype-family parity + nonemptiness, in ONE
    build per query. The dtype and nonempty checks were standalone test
    families re-BUILDING every query (iterative builds run real driver
    jobs), ~380 s of the suite's 36 min; they now ride the build this
    test already pays (r13 test-gate tiering, VERDICT r12 item 2).
    Coverage is unchanged — same assertions, same per-query grain."""
    sdf = QUERIES[name](spark, SF_DIR)
    # dtype-family parity (the round-5 HUGEINT/DECIMAL rendering class):
    # schema-only, uses the already-built frame
    rel = duck.sql(ORACLES[name])
    duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
    for col, st in sdf.dtypes:
        dt = duck_types.get(col)
        assert dt is None or _type_family(st) == _type_family(dt), (
            name, col, st, dt,
        )
    ok, msg = compare_spark_duck(sdf, duck, ORACLES[name])
    assert ok, f"{name}: {msg}"
    # nonemptiness: the value compare proved spark rows == oracle rows,
    # so the oracle side (milliseconds in DuckDB at sf0.001) answers it
    # without another Spark action
    if name not in MAY_BE_EMPTY:
        assert duck.execute(ORACLES[name]).fetchone() is not None, (
            f"{name} returned 0 rows"
        )


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


# test_no_cross_engine_dtype_family_mismatch and test_query_nonempty
# were merged into test_query_matches_oracle above (r13): all three
# built every catalog query from scratch, tripling the most expensive
# build set in the suite. The assertions live on, one build per query.
