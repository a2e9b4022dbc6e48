"""Staging catalog — queries built ahead of the external driver's
50-pending-per-round verification capacity, held out of ``queries()``
until the queue drains.

Round-5 status: EMPTY. The 24 queries staged here during round 4
(SURVEY §2.5 history) were promoted verbatim into plans/catalog.py in
round 5 (r4 VERDICT item 3) — see the "Round-5 promotions" section
there. The machinery stays so any future round that overruns the
pending cap can stage again: decorate with ``@staged(name, oracle)``,
gate with tests/test_staging_oracle.py, and promote by moving the block
to catalog.py with ``@register``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_session_posture

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}


def staged(name: str, oracle: str):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_posture(spark)
            return fn(spark, sf_dir)

        STAGED_QUERIES[name] = wrapped
        STAGED_ORACLES[name] = oracle
        return wrapped

    return deco
