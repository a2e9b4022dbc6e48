"""Staging catalog — queries built ahead of the external driver's
50-pending-per-round verification capacity, held out of ``queries()``
until the queue drains.

Round-7 status: **empty — all 13 round-6-staged queries were promoted
into the §2.3 catalog** (r6 VERDICT item 1): q_resource_alloc,
q_rolling_regression, q_conversion_curve, q_negative_sampling,
q_weighted_jaccard, q_snapshot_diff, q_lag_features, q_calendar_dim,
q_stream_cep, q_dim_stats, q_pit_audit, q_compaction_plan and
q_tokenizer_fertility each moved verbatim (oracle included) with
``@staged`` -> ``@register``; their independent-witness tests
(tests/test_staging_properties.py round-6 section) now point at the
catalog registry.

The staging machinery (``@staged``, ``STAGED_QUERIES``/``STAGED_ORACLES``,
the oracle gate in tests/test_staging_oracle.py) stays armed for any
future round that would overrun the driver's 50-pending-per-round cap:
move the ``@staged`` block to catalog.py, switch the decorator to
``@register``, add the SURVEY §2.3 row, confirm pending ≤ 50, re-run the
sf0.01 drive.
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
