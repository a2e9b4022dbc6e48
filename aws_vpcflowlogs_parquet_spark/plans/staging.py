"""Staging catalog — queries built ahead of the external driver's
50-pending-per-round verification capacity, held out of ``queries()``
until the queue drains.

Round-11 status: **empty — all 27 round-10-staged queries were promoted
into the §2.3 catalog** (r10 VERDICT item 1): q_group_lcp,
q_histogram_equalize, q_ratio_delta_method, q_h_index,
q_linear_interpolate, q_csv_sniff, q_outlier_iqr, q_readability,
q_forecast_backtest, q_ua_parse, q_modularity, q_er_score,
q_flow_stitch, q_feature_hash_audit, q_revenue_recognition,
q_diff_in_diff, q_grid_hotspot, q_reconciliation,
q_sampling_temperature, q_span_f1, q_encoding_advisor, q_merkle_levels,
q_mix_rate_decomposition, q_t_closeness, q_conformal_interval, q_apdex
and q_backfill_plan each moved verbatim (oracle included) with
``@staged`` -> ``@register``; their independent-witness tests
(tests/test_round10_staging_witness.py) and plan pins
(tests/test_round10_staging_plans.py) now point at the catalog registry.

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
