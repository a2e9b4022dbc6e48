"""Staging catalog — queries built ahead of the external driver's
50-pending-per-round verification capacity, held out of ``queries()``
until the queue drains.

Round-12 status: **empty — all 19 round-11-staged queries were promoted
into the §2.3 catalog** (r11 VERDICT item 1): q_retry_backoff_conformance,
q_krippendorff_alpha, q_join_order_plan, q_newsvendor, q_pinball_eval,
q_rrf_fusion, q_spc_control_chart, q_kendall_w, q_harmonic_centrality,
q_markov_power, q_local_matching, q_business_days, q_hill_tail_index,
q_fiscal_445, q_dup_invoice, q_wilcoxon_signed, q_tiered_billing,
q_lsh_tuning_curve and q_churn_labels each moved verbatim (oracle
included) with ``@staged`` -> ``@register``; their independent-witness
tests (tests/test_round11_staging_witness.py) and plan pins now point at
the catalog registry.

The staging machinery (``@staged``, ``STAGED_QUERIES``/``STAGED_ORACLES``,
the oracle gate in tests/test_staging_oracle.py) stays armed for any
future round that would overrun the driver's 50-pending-per-round cap:
move the ``@staged`` block to catalog.py, switch the decorator to
``@register``, add the SURVEY §2.3 row, confirm pending <= 50, re-run the
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
