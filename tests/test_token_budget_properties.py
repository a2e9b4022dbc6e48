"""q_token_budget (plans/catalog.py): the integer waterfill's math,
verified against an independent brute-force level search — the DuckDB
oracle replays the same closed-form, so a shared formula bug would slip
through the value compare; this witness cannot."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES

from .conftest import SF_DIR


def brute_force_waterfill(tokens: list[int], budget: int):
    """Largest integer level lam with sum(min(t, lam)) <= budget, or
    None when the budget covers everything (no cap needed)."""
    if sum(tokens) <= budget:
        return None
    lam = 0
    while sum(min(t, lam + 1) for t in tokens) <= budget:
        lam += 1
    return lam


def waterfill_closed_form(tokens: list[int], budget: int):
    """The query's closed form, replicated: sort ascending, first rank
    whose candidate level falls below its own size is the cap point."""
    ts = sorted(tokens)
    n = len(ts)
    prefix = 0
    for k, t in enumerate(ts, start=1):
        lam_k = (budget - prefix) // (n - k + 1)
        if lam_k < t:
            return lam_k
        prefix += t
    return None


@given(
    tokens=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30),
    budget_pct=st.integers(min_value=0, max_value=100),
)
@settings(max_examples=300, deadline=None)
def test_closed_form_equals_brute_force(tokens, budget_pct):
    budget = sum(tokens) * budget_pct // 100
    assert waterfill_closed_form(tokens, budget) == brute_force_waterfill(
        tokens, budget
    )


def test_engine_waterfill_invariants(spark):
    rows = QUERIES["q_token_budget"](spark, SF_DIR).collect()
    tokens = {r.source: r.n_tokens for r in rows}
    total = sum(tokens.values())
    budget = total * 3 // 5
    lam = brute_force_waterfill(list(tokens.values()), budget)
    allocated = sum(r.allocation for r in rows)
    # feasibility: the allocation fits the budget
    assert allocated <= budget, (allocated, budget)
    # tightness: raising the level by 1 would bust the budget
    assert sum(min(t, lam + 1) for t in tokens.values()) > budget
    for r in rows:
        if r.capped:
            # capped sources all sit exactly at the water level
            assert r.allocation == lam == r.water_level
            assert r.n_tokens > lam
        else:
            # uncapped sources are fully funded below the level
            assert r.allocation == r.n_tokens <= lam
