"""Driver-contract invariants of __spark_entry__.py: the unverified-first
ordering must put every not-yet-driver-verified query ahead of all
verified ones (so the per-round verification cap always advances
cumulative coverage), lose nothing, and keep queries/oracles aligned."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_unverified_first_partitions_and_preserves():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(qs) == set(os_)
    names = list(qs)
    verified = entrymod._VERIFIED_PRIOR_ROUNDS
    # every pending query precedes every verified one
    flags = [n in verified for n in names]
    first_verified = flags.index(True) if True in flags else len(flags)
    assert all(flags[first_verified:]), "verified block must be contiguous"
    assert not any(flags[:first_verified]), "pending block must lead"
    # the verified set only names real queries (a stale entry would
    # silently shrink the pending-first head)
    assert verified <= set(names), sorted(verified - set(names))


def test_queries_and_oracles_same_order():
    assert list(entrymod.queries()) == list(entrymod.oracle_sql())


def test_pending_count_within_driver_cap():
    """The external driver verifies at most 50 queries per round in
    queries() order; more pending than that means some queries would get
    no CORRECTNESS row this round. Round-5 pending = 3 re-verifies + 24
    promotions + 8 probes = 35."""
    qs = entrymod.queries()
    pending = [n for n in qs if n not in entrymod._VERIFIED_PRIOR_ROUNDS]
    assert len(pending) <= 50, (len(pending), pending)
