"""Tracked persist() for multi-consumer pipeline intermediates.

Several operator builders persist shared sub-relations (shingle tables,
the exact-duplicate collapse, pagerank's loop invariants, IVF cell
assignments) so a plan with N consumers runs the expensive shuffle once
instead of N times. Those frames are lazy and flow into the DataFrame
the builder RETURNS, so the builder itself can never unpersist them —
the caller's terminal action hasn't run yet. Left untracked they
accumulate over a long session (ADVICE r5: a 220-query drive stacks
every query's caches), adding memory/disk pressure; Spark's LRU evicts
under pressure but eviction is exactly the thrash we want to avoid.

The contract here:

- builders call :func:`track_persist` instead of ``df.persist()`` for
  any persist they cannot balance with an in-scope ``unpersist()``;
- the query catalog's ``@register`` wrapper calls
  :func:`release_cached_intermediates` when the NEXT query is built,
  bounding live tracked caches to one query's working set (every
  harness — driver, pytest, bench, CLI — builds and materializes
  queries sequentially, so the previous query's caches are dead by
  then; unpersist is safe regardless — Spark recomputes);
- bench.py additionally ``spark.catalog.clearCache()``s between timed
  runs, and long-lived embedders can call
  :func:`release_cached_intermediates` explicitly at any boundary.

Balanced persists (an iterative loop that unpersists its previous
round, e.g. dedup_clusters / label_propagation) stay untracked — they
already free themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED_CACHES: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """``persist()`` + enrol for the next release_cached_intermediates()."""
    _TRACKED_CACHES.append(df.persist())
    return df


def release_cached_intermediates() -> int:
    """Unpersist every tracked intermediate; returns how many released.

    Teardown must stay safe when the owning SparkSession is already
    stopped (nothing left to free), but a swallowed failure on a LIVE
    session would silently re-introduce the block-manager leak this
    module exists to prevent — so that case is logged, not hidden.
    """
    import warnings

    n = 0
    while _TRACKED_CACHES:
        df = _TRACKED_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception as exc:
            try:
                stopped = df.sparkSession.sparkContext._jsc is None
            except Exception:
                stopped = True
            if not stopped:
                warnings.warn(
                    f"unpersist failed on a live session; cached block "
                    f"may leak: {type(exc).__name__}: {exc}",
                    RuntimeWarning,
                    stacklevel=2,
                )
    return n


def tracked_cache_count() -> int:
    """How many tracked intermediates are currently live (test hook)."""
    return len(_TRACKED_CACHES)
