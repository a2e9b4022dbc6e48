"""Post-execution plan metrics — the engine's observability surface.

Spark attaches SQLMetrics to every physical operator (rows produced,
shuffle bytes, spill sizes, scan stats). `profile(df)` executes a frame
and walks the final (AQE-resolved) plan tree to return those numbers as
plain data — the per-query digest a pipeline records next to its outputs
(and the first thing to look at when a 100 TB run is slow: did the scan
read what we thought? did anything spill? how much crossed the wire?).

No listener machinery: PySpark cannot host a JVM QueryExecutionListener
callback reliably, and polling the executed plan after the action yields
the identical metrics, so this stays dependency-free.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def _nodes(root):
    """Yield every physical node, descending through AQE wrappers:
    AdaptiveSparkPlanExec -> its current executedPlan, QueryStageExec ->
    its materialized stage plan, ReusedExchange/Subquery -> child."""
    stack = [root]
    seen = set()
    while stack:
        node = stack.pop()
        ident = node.id() if hasattr(node, "id") else id(node)
        key = (node.getClass().getName(), ident)
        if key in seen:
            continue
        seen.add(key)
        yield node
        name = node.nodeName()
        if "AdaptiveSparkPlan" in name:
            try:
                stack.append(node.executedPlan())
                continue
            except Exception:
                pass
        if "QueryStage" in name:
            try:
                stack.append(node.plan())
                continue
            except Exception:
                pass
        it = node.children().iterator()
        while it.hasNext():
            stack.append(it.next())


def _metrics(node) -> dict[str, int]:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def profile(df: DataFrame) -> dict[str, Any]:
    """Execute ``df`` and return its metric digest.

    Keys: rows_out, scan_rows (sum over scans), shuffle_bytes_written,
    shuffle_records, spill_bytes, peak_mem_bytes (max over operators),
    n_exchanges, n_operators, wall_sec, exchange_records (per-exchange
    shuffleRecordsWritten, plan-walk order — lets a caller distinguish a
    row-preserving scan-parallelization exchange from an aggregation
    exchange whose record count proves map-side state is fixed-size).
    """
    import time

    # the action MUST run this DataFrame's own QueryExecution — a
    # .count() would plan a different query and leave these metrics empty
    t0 = time.time()
    rows = df.collect()
    wall = time.time() - t0

    agg: dict[str, Any] = {
        "rows_out": len(rows),
        "wall_sec": round(wall, 3),
        "scan_rows": 0,
        "shuffle_bytes_written": 0,
        "shuffle_records": 0,
        "spill_bytes": 0,
        "peak_mem_bytes": 0,
        "n_exchanges": 0,
        "n_operators": 0,
        "exchange_records": [],
    }
    for node in _nodes(df._jdf.queryExecution().executedPlan()):
        name = node.nodeName()
        agg["n_operators"] += 1
        vals = _metrics(node)
        if "Scan" in name:
            agg["scan_rows"] += vals.get("numOutputRows", 0)
        if "Exchange" in name:
            agg["n_exchanges"] += 1
            agg["exchange_records"].append(
                vals.get("shuffleRecordsWritten", 0)
            )
        agg["shuffle_bytes_written"] += vals.get("shuffleBytesWritten", 0)
        agg["shuffle_records"] += vals.get("shuffleRecordsWritten", 0)
        agg["spill_bytes"] += vals.get("spillSize", 0)
        agg["peak_mem_bytes"] = max(
            agg["peak_mem_bytes"], vals.get("peakMemory", 0)
        )
    return agg
