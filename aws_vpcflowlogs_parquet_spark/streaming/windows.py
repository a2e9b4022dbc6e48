"""Event-time windowed/stateful streaming operators (SURVEY §2.2 last row).

The reference is stateless per-file batch; these are the streaming
capabilities its architecture implies (continuous flow-log feeds are the
native shape of VPC Flow Logs). All operators take an *unbounded* DataFrame
(``spark.readStream``) and return a transformed unbounded DataFrame the
caller sinks; watermarks bound state so they run forever at 100 TB/day:

- tumbling/sliding window aggregations over event time
- session windows (gap-based)
- exact dedup within a watermark horizon

The batch twins of these semantics are oracle-verified in the catalog
(q_time_bucket, q_session_dedup); streaming tests drive file sources to
completion with processAllAvailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.casts import exact_sum


def tumbling_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time windows; late rows beyond the watermark drop out
    of state instead of accumulating it."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            exact_sum("value", 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windows: each event lands in window_len/slide buckets."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len, slide))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
        )
    )


def sessionized(
    events: DataFrame,
    gap: str = "20 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based session windows per user (session_window merges runs of
    events separated by < gap)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stateful_user_stats(
    events: DataFrame,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running stats (event count, max value, last event time) maintained in
    explicit group state across micro-batches.

    This is the escape hatch for stateful semantics Spark's built-in
    windowed aggregations cannot express (arbitrary per-key accumulators,
    custom merge logic). Each micro-batch emits the *updated* totals for
    exactly the keys it touched (update semantics); state is one fixed-size
    tuple per user — O(#distinct users), independent of stream length, so
    at 100 TB/day the state store is bounded by key cardinality and
    partitioned across executors by the groupBy hash. All per-batch work is
    Arrow-batched pandas, never row-at-a-time Python.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, max_value double, last_ts timestamp"
    state_schema = "n bigint, mx double, last_us bigint"

    def update(key, pdf_iter, state: GroupState):
        n, mx, last_us = state.get if state.exists else (0, None, None)
        for pdf in pdf_iter:
            n += len(pdf)
            v = pdf["value"].max()
            if not pd.isna(v):
                mx = float(v) if mx is None else max(mx, float(v))
            t = pdf[ts_col].max()
            if not pd.isna(t):
                t_us = t.value // 1000  # pd.Timestamp.value is ns
                last_us = t_us if last_us is None else max(last_us, t_us)
        state.update((n, mx, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "max_value": [mx],
                "last_ts": [
                    pd.Timestamp(last_us, unit="us") if last_us is not None else pd.NaT
                ],
            }
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream inner join within an event-time horizon: each left
    event pairs with right events for the same key whose timestamp falls
    in ``[left.ts, left.ts + horizon]``.

    Both sides carry a watermark and the join condition bounds right.ts
    relative to left.ts, which is what lets Spark expire buffered state on
    BOTH sides: a left row can be dropped once the right watermark passes
    ``left.ts + horizon``, and a right row once the left watermark passes
    ``right.ts``. Without the time-range condition the state store grows
    without bound — the difference between a demo and an operator that
    survives an unbounded 100 TB/day feed. Matches emit immediately
    (inner-join append semantics), so latency is one micro-batch, not one
    watermark delay.
    """
    l = left.withWatermark(ts_col, watermark).select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = right.withWatermark(ts_col, watermark).select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col(ts_col).alias("r_ts"),
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: the streaming
    form of exact dedup — state is bounded by the watermark, so this
    sustains unbounded input (operators/dedup.py holds the batch forms)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys + [ts_col]
    )
