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
