"""Cross-batch behavior of the round-11 streaming absence operator:
a click whose deadline passes only in a LATER batch must be confirmed
by that batch (the timeout-CEP state contract), and the cross-batch
total must equal the batch-rule recomputation."""

from __future__ import annotations

import collections

import duckdb
import pytest
from pyspark.sql import functions as F

from aws_vpcflowlogs_parquet_spark.sources.tables import stream_events
from aws_vpcflowlogs_parquet_spark.streaming.windows import stream_absence

from .conftest import SF_DIR

GAP_US = 3_600_000_000


def _expected_absences():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, event_type, epoch_us(ts) FROM"
        f" '{SF_DIR}/events.parquet'"
    ).fetchall()
    con.close()
    per_user = collections.defaultdict(list)
    for uid, etype, us in rows:
        per_user[uid].append((us, etype))
    exp = collections.Counter()
    for uid, evs in per_user.items():
        evs.sort()
        horizon = max(us for us, _t in evs)
        purchases = sorted(us for us, t in evs if t == "purchase")
        import bisect

        for us, t in evs:
            if t != "click":
                continue
            i = bisect.bisect_right(purchases, us)
            present = i < len(purchases) and purchases[i] <= us + GAP_US
            if not present and horizon > us + GAP_US:
                exp[uid] += 1
    return dict(exp)


def test_stream_absence_confirms_across_batches(spark, tmp_path):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = tmp_path / "abs_src"
    src.mkdir()
    tbl = pq.read_table(f"{SF_DIR}/events.parquet")
    ts = tbl.column("ts")
    cut = pc.quantile(ts.cast("int64"), q=0.5).to_pylist()[0]
    mask = pc.less(ts.cast("int64"), int(cut))
    pq.write_table(tbl.filter(mask), src / "events.parquet")
    stream = stream_events(spark, str(src))
    out = stream_absence(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("abs_out")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batch1 = spark.sql(
            "SELECT coalesce(sum(n_abandoned), 0) AS n FROM abs_out"
        ).collect()[0]["n"]
        pq.write_table(tbl.filter(pc.invert(mask)), src / "events2.parquet")
        q.processAllAvailable()
        got = {
            r.user_id: r.n
            for r in spark.sql(
                "SELECT user_id, CAST(sum(n_abandoned) AS BIGINT) AS n"
                " FROM abs_out GROUP BY user_id"
            ).collect()
        }
        exp = _expected_absences()
        assert got == exp
        # batch 2 must confirm additional absences (clicks near the cut
        # whose deadline passes only once batch 2 advances the horizon)
        assert sum(exp.values()) > n_batch1 >= 0
    finally:
        q.stop()


def test_stream_absence_purchase_cancels_pending(spark, tmp_path):
    # a click pending at the batch boundary whose purchase arrives in
    # the NEXT batch (inside the gap) must NOT be reported absent
    import datetime

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "abs2_src"
    src.mkdir()
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def _tbl(rows):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        return pa.Table.from_pandas(pdf, preserve_index=False)

    batch1 = [
        (1, t0, 7, "click", 1.0, "{}"),
        # user 8's click will expire unanswered in batch 2
        (2, t0, 8, "click", 1.0, "{}"),
    ]
    batch2 = [
        # 30 min later: inside user 7's gap -> cancels
        (3, t0 + datetime.timedelta(minutes=30), 7, "purchase", 1.0, "{}"),
        # 2 h later: pushes both horizons past every deadline
        (4, t0 + datetime.timedelta(hours=2), 7, "view", 1.0, "{}"),
        (5, t0 + datetime.timedelta(hours=2), 8, "view", 1.0, "{}"),
    ]
    pq.write_table(_tbl(batch1), src / "events.parquet")
    stream = stream_events(spark, str(src))
    out = stream_absence(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("abs2_out")
        .start()
    )
    try:
        q.processAllAvailable()
        pq.write_table(_tbl(batch2), src / "events2.parquet")
        q.processAllAvailable()
        got = {
            r.user_id: r.n
            for r in spark.sql(
                "SELECT user_id, CAST(sum(n_abandoned) AS BIGINT) AS n"
                " FROM abs2_out GROUP BY user_id"
            ).collect()
        }
        assert got == {8: 1}
    finally:
        q.stop()
