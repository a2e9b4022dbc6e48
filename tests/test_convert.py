"""Converter round-trip + partition tests (reference TestWriteFile,
main_test.go:27-70, generalized) and event-discovery tests (main.go:87-135).
"""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from aws_vpcflowlogs_parquet_spark.operators.convert import (
    convert_flowlogs,
    register_flowlog_table,
)
from aws_vpcflowlogs_parquet_spark.sources.events import targets_from_event

HEADER = (
    "version account-id interface-id srcaddr dstaddr srcport dstport "
    "protocol packets bytes start end action log-status"
)


def _mk_line(acct: str, start: int, sport: int = 1234) -> str:
    return (
        f"2 {acct} eni-70594239 10.0.2.2 10.0.4.8 {sport} 5245 17 6 965 "
        f"{start} {start + 420} ACCEPT OK"
    )


DAY1 = 1541375637  # 2018-11-04 UTC
DAY2 = 1541462037  # 2018-11-05 UTC


def test_round_trip_and_partition_set(spark, tmp_path):
    # multi-day/multi-account input → correct partition set (main.go:169-172)
    src = tmp_path / "in.log.gz"
    with gzip.open(src, "wt") as f:
        f.write(
            "\n".join(
                [
                    HEADER,
                    _mk_line("111111111111", DAY1),
                    _mk_line("111111111111", DAY1, 5678),
                    _mk_line("111111111111", DAY2),
                    _mk_line("222222222222", DAY2),
                ]
            )
        )
    out = tmp_path / "out"
    keys = convert_flowlogs(spark, str(src), str(out))
    assert keys == [
        ("2018-11-04", "111111111111"),
        ("2018-11-05", "111111111111"),
        ("2018-11-05", "222222222222"),
    ]
    back = spark.read.parquet(str(out))
    assert back.count() == 4
    # partition columns usable for pruning; data columns intact
    assert back.filter(F.col("dt") == "2018-11-04").count() == 2
    assert back.filter(F.col("account") == "222222222222").count() == 1
    assert dict(back.dtypes)["start_ts"] == "bigint"
    assert dict(back.dtypes)["end_ts"] == "bigint"  # not the Glue int bug


def test_idempotent_partition_overwrite(spark, tmp_path):
    # re-running the same source must not duplicate rows (reference achieves
    # this via deterministic output keys, convert.go:86; we use dynamic
    # partition overwrite)
    src = tmp_path / "in.log"
    src.write_text("\n".join([HEADER, _mk_line("111111111111", DAY1)]))
    out = tmp_path / "out"
    convert_flowlogs(spark, str(src), str(out))
    convert_flowlogs(spark, str(src), str(out))
    assert spark.read.parquet(str(out)).count() == 1


def test_catalog_registration(spark, tmp_path):
    src = tmp_path / "in.log"
    src.write_text(
        "\n".join([HEADER, _mk_line("111111111111", DAY1), _mk_line("222222222222", DAY2)])
    )
    out = tmp_path / "tbl"
    keys = convert_flowlogs(spark, str(src), str(out))
    register_flowlog_table(spark, "flowlogs_test", str(out), partitions=keys)
    try:
        got = spark.sql(
            "SELECT account, count(*) AS n FROM flowlogs_test "
            "WHERE dt = '2018-11-04' GROUP BY account"
        ).collect()
        assert [(r["account"], r["n"]) for r in got] == [("111111111111", 1)]
        parts = spark.sql("SHOW PARTITIONS flowlogs_test").count()
        assert parts == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS flowlogs_test")


def test_targets_from_s3_event():
    event = {
        "Records": [
            {
                "awsRegion": "ap-northeast-1",
                "s3": {"bucket": {"name": "b1"}, "object": {"key": "logs/x.gz"}},
            },
            {"unsupported": True},
        ]
    }
    ts = targets_from_event(event)
    assert len(ts) == 1  # unsupported record skipped, not an error
    assert ts[0].bucket == "b1" and ts[0].key == "logs/x.gz"
    assert ts[0].path == "s3a://b1/logs/x.gz"


def test_targets_from_sns_wrapped_event():
    inner = {
        "Records": [
            {"s3": {"bucket": {"name": "b2"}, "object": {"key": "k2"}}}
        ]
    }
    event = {"Records": [{"Sns": {"Message": json.dumps(inner)}}]}
    ts = targets_from_event(event)
    assert [(t.bucket, t.key) for t in ts] == [("b2", "k2")]


def test_targets_bad_sns_message_skipped():
    event = {"Records": [{"Sns": {"Message": "not json"}}]}
    assert targets_from_event(event) == []
