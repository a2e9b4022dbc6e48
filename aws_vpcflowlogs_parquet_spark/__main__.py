"""Unified operational CLI — the engine's `spark-submit` surface.

    python -m aws_vpcflowlogs_parquet_spark convert --src a.log.gz --dst out/
    python -m aws_vpcflowlogs_parquet_spark register --table flowlogs --path out/
    python -m aws_vpcflowlogs_parquet_spark stream --src drop/ --dst out/ --checkpoint ckpt/
    python -m aws_vpcflowlogs_parquet_spark event event.json
    python -m aws_vpcflowlogs_parquet_spark query q_topk --sf /root/testdata/sf0.001
    python -m aws_vpcflowlogs_parquet_spark profile q_topk
    python -m aws_vpcflowlogs_parquet_spark layout --path tbl/ --cluster-by x,y

Each subcommand is a thin veneer over the library (operators/, plans/,
streaming/, observability) — the operational equivalent of the
reference's Lambda binary (main.go:67-85), runnable under spark-submit
or plain python on any cluster.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="aws_vpcflowlogs_parquet_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("convert", help="batch-convert flow-log gzip/text files")
    p.add_argument("--src", nargs="+", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--strict", action="store_true")
    p.add_argument("--src-partition", action="store_true")

    p = sub.add_parser("register", help="register/repair the partitioned table")
    p.add_argument("--table", required=True)
    p.add_argument("--path", required=True)

    p = sub.add_parser("stream", help="run the streaming converter")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--available-now", action="store_true",
                   help="drain what exists, then exit (backfill mode)")

    p = sub.add_parser("event", help="process an S3/SNS event JSON (Lambda twin)")
    p.add_argument("event")

    p = sub.add_parser("query", help="run a catalog query and print rows")
    p.add_argument("name")
    p.add_argument("--sf", default="/root/testdata/sf0.001")
    p.add_argument("--limit", type=int, default=20)

    p = sub.add_parser("profile", help="run a catalog query, print its metrics")
    p.add_argument("name")
    p.add_argument("--sf", default="/root/testdata/sf0.001")

    p = sub.add_parser("layout", help="rewrite a table clustered for skipping")
    p.add_argument("--path", required=True)
    p.add_argument("--cluster-by", required=True, help="comma-separated columns")
    p.add_argument("--files", type=int, default=8)

    args = ap.parse_args(argv)
    from .session import get_spark

    spark = get_spark(f"cli-{args.cmd}")

    if args.cmd == "convert":
        from .operators.convert import convert_flowlogs

        keys = convert_flowlogs(
            spark, args.src, args.dst,
            strict=args.strict, src_partition=args.src_partition,
        )
        for k in keys:
            print("/".join(str(x) for x in k))
    elif args.cmd == "register":
        from .operators.convert import register_flowlog_table

        register_flowlog_table(spark, args.table, args.path, partitions=None)
        print(f"registered {args.table} at {args.path}")
    elif args.cmd == "stream":
        from .streaming.convert_stream import start_flowlog_stream

        q = start_flowlog_stream(spark, args.src, args.dst, args.checkpoint)
        if args.available_now:
            q.processAllAvailable()
            q.stop()
        else:
            q.awaitTermination()
    elif args.cmd == "event":
        from .handler import config_from_env, run_event

        with open(args.event) as f:
            event = json.load(f)
        for dt, account in run_event(spark, event, config_from_env()):
            print(f"dt={dt}/account={account}")
    elif args.cmd == "query":
        from .plans.catalog import QUERIES

        df = QUERIES[args.name](spark, args.sf)
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "profile":
        from .observability import profile
        from .plans.catalog import QUERIES

        print(json.dumps(profile(QUERIES[args.name](spark, args.sf))))
    elif args.cmd == "layout":
        from .operators.layout import optimize_layout

        optimize_layout(
            spark.read.parquet(args.path),
            args.path + "__clustered",
            cluster_by=args.cluster_by.split(","),
            n_files=args.files,
        )
        print(f"wrote {args.path}__clustered")
    return 0


if __name__ == "__main__":
    sys.exit(main())
