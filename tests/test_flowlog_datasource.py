"""The `flowlog` Python DataSource (sources/flowlog_datasource.py):
golden parser semantics through the pluggable source, batch ≡ stream
parity on the sample2.log.gz shape, grammar parity with schema.py, and
the convert pipeline running on it end-to-end (write-nothing strict
abort included)."""

from __future__ import annotations

import gzip

import pytest

from aws_vpcflowlogs_parquet_spark.operators.convert import convert_flowlogs
from aws_vpcflowlogs_parquet_spark.sources.flowlog import (
    FlowLogParseError,
    read_flowlog_text,
)
from aws_vpcflowlogs_parquet_spark.sources.flowlog_datasource import (
    _GRAMMAR,
    register_flowlog_source,
)

HEADER = (
    "version account-id interface-id srcaddr dstaddr srcport dstport "
    "protocol packets bytes start end action log-status"
)
GOOD1 = (
    "2 123456789000 eni-70594239 10.0.2.2 10.0.4.8 1234 5245 17 6 965 "
    "1541375637 1541376057 ACCEPT OK"
)
GOOD2 = (
    "2 123456789010 eni-70594239 10.0.2.2 10.0.0.15 5678 2346 17 3 553 "
    "1541462037 1541462457 ACCEPT OK"
)
NODATA = (
    "2 123456789000 eni-11111111 - - - - - - - "
    "1541375637 1541376057 - NODATA"
)
BAD_ARITY = "2 123456789000 eni-70594239 10.0.2.2"
BAD_VERSION = GOOD1.replace("2 123456789000", "3 123456789000", 1)


@pytest.fixture()
def registered(spark):
    register_flowlog_source(spark)
    return spark


def _write_gz(path, lines):
    with gzip.open(path, "wt") as fh:
        fh.write("\n".join(lines))


def test_grammar_matches_schema_module():
    # the self-contained grammar (needed for by-value worker pickling)
    # must stay in lockstep with schema.FLOW_COLUMNS
    from aws_vpcflowlogs_parquet_spark.schema import FLOW_COLUMNS

    assert [(n, i) for n, i, _ in _GRAMMAR] == [
        (n, i) for n, (i, _) in FLOW_COLUMNS.items()
    ]
    kinds = {"int": "int", "long": "bigint", "str": "string"}
    assert [kinds[k] for _, _, k in _GRAMMAR] == [
        t.simpleString() for _, (_, t) in FLOW_COLUMNS.items()
    ]


def test_batch_read_matches_codegen_parser(registered, tmp_path):
    spark = registered
    src = tmp_path / "a.log.gz"
    _write_gz(src, [HEADER, GOOD1, GOOD2, NODATA])
    via_source = spark.read.format("flowlog").load(str(src))
    via_codegen = read_flowlog_text(spark, str(src))
    # names + types identical (nullability/metadata flags may differ
    # between a literal-derived projection and a declared source schema)
    assert via_source.schema.simpleString() == via_codegen.schema.simpleString()
    key = lambda r: (r.accountid, r.start_ts, r.srcport)  # noqa: E731
    assert sorted(map(tuple, via_source.collect()), key=lambda t: t[:3]) == \
        sorted(map(tuple, via_codegen.collect()), key=lambda t: t[:3])
    # NODATA '-' tokens → 0, not null (flowlog.go:59-90)
    nodata = via_source.filter("interfaceid = 'eni-11111111'").collect()[0]
    assert (nodata.srcport, nodata.packets, nodata.bytes) == (0, 0, 0)


def test_strict_aborts_and_lenient_drops(registered, tmp_path):
    spark = registered
    src = tmp_path / "bad.log"
    src.write_text("\n".join([HEADER, GOOD1, BAD_ARITY]))
    with pytest.raises(Exception, match="malformed flow log line"):
        spark.read.format("flowlog").load(str(src)).collect()
    lenient = (
        spark.read.format("flowlog")
        .option("strict", "false")
        .load(str(src))
    )
    assert lenient.count() == 1
    # version != 2 is malformed, not silently retyped (flowlog.go:46-48)
    src2 = tmp_path / "v3.log"
    src2.write_text("\n".join([HEADER, BAD_VERSION]))
    with pytest.raises(Exception, match="malformed flow log line"):
        spark.read.format("flowlog").load(str(src2)).collect()


def test_stream_read_equals_batch_and_picks_up_new_files(
    registered, tmp_path
):
    # the sample2.log.gz semantics: gzip drop dir, files arriving over
    # time, stream result == batch result over the same files
    spark = registered
    drop = tmp_path / "drop"
    drop.mkdir()
    _write_gz(drop / "a.log.gz", [HEADER, GOOD1])
    q = (
        spark.readStream.format("flowlog")
        .load(str(drop))
        .writeStream.format("memory")
        .queryName("flowlog_ds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM flowlog_ds_stream").count() == 1
        _write_gz(drop / "b.log.gz", [HEADER, GOOD2])
        q.processAllAvailable()
        got = spark.sql(
            "SELECT * FROM flowlog_ds_stream ORDER BY start_ts"
        ).collect()
    finally:
        q.stop()
    want = (
        spark.read.format("flowlog")
        .load(str(drop))
        .orderBy("start_ts")
        .collect()
    )
    assert list(map(tuple, got)) == list(map(tuple, want))


def test_convert_pipeline_runs_on_the_datasource(registered, tmp_path):
    spark = registered
    src = tmp_path / "a.log.gz"
    _write_gz(src, [HEADER, GOOD1, GOOD2])
    dst = str(tmp_path / "table")
    keys = convert_flowlogs(spark, str(src), dst, source="datasource")
    assert keys == [
        ("2018-11-04", "123456789000"),
        ("2018-11-05", "123456789010"),
    ]
    back = spark.read.parquet(dst)
    assert back.count() == 2
    assert {tuple(r) for r in back.select("dt", "account").collect()} == {
        ("2018-11-04", "123456789000"),
        ("2018-11-05", "123456789010"),
    }


def test_convert_datasource_strict_writes_nothing(registered, tmp_path):
    # the reference's abort-on-error (convert.go:48-50): the task dies
    # before commit, so the output dir holds NO committed data — unlike
    # the text path's documented raise-after-write divergence
    spark = registered
    src = tmp_path / "bad.log"
    src.write_text("\n".join([HEADER, GOOD1, BAD_ARITY]))
    dst = tmp_path / "table"
    with pytest.raises(FlowLogParseError, match="malformed flow log line"):
        convert_flowlogs(spark, str(src), str(dst), source="datasource")
    committed = list(dst.rglob("*.parquet")) if dst.exists() else []
    assert committed == []


def test_src_partition_rejected_on_datasource(registered, tmp_path):
    with pytest.raises(ValueError, match="src_partition"):
        convert_flowlogs(
            registered,
            str(tmp_path / "x.log"),
            str(tmp_path / "t"),
            src_partition=True,
            source="datasource",
        )


def test_writer_round_trips_and_two_phase_commits(registered, tmp_path):
    spark = registered
    src = tmp_path / "in.log.gz"
    _write_gz(src, [HEADER, GOOD1, GOOD2, NODATA])
    df = spark.read.format("flowlog").load(str(src)).drop("start_time")
    out = str(tmp_path / "out")
    df.write.format("flowlog").mode("append").option("path", out).save()
    files = sorted(p.name for p in (tmp_path / "out").iterdir())
    assert files and all(f.endswith(".log.gz") for f in files)
    assert not any(f.endswith(".staging") for f in files)
    back = spark.read.format("flowlog").load(out)
    key = ["accountid", "interfaceid", "start_ts", "srcport"]
    assert sorted(map(tuple, back.select(*key).collect())) == sorted(
        map(tuple, df.select(*key).collect())
    )
    # NODATA numerics survive the round trip as zeros (written back as
    # '0', not '-'; the zero-default cast made them 0 at first parse)
    assert back.filter("interfaceid = 'eni-11111111'").collect()[0].srcport == 0


def test_writer_abort_leaves_no_output(registered, tmp_path):
    from pyspark.sql import functions as F

    spark = registered
    src = tmp_path / "in.log"
    src.write_text("\n".join([HEADER, GOOD1, GOOD2]))
    df = (
        spark.read.format("flowlog")
        .load(str(src))
        .drop("start_time")
        .withColumn(
            "version",
            F.when(
                F.col("accountid") == "123456789010",
                F.expr("raise_error('induced task failure')").cast("int"),
            ).otherwise(F.col("version")),
        )
    )
    out = tmp_path / "out_abort"
    with pytest.raises(Exception, match="induced task failure"):
        df.coalesce(1).write.format("flowlog").mode("append").option(
            "path", str(out)
        ).save()
    leftover = list(out.iterdir()) if out.exists() else []
    assert leftover == []  # abort removed every staged file


# --- round-9 ADVICE closures -------------------------------------------


def test_crlf_input_matches_codegen_path(registered, tmp_path):
    # ADVICE r8: gzip/io text mode doesn't strip "\r" the way Hadoop's
    # line reader does; a CRLF file must parse identically on both paths
    spark = registered
    src = tmp_path / "crlf.log"
    src.write_bytes(("\r\n".join([HEADER, GOOD1, NODATA]) + "\r\n").encode())
    via_source = spark.read.format("flowlog").load(str(src))
    rows = via_source.collect()
    assert {r.logstatus for r in rows} == {"OK", "NODATA"}
    via_codegen = read_flowlog_text(spark, str(src))
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, via_codegen.collect())
    )


def test_short_header_is_malformed_both_paths(registered, tmp_path):
    # the reference's arity gate runs BEFORE its header skip
    # (flowlog.go:36-44): a truncated header is an error, not a header
    spark = registered
    src = tmp_path / "shorthdr.log"
    src.write_text("\n".join(["version account-id interface-id", GOOD1]))
    with pytest.raises(Exception, match="malformed flow log line"):
        spark.read.format("flowlog").load(str(src)).collect()
    with pytest.raises(FlowLogParseError):
        read_flowlog_text(spark, str(src), strict=True).collect()
    # lenient: dropped on both paths, the good line survives
    assert (
        spark.read.format("flowlog")
        .option("strict", "false")
        .load(str(src))
        .count()
        == 1
    )
    assert read_flowlog_text(spark, str(src)).count() == 1


def test_strict_error_carries_stable_code(registered, tmp_path):
    from aws_vpcflowlogs_parquet_spark.sources.flowlog_datasource import (
        ERROR_CODE,
    )

    spark = registered
    src = tmp_path / "bad.log"
    src.write_text("\n".join([HEADER, BAD_ARITY]))
    with pytest.raises(Exception, match=ERROR_CODE):
        spark.read.format("flowlog").load(str(src)).collect()


def test_writer_overwrite_truncates_and_append_accumulates(
    registered, tmp_path
):
    # ADVICE r8: overwrite previously behaved as append silently
    spark = registered
    src1 = tmp_path / "in1.log"
    src1.write_text("\n".join([HEADER, GOOD1]))
    src2 = tmp_path / "in2.log"
    src2.write_text("\n".join([HEADER, GOOD2]))
    d1 = spark.read.format("flowlog").load(str(src1)).drop("start_time")
    d2 = spark.read.format("flowlog").load(str(src2)).drop("start_time")
    out = str(tmp_path / "out")
    d1.write.format("flowlog").mode("append").option("path", out).save()
    d2.write.format("flowlog").mode("append").option("path", out).save()
    assert spark.read.format("flowlog").load(out).count() == 2
    d2.write.format("flowlog").mode("overwrite").option("path", out).save()
    back = spark.read.format("flowlog").load(out)
    assert [r.accountid for r in back.collect()] == ["123456789010"]


def test_stream_offset_is_a_bounded_watermark(tmp_path):
    # ADVICE r8: the offset JSON must not grow with total files ever
    # seen — it's an (mtime_ns, names-at-that-tick) high watermark
    import json as _json
    import os as _os

    from aws_vpcflowlogs_parquet_spark.sources.flowlog_datasource import (
        _FlowLogStreamReader,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    for i in range(5):
        (drop / f"f{i}.log").write_text("\n".join([HEADER, GOOD1]))
    rdr = _FlowLogStreamReader({"path": str(drop)})
    start = rdr.initialOffset()
    end = rdr.latestOffset()
    # all 5 files are new relative to the initial offset
    parts = rdr.partitions(start, end)
    assert len(parts) == 5
    # the offset names AT MOST the same-mtime tie set, never all files:
    # force distinct mtimes and the offset must carry exactly one name
    for i, name in enumerate(sorted(_os.listdir(drop))):
        _os.utime(drop / name, ns=(1_000_000_000 * (i + 1),) * 2)
    end2 = rdr.latestOffset()
    wm_mtime, wm_names = _json.loads(end2["wm"])
    assert wm_names == ["f4.log"]
    # a file landing with the SAME mtime as the watermark is still
    # picked up (the tie set disambiguates), and nothing is re-read
    late = drop / "f5.log"
    late.write_text("\n".join([HEADER, GOOD2]))
    _os.utime(late, ns=(wm_mtime, wm_mtime))
    end3 = rdr.latestOffset()
    parts2 = rdr.partitions(end2, end3)
    assert [p.path for p in parts2] == [str(late)]
    # replay of a committed range is exact: same offsets → same files
    assert [p.path for p in rdr.partitions(end2, end3)] == [str(late)]


def test_arrow_and_python_parsers_agree(registered, tmp_path):
    # VERDICT r8 item 5: the vectorized pyarrow.csv reader is the
    # default; the Python line loop stays as parser="python" — both
    # must produce identical rows, types, and strict verdicts
    spark = registered
    src = tmp_path / "mix.log.gz"
    _write_gz(src, [HEADER, GOOD1, GOOD2, NODATA, "", BAD_ARITY])
    frames = {}
    for parser in ("arrow", "python"):
        frames[parser] = (
            spark.read.format("flowlog")
            .option("strict", "false")
            .option("parser", parser)
            .load(str(src))
        )
    assert (
        frames["arrow"].schema.simpleString()
        == frames["python"].schema.simpleString()
    )
    assert sorted(map(tuple, frames["arrow"].collect())) == sorted(
        map(tuple, frames["python"].collect())
    )
    for parser in ("arrow", "python"):
        with pytest.raises(Exception, match="malformed flow log line"):
            (
                spark.read.format("flowlog")
                .option("parser", parser)
                .load(str(src))
                .collect()
            )


def test_mv_into_drop_dir_is_ingested(tmp_path):
    # ADVICE r9 (medium): `mv staged/x drop/x` preserves the source
    # mtime — under an mtime-only watermark a file renamed in after the
    # watermark passed its mtime was silently never ingested. The
    # arrival tick is now max(mtime_ns, ctime_ns); rename bumps ctime.
    import os as _os

    from aws_vpcflowlogs_parquet_spark.sources.flowlog_datasource import (
        _FlowLogStreamReader,
    )

    drop = tmp_path / "drop"
    stage = tmp_path / "stage"
    drop.mkdir()
    stage.mkdir()
    (drop / "first.log").write_text("\n".join([HEADER, GOOD1]))
    rdr = _FlowLogStreamReader({"path": str(drop)})
    wm1 = rdr.latestOffset()
    # stage a file whose mtime is FAR below the watermark, then mv it in
    old = stage / "old-mtime.log"
    old.write_text("\n".join([HEADER, GOOD2]))
    _os.utime(old, ns=(1_000_000_000, 1_000_000_000))  # 1970-ish mtime
    moved = drop / "old-mtime.log"
    _os.rename(old, moved)
    wm2 = rdr.latestOffset()
    parts = [p.path for p in rdr.partitions(wm1, wm2)]
    assert parts == [str(moved)]
    # and it is not re-read once covered
    assert rdr.partitions(wm2, rdr.latestOffset()) == []


def test_python_caster_shares_the_arrow_grammar(registered, tmp_path):
    # ADVICE r9: bare int() accepted underscores, Unicode digits, and
    # 19+-digit tokens the Arrow regex zeroes, and RAISED (at the
    # IntegerType boundary) on out-of-int32 values the Arrow path
    # zeroes. One grammar now: ^[+-]?[0-9]{1,18}$ plus range-to-zero.
    from aws_vpcflowlogs_parquet_spark.sources.flowlog_datasource import (
        _cast_int_token,
    )

    assert _cast_int_token("1_234", "int") == 0        # underscore
    assert _cast_int_token("١٢٣", "int") == 0          # Unicode digits
    assert _cast_int_token("9" * 19, "long") == 0      # 19 digits
    assert _cast_int_token("2147483648", "int") == 0   # out of int32
    assert _cast_int_token("2147483648", "long") == 2147483648
    assert _cast_int_token("-2147483648", "int") == -(2**31)
    assert _cast_int_token("+0042", "int") == 42
    assert _cast_int_token("-", "int") == 0

    spark = registered
    base = GOOD1.split(" ")
    lines = [HEADER]
    for tok in ("1_234", "١٢٣", "9" * 19, "2147483648", "+7"):
        row = list(base)
        row[5] = tok  # srcport (int32 column)
        lines.append(" ".join(row))
    src = tmp_path / "edges.log.gz"
    _write_gz(src, lines)
    got = {}
    for parser in ("arrow", "python"):
        got[parser] = sorted(
            r.srcport
            for r in spark.read.format("flowlog")
            .option("parser", parser)
            .load(str(src))
            .collect()
        )
    assert got["arrow"] == got["python"] == [0, 0, 0, 0, 7]


def test_overwrite_commit_renames_before_deleting(tmp_path, monkeypatch):
    # ADVICE r9: commit must rename the new generation IN before
    # deleting the old one — a crash mid-commit then leaves a superset
    # (old + partial new), never a hole. Simulate the crash by failing
    # the SECOND rename and assert the old generation survived.
    import os as _os

    from aws_vpcflowlogs_parquet_spark.sources.flowlog_datasource import (
        _FlowLogWriter,
        _StagedFile,
    )

    out = tmp_path / "out"
    out.mkdir()
    old_part = out / "part-oldrun-abc.log"
    old_part.write_text(GOOD1 + "\n")
    msgs = []
    for i in range(2):
        final = out / f"part-newrun-{i}.log"
        staged = str(final) + ".staging"
        (out / f"part-newrun-{i}.log.staging").write_text(GOOD2 + "\n")
        msgs.append(_StagedFile(staged=staged, final=str(final)))

    w = _FlowLogWriter({"path": str(out), "compress": "false"}, True)
    real_replace = _os.replace
    calls = {"n": 0}

    def crashy_replace(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated driver crash mid-commit")
        real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", crashy_replace)
    with pytest.raises(OSError, match="simulated"):
        w.commit(msgs)
    # the old generation is intact; nothing was deleted before renames
    assert old_part.exists()
    assert (out / "part-newrun-0.log").exists()
    monkeypatch.undo()

    # the recovery path is a fresh overwrite JOB (new run_id, new
    # staged files) — after it commits, exactly its generation remains
    retry = []
    for i in range(2):
        final = out / f"part-retry-{i}.log"
        (out / f"part-retry-{i}.log.staging").write_text(GOOD2 + "\n")
        retry.append(
            _StagedFile(staged=str(final) + ".staging", final=str(final))
        )
    w.commit(retry)
    names = sorted(_os.listdir(out))
    assert names == ["part-retry-0.log", "part-retry-1.log"]
