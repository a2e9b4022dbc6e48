"""VPC Flow Log v2 text source: gzip lines → typed records.

Reference dataflow (SURVEY §2.1 R1, R4-R9): ``rlogs.Read`` streams an S3
object, gunzips, splits into lines, and a per-line parser
(flowlog.go:33-98) tokenizes on a single space, rejects lines that aren't
exactly 14 tokens, silently skips the header row, hard-errors on version≠2,
and casts numerics with a silent-zero default.

Spark-first re-expression: ``spark.read.text`` (transparently gunzips *.gz,
splits lines, parallelizes across files/blocks — the whole of rlogs'
contract) followed by declarative column expressions. All of it runs inside
WholeStageCodegen; nothing here is a UDF, so the same plan handles 100 TB of
log text limited only by executor count.

Strictness: the reference aborts the whole conversion on the first parse
error (convert.go:48-50). Batch mode exposes that as ``strict=True`` (count
violations, raise); streaming uses the lenient path (malformed lines
dropped, counted via an ``_is_valid`` flag) since aborting a long-lived
query per bad line is not a streaming posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.casts import zero_default_cast
from ..schema import FLOW_COLUMNS, NUM_RAW_TOKENS, SUPPORTED_VERSION


class FlowLogParseError(ValueError):
    """Strict-mode analogue of the reference's abort-on-error (convert.go:48-50)."""


def tokenize(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Split on a single space (flowlog.go:36) and attach validity flags."""
    toks = F.split(F.col(value_col), " ")
    return (
        df.withColumn("_toks", toks)
        .withColumn("_n_toks", F.size("_toks"))
        # header: first token is the literal 'version' (flowlog.go:42-44).
        # The reference's arity check runs BEFORE its header skip
        # (flowlog.go:36-44), so a header row with arity != 14 is
        # malformed, not a skippable header — the arity conjunct keeps
        # this path in lockstep with the flowlog DataSource (ADVICE r8).
        .withColumn(
            "_is_header",
            (F.col("_n_toks") == NUM_RAW_TOKENS)
            & (F.col("_toks")[0] == F.lit("version")),
        )
        .withColumn(
            "_is_valid",
            (F.col("_n_toks") == NUM_RAW_TOKENS)
            & ~F.col("_is_header")
            & (F.col("_toks")[0] == F.lit(str(SUPPORTED_VERSION))),
        )
    )


def typed_projection(df: DataFrame) -> DataFrame:
    """14 tokens → typed columns (flowlog.go:50-90 semantics).

    Numerics use the zero-default cast (``-`` → 0, SURVEY §1.2); strings
    pass through. Adds the derived event-time column (flowlog.go:86,92-97):
    ``start_time = to_timestamp(start_ts)`` in UTC.
    """
    cols = []
    for name, (idx, dtype) in FLOW_COLUMNS.items():
        tok = F.col("_toks")[idx]
        if dtype.typeName() == "string":
            cols.append(tok.alias(name))
        else:
            cols.append(zero_default_cast(tok, dtype.simpleString()).alias(name))
    out = df.select(*cols, "_is_valid")
    return out.withColumn(
        "start_time", F.to_timestamp(F.from_unixtime(F.col("start_ts")))
    )


def parse_flowlog_lines(
    lines: DataFrame, value_col: str = "value", strict: bool = False
) -> DataFrame:
    """Lines DataFrame → typed FlowLog DataFrame.

    With ``strict`` the count of malformed (non-header) lines is checked
    eagerly and any violation raises :class:`FlowLogParseError` — the whole
    input fails, matching flowlog.go:36-48 + convert.go:48-50. Lenient mode
    simply filters them out.
    """
    tok = tokenize(lines, value_col)
    if strict:
        bad = tok.filter(~F.col("_is_valid") & ~F.col("_is_header")).limit(1)
        row = bad.select(value_col).collect()
        if row:
            raise FlowLogParseError(f"malformed flow log line: {row[0][0]!r}")
    parsed = typed_projection(tok.filter(F.col("_is_valid")))
    return parsed.drop("_is_valid")


def parse_flowlog_lines_observed(
    lines: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, Observation]:
    """Lines → typed DataFrame plus an :class:`Observation` for single-pass
    strict validation.

    The eager strict probe in :func:`parse_flowlog_lines` costs a second
    scan of the input — at 100 TB that doubles ingest I/O. Here the
    malformed-line count (and one sample line for the error message) rides
    the main job as a CollectMetrics node placed *before* the validity
    filter, so one scan produces both the output and the verdict. The
    caller runs its action, then checks ``obs.get["n_bad"]`` and raises —
    see operators/convert.py convert_flowlogs (reference abort-on-error:
    convert.go:48-50).
    """
    obs = Observation()
    bad = ~F.col("_is_valid") & ~F.col("_is_header")
    tok = tokenize(lines, value_col).observe(
        obs,
        F.sum(bad.cast("long")).alias("n_bad"),
        F.max(F.when(bad, F.col(value_col))).alias("sample_bad"),
    )
    parsed = typed_projection(tok.filter(F.col("_is_valid"))).drop("_is_valid")
    return parsed, obs


def raise_if_malformed(obs: Observation) -> None:
    """Post-action half of the single-pass strict contract."""
    metrics = obs.get
    if metrics["n_bad"]:
        raise FlowLogParseError(
            f"{metrics['n_bad']} malformed flow log line(s); "
            f"sample: {metrics['sample_bad']!r}"
        )


def read_flowlog_text(
    spark: SparkSession, paths: list[str] | str, strict: bool = False
) -> DataFrame:
    """Batch entry: file paths (plain or .gz) → typed FlowLog DataFrame."""
    if isinstance(paths, str):
        paths = [paths]
    return parse_flowlog_lines(spark.read.text(paths), strict=strict)
