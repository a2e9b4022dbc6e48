"""Deduplication operators over the ``documents`` table (SURVEY §2.4).

Not in the reference (it has only a distinct() over partition keys,
main.go:169-172); these are the LLM-training-pipeline extensions, built
Spark-first:

- **exact**: hash-groupBy on content — one shuffle on the text hash.
- **MinHash + LSH**: shingle → P minhashes → B bands → band-bucket
  self-join. The join key is (band index, band signature), so candidate
  generation is an equi-join that scales as Σ bucket² instead of n² —
  the standard LSH trick; at 100 TB the band join shuffles only
  (doc_id, band_key) pairs, never the documents.
- **SimHash**: 16-bit signature via per-bit majority vote of token hashes;
  exact-signature buckets (or low Hamming distance) are candidates.
- **n-gram Jaccard**: exact verification metric, used post-LSH.

Everything is built from codegen'd higher-order functions (transform /
aggregate / filter over arrays) — no Python UDFs — and every hash is
``md5`` over an explicit string, which DuckDB computes identically, so each
operator has an exact SQL oracle. Numeric outputs are int ratios divided in
double (deterministic IEEE), never multi-row double sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MINHASH_PERMS = 16
MINHASH_BANDS = 4
MINHASH_ROWS_PER_BAND = MINHASH_PERMS // MINHASH_BANDS
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 16

# ---------------------------------------------------------------- tokens

# Spark SQL expression fragments (Catalyst lambdas). The DuckDB twins live
# in the *_SQL constants below; parameters are shared module constants so
# the two dialects cannot drift independently.
TOKENS_EXPR = "filter(split(lower({col}), ' '), t -> t != '')"


def tokens_col(col: str = "text") -> F.Column:
    return F.expr(TOKENS_EXPR.format(col=col))


def shingles_expr(tokens: str, k: int = SHINGLE_K) -> str:
    """k-token shingles as strings; empty array when the doc is too short."""
    return (
        f"CASE WHEN size({tokens}) >= {k} THEN "
        f"transform(sequence(0, size({tokens}) - {k}), "
        f"i -> array_join(slice({tokens}, i + 1, {k}), ' ')) "
        f"ELSE array() END"
    )


def minhash_expr(shingles: str, perms: int = MINHASH_PERMS) -> str:
    """P seeded minhashes: min over shingles of md5('{seed}|' || shingle)."""
    return (
        f"transform(sequence(0, {perms - 1}), "
        f"j -> array_min(transform({shingles}, s -> md5(concat(cast(j as string), '|', s)))))"
    )


def bands_expr(mh: str, bands: int = MINHASH_BANDS, rows: int = MINHASH_ROWS_PER_BAND) -> str:
    """Band keys '{band}#{sig}': docs sharing any key are candidates."""
    return (
        f"transform(sequence(0, {bands - 1}), "
        f"b -> concat(cast(b as string), '#', "
        f"array_join(slice({mh}, b * {rows} + 1, {rows}), '|')))"
    )


def shingled(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    toks = TOKENS_EXPR.format(col=text_col)
    return documents.select(
        F.col(id_col),
        F.expr(f"array_distinct({shingles_expr(toks)})").alias("sh"),
    ).filter(F.expr("size(sh) > 0"))


# ---------------------------------------------------------------- operators


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact content dedup: one shuffle on text, deterministic keeper.

    Returns one row per distinct text: the kept doc_id (min), the copy
    count, and the content hash. At 100 TB you'd group on
    ``md5(text)`` instead of the full text to shrink the shuffle key;
    the md5 column here is that key, kept visible.
    """
    return (
        documents.groupBy(F.md5(F.col("text")).alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_doc_id", "content_md5", "n_copies")
    )


def minhash_lsh_pairs(documents: DataFrame) -> DataFrame:
    """Near-duplicate pairs via MinHash+LSH, verified with exact Jaccard.

    shingle(k=3) → 16 minhashes → 4 bands × 4 rows → band equi-join →
    exact Jaccard on the shingle sets → threshold. The band join is the
    only shuffle that grows with candidate count; the Jaccard join ships
    shingle sets only for surviving candidates.
    """
    sigs = shingled(documents).withColumn("mh", F.expr(minhash_expr("sh")))
    bands = sigs.select(
        "doc_id", F.explode(F.expr(bands_expr("mh"))).alias("band")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    scored = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", F.expr("size(array_intersect(sh_a, sh_b))"))
        .withColumn("uni", F.expr("size(sh_a) + size(sh_b) - inter"))
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("uni"))
    )
    return scored.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", "jaccard"
    )


def _simhash_bit_expr(tokens: str, bit: int) -> str:
    """Majority vote of bit ``bit`` of md5(token) over distinct tokens.

    The nibble is recovered portably as instr('0123456789abcdef', hex_char)-1
    (strpos in DuckDB); vote is Σ (2·bit − 1), sign >= 0 → 1.
    """
    nibble_pos = bit // 4 + 1  # which hex char of the md5
    bit_in_nibble = bit % 4
    nib = f"(instr('0123456789abcdef', substring(md5(t), {nibble_pos}, 1)) - 1)"
    vote = (
        f"aggregate({tokens}, cast(0 as bigint), "
        f"(acc, t) -> acc + (((({nib}) div {2 ** bit_in_nibble}) % 2) * 2 - 1))"
    )
    return f"(CASE WHEN ({vote}) >= 0 THEN {2 ** bit} ELSE 0 END)"


def simhash_expr(tokens: str, bits: int = SIMHASH_BITS) -> str:
    return " + ".join(_simhash_bit_expr(tokens, i) for i in range(bits))


def simhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash16) — the signature table.

    Candidate near-dups are equal (or Hamming-close) signatures; at scale
    you groupBy the signature (one shuffle of 2-tuples) rather than
    pairing all docs.
    """
    toks = f"array_distinct({TOKENS_EXPR.format(col='text')})"
    return documents.select(
        "doc_id", F.expr(simhash_expr(toks)).cast("int").alias("simhash")
    )


def ngram_jaccard_pairs(documents: DataFrame, max_id: int = 200) -> DataFrame:
    """Exact token-3-gram Jaccard over a bounded id range (all-pairs).

    The quadratic all-pairs form is the *verification* kernel; production
    candidate generation is :func:`minhash_lsh_pairs`. ``max_id`` bounds the
    oracle-checkable form.
    """
    docs = documents.filter(F.col("doc_id") < max_id)
    sigs = shingled(docs)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = sa.join(sb, F.col("doc_a") < F.col("doc_b"))
    scored = (
        pairs.withColumn("inter", F.expr("size(array_intersect(sh_a, sh_b))"))
        .withColumn("uni", F.expr("size(sh_a) + size(sh_b) - inter"))
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("uni"))
    )
    return scored.filter(F.col("jaccard") >= 0.2).select("doc_a", "doc_b", "jaccard")


def keep_first_dedup(df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """Deterministic 'keep first' dedup: row_number over an explicit total
    order instead of ``dropDuplicates`` (whose survivor is partition-order
    dependent and would never hash-match an oracle)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
