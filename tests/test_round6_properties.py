"""Independent witnesses for the round-6 batch-2 analytics: pure-Python
recomputation from the raw parquet rows (via DuckDB reads, no SQL math),
so a shared Spark/oracle formula slip cannot self-certify."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES

from .conftest import SF_DIR


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, lang, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split(" ") if t]


def test_unigram_surprisal_matches_python(spark):
    freq: Counter = Counter()
    per_doc = []
    for _doc_id, source, _lang, text in _docs():
        tk = _tokens(text)
        freq.update(tk)
        per_doc.append((source, tk))
    n_total = sum(freq.values())
    hist: Counter = Counter()
    tok_sum: Counter = Counter()
    for source, tk in per_doc:
        if not tk:
            continue
        s = sum((n_total // freq[t]).bit_length() - 1 for t in tk)
        b = s // len(tk)
        hist[(source, b)] += 1
        tok_sum[(source, b)] += len(tk)
    rows = QUERIES["q_unigram_surprisal"](spark, SF_DIR).collect()
    got = {(r.source, r.bits_per_token): (r.n_docs, r.n_tokens) for r in rows}
    want = {k: (hist[k], tok_sum[k]) for k in hist}
    assert got == want


def test_judge_kappa_matches_python(spark):
    from aws_vpcflowlogs_parquet_spark.operators.text import LANG_MARKERS

    langs = list(LANG_MARKERS)
    gold, pred = [], []
    for _doc_id, _source, lang, text in _docs():
        tk = _tokens(text)
        scores = {
            lg: sum(1 for t in tk if t in set(LANG_MARKERS[lg])) for lg in langs
        }
        best = max(scores.values())
        # the engine's deterministic argmax: first lang in declaration
        # order hitting the max (CASE WHEN chain)
        p = next(lg for lg in langs if scores[lg] == best)
        gold.append(lang)
        pred.append(p)
    n = len(gold)
    agree = sum(1 for a, b in zip(gold, pred) if a == b)
    gc, pc = Counter(gold), Counter(pred)
    pe_num = sum(gc[c] * pc.get(c, 0) for c in set(gc) | set(pc))
    row = QUERIES["q_judge_kappa"](spark, SF_DIR).collect()[0]
    assert (row.n_total, row.n_agree, row.pe_num) == (n, agree, pe_num)
    assert math.isclose(row.kappa, (n * agree - pe_num) / (n * n - pe_num))
    assert -1.0 <= row.kappa <= 1.0


def test_source_drift_matches_python(spark):
    occ: list[tuple[str, str]] = []
    for _doc_id, source, _lang, text in _docs():
        occ.extend((source, t) for t in _tokens(text))
    freq: Counter = Counter(t for _, t in occ)
    vocab = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    n_corpus = len(occ)
    n_src: Counter = Counter(s for s, _ in occ)
    obs: Counter = Counter((s, t) for s, t in occ)
    want = {}
    for s in n_src:
        total_q = 0
        for t, c in vocab:
            e = n_src[s] * float(c) / n_corpus
            d = obs.get((s, t), 0) - e
            total_q += math.floor(d * d / e * 1_000_000.0 + 0.5)
        want[s] = (n_src[s], total_q)
    rows = QUERIES["q_source_drift"](spark, SF_DIR).collect()
    got = {r.source: (r.n_tokens, r.chi2_micro) for r in rows}
    assert got == want
