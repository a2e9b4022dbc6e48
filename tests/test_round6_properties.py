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


def test_ngram_novelty_matches_python(spark):
    # every distinct corpus shingle is novel exactly once (in its
    # min-doc_id document), so per-source counts reconstruct from raw
    # rows; also the cross-source totals tie out to global invariants
    SHINGLE_K = 3
    first_doc: dict[str, int] = {}
    doc_rows: list[tuple[int, str, set]] = []
    for doc_id, source, _lang, text in sorted(_docs()):
        tk = _tokens(text)
        sh = {
            " ".join(tk[i : i + SHINGLE_K])
            for i in range(len(tk) - SHINGLE_K + 1)
        }
        doc_rows.append((doc_id, source, sh))
        for s in sh:
            first_doc.setdefault(s, doc_id)
    want: dict[str, list[int]] = {}
    for doc_id, source, sh in doc_rows:
        acc = want.setdefault(source, [0, 0])
        acc[0] += len(sh)
        acc[1] += sum(1 for s in sh if first_doc[s] == doc_id)
    rows = QUERIES["q_ngram_novelty"](spark, SF_DIR).collect()
    got = {r.source: [r.n_shingle_rows, r.n_novel] for r in rows}
    assert got == want
    assert sum(v[1] for v in got.values()) == len(first_doc)


def test_shard_assign_matches_python(spark):
    import hashlib

    per_shard: dict[int, list[tuple[str, int, int]]] = {}
    chars = {}
    for doc_id, _source, _lang, text in _docs():
        hx = hashlib.md5(str(doc_id).encode()).hexdigest()
        shard = int(hx[:8], 16) % 16
        per_shard.setdefault(shard, []).append((hx, doc_id))
        chars[doc_id] = None
    n_chars = dict(
        duckdb.sql(
            f"SELECT doc_id, n_chars FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    want = {}
    for shard, members in per_shard.items():
        members.sort()  # (hex, doc_id) — the engine's within-shard order
        checksum = sum(
            pos * doc_id for pos, (_hx, doc_id) in enumerate(members, 1)
        )
        want[shard] = (
            len(members),
            sum(n_chars[d] for _h, d in members),
            checksum,
        )
    rows = QUERIES["q_shard_assign"](spark, SF_DIR).collect()
    got = {r.shard: (r.n_docs, r.n_chars_total, r.order_checksum) for r in rows}
    assert got == want


def test_embedding_qc_matches_python(spark):
    import math as _m

    vecs = duckdb.sql(
        f"SELECT label, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    want: dict[int, list] = {}
    for label, e in vecs:
        acc = want.setdefault(label, [0, None, None, 0, 0, None, None])
        acc[0] += 1
        acc[1] = len(e) if acc[1] is None else min(acc[1], len(e))
        acc[2] = len(e) if acc[2] is None else max(acc[2], len(e))
        acc[3] += int(all(x == 0 for x in e))
        acc[4] += int(any(_m.isnan(x) or _m.isinf(x) for x in e))
        lo, hi = min(e), max(e)
        acc[5] = lo if acc[5] is None else min(acc[5], lo)
        acc[6] = hi if acc[6] is None else max(acc[6], hi)
    rows = QUERIES["q_embedding_qc"](spark, SF_DIR).collect()
    got = {
        r.label: [
            r.n_vecs, r.min_dim, r.max_dim, r.n_zero_vecs,
            r.n_nonfinite_vecs, r.min_val, r.max_val,
        ]
        for r in rows
    }
    assert got == want


def test_vocab_coverage_and_stopwords_match_python(spark):
    occ: list[tuple[str, str]] = []
    by_doc: list[set] = []
    for _doc_id, source, _lang, text in _docs():
        tk = _tokens(text)
        occ.extend((source, t) for t in tk)
        by_doc.append(set(tk))
    freq = Counter(t for _, t in occ)
    vocab = {
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    }
    want_cov = {}
    for source in {s for s, _ in occ}:
        toks = [t for s, t in occ if s == source]
        oov = sum(1 for t in toks if t not in vocab)
        want_cov[source] = (len(toks), oov)
    rows = QUERIES["q_vocab_coverage"](spark, SF_DIR).collect()
    got = {r.source: (r.n_tokens, r.n_oov) for r in rows}
    assert got == want_cov

    df = Counter(t for sh in by_doc for t in sh)
    want_top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = QUERIES["q_doc_stopwords"](spark, SF_DIR).collect()
    got_top = sorted(
        ((r.t, r.df) for r in rows), key=lambda kv: (-kv[1], kv[0])
    )
    assert got_top == want_top


def test_bm25_matches_python(spark):
    from aws_vpcflowlogs_parquet_spark.plans.catalog import BM25_TERMS

    docs = [(d, _tokens(t)) for d, _s, _l, t in _docs()]
    n_docs = len(docs)
    total_tok = sum(len(tk) for _d, tk in docs)
    avgdl = float(total_tok) / float(n_docs)
    df = Counter()
    for _d, tk in docs:
        for term in set(tk) & set(BM25_TERMS):
            df[term] += 1
    scores = {}
    for d, tk in docs:
        tf = Counter(t for t in tk if t in BM25_TERMS)
        micro = 0
        for term, f in tf.items():
            idf = float((n_docs // df[term]).bit_length() - 1)
            s = idf * (
                (float(f) * 2.25)
                / (float(f) + 1.25 * (0.25 + 0.75 * (float(len(tk)) / avgdl)))
            )
            micro += math.floor(s * 1_000_000.0 + 0.5)
        if micro or tf:
            scores[d] = micro
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = QUERIES["q_bm25_topk"](spark, SF_DIR).collect()
    got = [(r.doc_id, r.score_micro) for r in rows]
    assert got == want


def test_graph_2hop_matches_python(spark):
    ev = duckdb.sql(
        f"SELECT user_id, event_id FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    edges = set()
    for u, e in ev:
        a, b = u % 41, (2 * u + e) % 41
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for node, nbrs in adj.items():
        two = set()
        for m in nbrs:
            two |= adj[m]
        two -= nbrs
        two.discard(node)
        if two:
            want[node] = len(two)
    rows = QUERIES["q_graph_2hop"](spark, SF_DIR).collect()
    got = {r.node: r.n_two_hop for r in rows}
    assert got == want


def test_label_noise_matches_python(spark):
    vecs = duckdb.sql(
        f"SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) "
        f"FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    import math as _m

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = _m.sqrt(sum(x * x for x in a))
        nb = _m.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    by_id = {v: (l, e) for v, l, e in vecs}
    flagged = Counter()
    checked = Counter()
    for qid, (qlabel, qv) in by_id.items():
        if qid % 5 != 0:
            continue
        sims = sorted(
            ((-cos(qv, e), v) for v, (_l, e) in by_id.items() if v != qid)
        )[:5]
        votes = Counter(by_id[v][0] for _s, v in sims)
        voted = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        checked[qlabel] += 1
        flagged[qlabel] += int(voted != qlabel)
    rows = QUERIES["q_label_noise"](spark, SF_DIR).collect()
    got = {r.label: (r.n_checked, r.n_flagged) for r in rows}
    want = {l: (checked[l], flagged[l]) for l in checked}
    assert got == want
