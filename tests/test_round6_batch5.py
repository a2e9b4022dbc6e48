"""Independent witnesses for the round-6 batch-5 analytics (lagged
cross-correlation, FK integrity, item-item CF, CEP pattern match,
calibration, BPE merge counts, trigram LM, inverted index, temporal
precedence, Simpson diversity): pure-Python recomputation from the raw
parquet rows (via DuckDB reads, no SQL math), so a shared Spark/oracle
formula slip cannot self-certify."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import datetime

import duckdb

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES

from .conftest import SF_DIR

_EPOCH0 = datetime(1970, 1, 1)


def _us(ts: datetime) -> int:
    d = ts - _EPOCH0
    return (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds


def _events():
    return duckdb.sql(
        f"SELECT event_id, ts, user_id, event_type, value "
        f"FROM '{SF_DIR}/events.parquet'"
    ).fetchall()


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split(" ") if t]


def test_cross_corr_matches_python(spark):
    hourly: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for _e, ts, _u, typ, _v in _events():
        # every event hour is a series point (the query's hourly agg
        # groups ALL events, so non-click/purchase hours contribute 0s)
        b = hourly[_us(ts) // 3_600_000_000]
        if typ == "click":
            b[0] += 1
        elif typ == "purchase":
            b[1] += 1
    rows = QUERIES["q_cross_corr"](spark, SF_DIR).collect()
    assert [r.lag for r in rows] == [0, 1, 2, 3]
    for r in rows:
        pairs = [
            (hourly[h][0], hourly[h + r.lag][1])
            for h in hourly
            if h + r.lag in hourly
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        num = n * sxy - sx * sy
        den_x = n * sxx - sx * sx
        den_y = n * syy - sy * sy
        assert (r.n, r.num, r.den_x, r.den_y) == (n, num, den_x, den_y)
        assert abs(r.corr - num / (math.sqrt(den_x) * math.sqrt(den_y))) < 1e-12


def test_ref_integrity_matches_python(spark):
    def col(table, c):
        return [
            v
            for (v,) in duckdb.sql(
                f"SELECT {c} FROM '{SF_DIR}/{table}.parquet'"
            ).fetchall()
        ]

    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    rows = {r.edge: r for r in QUERIES["q_ref_integrity"](spark, SF_DIR).collect()}
    assert len(rows) == 5
    for child, key, parent, pkey in edges:
        ck = Counter(col(child, key))
        pk = set(col(parent, pkey))
        orphans = {k: c for k, c in ck.items() if k not in pk}
        r = rows[f"{child}.{key}"]
        assert (r.child_rows, r.child_keys, r.orphan_keys, r.orphan_rows) == (
            sum(ck.values()),
            len(ck),
            len(orphans),
            sum(orphans.values()),
        )


def test_itemcf_matches_python(spark):
    li = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    baskets: dict[int, list[int]] = defaultdict(list)
    freq: Counter = Counter()
    for ok, pk in li:
        baskets[ok].append(pk)
        freq[pk] += 1
    co: Counter = Counter()
    for items in baskets.values():
        items = sorted(items)
        for i, a in enumerate(items):
            for b in items[i + 1 :]:
                co[(a, b)] += 1
    scored = sorted(
        (
            -((c * c * 1_000_000) // (freq[a] * freq[b])),
            a,
            b,
            c,
        )
        for (a, b), c in co.items()
    )[:15]
    rows = QUERIES["q_itemcf"](spark, SF_DIR).collect()
    assert len(rows) == 15
    for r, (neg_micro, a, b, c) in zip(rows, scored):
        assert (r.item_a, r.item_b, r.co_cnt, r.n_a, r.n_b) == (
            a,
            b,
            c,
            freq[a],
            freq[b],
        )
        assert r.cos2_micro == -neg_micro
        assert abs(
            r.cosine - c / (math.sqrt(freq[a]) * math.sqrt(freq[b]))
        ) < 1e-12


def test_cep_pattern_matches_python(spark):
    per_user: dict[int, list] = defaultdict(list)
    for eid, ts, uid, typ, val in _events():
        per_user[uid].append((_us(ts), eid, typ, val))
    n_peaks: Counter = Counter()
    users: dict[str, set] = defaultdict(set)
    for uid, seq in per_user.items():
        seq.sort()
        for i in range(2, len(seq) - 1):
            v2, v1, v0, vn = seq[i - 2][3], seq[i - 1][3], seq[i][3], seq[i + 1][3]
            if v2 < v1 < v0 and vn < v0:
                n_peaks[seq[i][2]] += 1
                users[seq[i][2]].add(uid)
    rows = QUERIES["q_cep_pattern"](spark, SF_DIR).collect()
    got = {r.event_type: (r.n_peaks, r.n_users) for r in rows}
    assert got == {t: (n_peaks[t], len(users[t])) for t in n_peaks}


def test_calibration_matches_python(spark):
    bins: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for eid, _ts, _u, typ, _v in _events():
        p100 = eid % 100
        y = 1 if typ == "purchase" else 0
        b = bins[p100 // 10]
        b[0] += 1
        b[1] += y
        b[2] += p100
        b[3] += (p100 - 100 * y) ** 2
    rows = QUERIES["q_calibration"](spark, SF_DIR).collect()
    assert [r.bin for r in rows] == sorted(bins)
    for r in rows:
        n, pos, sp, brier = bins[r.bin]
        assert (r.n, r.positives, r.mean_pred_micro, r.brier_num) == (
            n,
            pos,
            (sp * 10_000) // n,
            brier,
        )
        assert abs(r.obs_rate - pos / n) < 1e-12


def test_bpe_merge_matches_python(spark):
    tok_freq: Counter = Counter()
    for _d, _s, text in _docs():
        tok_freq.update(_tokens(text))
    pair_cnt: Counter = Counter()
    for tok, freq in tok_freq.items():
        for i in range(len(tok) - 1):
            pair_cnt[tok[i : i + 2]] += freq
    expect = sorted(((-c, p) for p, c in pair_cnt.items()))[:20]
    rows = QUERIES["q_bpe_merge"](spark, SF_DIR).collect()
    assert [(r.pair, r.merge_count) for r in rows] == [
        (p, -nc) for nc, p in expect
    ]


def test_ngram_lm_matches_python(spark):
    cnt: Counter = Counter()
    for _d, _s, text in _docs():
        toks = _tokens(text)
        for i in range(len(toks) - 2):
            cnt[(toks[i] + " " + toks[i + 1], toks[i + 2])] += 1
    totals: Counter = Counter()
    for (ctx, _n), c in cnt.items():
        totals[ctx] += c
    best: dict[str, tuple] = {}
    for (ctx, nxt), c in cnt.items():
        cur = best.get(ctx)
        if cur is None or (-c, nxt) < (-cur[1], cur[0]):
            best[ctx] = (nxt, c)
    expect = sorted(
        (
            (-totals[ctx], ctx, best[ctx][0], best[ctx][1])
            for ctx in totals
            if totals[ctx] >= 5
        )
    )[:20]
    rows = QUERIES["q_ngram_lm"](spark, SF_DIR).collect()
    assert [(r.context, r.ctx_total, r.top_next, r.top_cnt) for r in rows] == [
        (ctx, -nt, nxt, c) for nt, ctx, nxt, c in expect
    ]
    for r in rows:
        assert abs(r.p_top - r.top_cnt / r.ctx_total) < 1e-12


def _varint(gap: int) -> int:
    if gap < 128:
        return 1
    if gap < 16384:
        return 2
    if gap < 2097152:
        return 3
    return 4


def test_inverted_index_matches_python(spark):
    tf: Counter = Counter()
    for d, _s, text in _docs():
        for t in _tokens(text):
            tf[(t, d)] += 1
    postings: dict[str, list[int]] = defaultdict(list)
    tf_tot: Counter = Counter()
    for (t, d), c in tf.items():
        postings[t].append(d)
        tf_tot[t] += c
    expect = []
    for t, ds in postings.items():
        ds.sort()
        pbytes = _varint(ds[0]) + sum(
            _varint(b - a) for a, b in zip(ds, ds[1:])
        )
        expect.append((-len(ds), t, tf_tot[t], pbytes))
    expect.sort()
    rows = QUERIES["q_inverted_index"](spark, SF_DIR).collect()
    assert [(r.tok, r.df, r.tf_total, r.postings_bytes) for r in rows] == [
        (t, -nd, tt, pb) for nd, t, tt, pb in expect[:20]
    ]


def test_event_precedence_matches_python(spark):
    per_user: dict[int, list] = defaultdict(list)
    for _e, ts, uid, typ, _v in _events():
        per_user[uid].append((_us(ts), typ))
    cnt: Counter = Counter()
    users: dict[tuple, set] = defaultdict(set)
    for uid, seq in per_user.items():
        for ua, ta in seq:
            for ub, tb in seq:
                if ua < ub <= ua + 3_600_000_000:
                    cnt[(ta, tb)] += 1
                    users[(ta, tb)].add(uid)
    rows = QUERIES["q_event_precedence"](spark, SF_DIR).collect()
    got = {(r.type_a, r.type_b): (r.pair_cnt, r.n_users) for r in rows}
    assert got == {k: (cnt[k], len(users[k])) for k in cnt}


def test_simpson_diversity_matches_python(spark):
    per_src: dict[str, Counter] = defaultdict(Counter)
    for _d, src, text in _docs():
        per_src[src].update(_tokens(text))
    rows = QUERIES["q_simpson_diversity"](spark, SF_DIR).collect()
    assert [r.source for r in rows] == sorted(per_src)
    for r in rows:
        c = per_src[r.source]
        n = sum(c.values())
        num = sum(v * (v - 1) for v in c.values())
        assert (r.n_tokens, r.n_types, r.simpson_num, r.simpson_den) == (
            n,
            len(c),
            num,
            n * (n - 1),
        )
        assert abs(r.simpson - num / (n * (n - 1))) < 1e-12
