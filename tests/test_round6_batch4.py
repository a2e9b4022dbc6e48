"""Independent witnesses for the round-6 batch-4 analytics (drift &
robust statistics, OLAP classics, graph features, intra-doc dedup):
pure-Python recomputation from the raw parquet rows (via DuckDB reads,
no SQL math), so a shared Spark/oracle formula slip cannot
self-certify."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES

from .conftest import SF_DIR


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, lang, n_chars, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()


def _events():
    return duckdb.sql(
        f"SELECT event_id, ts, user_id, event_type, value "
        f"FROM '{SF_DIR}/events.parquet'"
    ).fetchall()


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split(" ") if t]


def test_rank_sum_matches_python(spark):
    lengths = [(n, lang == "en") for _d, lang, n, _t in _docs()]
    xs = sorted({n for n, _ in lengths})
    below = {}
    run = 0
    cnt = Counter(n for n, _ in lengths)
    for v in xs:
        below[v] = run
        run += cnt[v]
    two_r = sum(
        2 * below[n] + cnt[n] + 1 for n, is_a in lengths if is_a
    )
    n_a = sum(1 for _n, is_a in lengths if is_a)
    n_b = len(lengths) - n_a
    two_u = two_r - n_a * (n_a + 1)
    row = QUERIES["q_rank_sum"](spark, SF_DIR).collect()[0]
    assert (row.n_a, row.n_b, row.two_rank_sum_a, row.two_u_a) == (
        n_a,
        n_b,
        two_r,
        two_u,
    )
    assert abs(row.auc - two_u / (2 * n_a * n_b)) < 1e-12


def test_ks_drift_matches_python(spark):
    a = sorted(n for _d, lang, n, _t in _docs() if lang == "en")
    b = sorted(n for _d, lang, n, _t in _docs() if lang != "en")
    xs = sorted(set(a) | set(b))
    d_num = 0
    for v in xs:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        d_num = max(d_num, abs(ca * len(b) - cb * len(a)))
    row = QUERIES["q_ks_drift"](spark, SF_DIR).collect()[0]
    assert (row.n_a, row.n_b, row.d_num) == (len(a), len(b), d_num)


def test_tv_distance_matches_python(spark):
    ca: Counter = Counter()
    cb: Counter = Counter()
    for _d, lang, _n, text in _docs():
        (ca if lang == "en" else cb).update(_tokens(text))
    na, nb = sum(ca.values()), sum(cb.values())
    toks = set(ca) | set(cb)
    tv_num = sum(abs(ca[t] * nb - cb[t] * na) for t in toks)
    row = QUERIES["q_tv_distance"](spark, SF_DIR).collect()[0]
    assert (row.n_tok_a, row.n_tok_b, row.n_types, row.tv_num) == (
        na,
        nb,
        len(toks),
        tv_num,
    )
    assert abs(row.tv - tv_num / (2 * na * nb)) < 1e-12


def test_hhi_concentration_matches_python(spark):
    cust = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_nationkey FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    )
    names = dict(
        duckdb.sql(
            f"SELECT n_nationkey, n_name FROM '{SF_DIR}/nation.parquet'"
        ).fetchall()
    )
    per = Counter()
    for (ck,) in duckdb.sql(
        f"SELECT o_custkey FROM '{SF_DIR}/orders.parquet'"
    ).fetchall():
        per[(cust[ck], ck)] += 1
    by_nation: dict = defaultdict(list)
    for (nk, _ck), c in per.items():
        by_nation[nk].append(c)
    got = {
        r.n_name: (r.n_cust, r.n_orders, r.hhi_num)
        for r in QUERIES["q_hhi_concentration"](spark, SF_DIR).collect()
    }
    want = {
        names[nk]: (len(cs), sum(cs), sum(c * c for c in cs))
        for nk, cs in by_nation.items()
    }
    assert got == want


def test_target_encode_matches_python(spark):
    cust = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_mktsegment FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    )
    rows = duckdb.sql(
        f"SELECT o_custkey, o_orderpriority FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    seg_cnt: Counter = Counter()
    seg_pos: Counter = Counter()
    for ck, pri in rows:
        seg = cust[ck]
        seg_cnt[seg] += 1
        seg_pos[seg] += 1 if pri.startswith("1") else 0
    g_tot = sum(seg_cnt.values())
    g_pos = sum(seg_pos.values())
    got = {
        r.segment: (r.cnt, r.pos, r.enc_num, r.enc_den)
        for r in QUERIES["q_target_encode"](spark, SF_DIR).collect()
    }
    want = {
        s: (
            seg_cnt[s],
            seg_pos[s],
            seg_pos[s] * g_tot + 10 * g_pos,
            g_tot * (seg_cnt[s] + 10),
        )
        for s in seg_cnt
    }
    assert got == want


def test_trend_ols_matches_python(spark):
    import math

    evs = _events()
    min_ep = min(math.floor(ts.timestamp()) for _e, ts, _u, _t, _v in evs)
    stats: dict = defaultdict(lambda: [0, 0, 0, 0, 0])
    for _eid, ts, _uid, typ, val in evs:
        x = (math.floor(ts.timestamp()) - min_ep) // 60
        y = math.floor(val * 100.0 + 0.5)
        s = stats[typ]
        s[0] += 1
        s[1] += x
        s[2] += y
        s[3] += x * y
        s[4] += x * x
    got = {
        r.event_type: (r.n, r.slope_num, r.slope_den)
        for r in QUERIES["q_trend_ols"](spark, SF_DIR).collect()
    }
    want = {
        t: (n, n * sxy - sx * sy, n * sxx - sx * sx)
        for t, (n, sx, sy, sxy, sxx) in stats.items()
    }
    assert got == want


def test_ohlc_bars_matches_python(spark):
    bars: dict = {}
    for eid, ts, _uid, typ, val in _events():
        key = (typ, ts.strftime("%Y-%m-%d %H"))
        b = bars.setdefault(key, [])
        b.append((ts, eid, val))
    got = {
        (r.event_type, r.bar): (r.n, r.open, r.high, r.low, r.close)
        for r in QUERIES["q_ohlc_bars"](spark, SF_DIR).collect()
    }
    want = {}
    for key, rows in bars.items():
        rows.sort()
        vals = [v for _t, _e, v in rows]
        want[key] = (
            len(rows),
            rows[0][2],
            max(vals),
            min(vals),
            rows[-1][2],
        )
    assert got == want


def test_abc_pareto_matches_python(spark):
    import math

    rev: Counter = Counter()
    for pk, ep, disc in duckdb.sql(
        f"SELECT l_partkey, l_extendedprice, l_discount "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchall():
        rev[pk] += math.floor(ep * (1.0 - disc) * 100.0 + 0.5)
    total = sum(rev.values())
    cum = 0
    cls: Counter = Counter()
    cents: Counter = Counter()
    for pk, c in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += c
        k = "A" if cum * 5 <= total * 4 else (
            "B" if cum * 20 <= total * 19 else "C"
        )
        cls[k] += 1
        cents[k] += c
    got = {
        r.abc_class: (r.n_parts, r.class_cents)
        for r in QUERIES["q_abc_pareto"](spark, SF_DIR).collect()
    }
    assert got == {k: (cls[k], cents[k]) for k in cls}


def test_bitmap_rollup_matches_python(spark):
    masks: dict = defaultdict(int)
    for _eid, ts, uid, _typ, _val in _events():
        masks[uid] |= 1 << (ts.timetuple().tm_yday % 60)
    hist: Counter = Counter()
    union: dict = defaultdict(int)
    for _uid, m in masks.items():
        k = bin(m).count("1")
        hist[k] += 1
        union[k] |= m
    got = {
        r.active_days: (r.n_users, r.union_mask)
        for r in QUERIES["q_bitmap_rollup"](spark, SF_DIR).collect()
    }
    assert got == {k: (hist[k], union[k]) for k in hist}


def test_node_jaccard_matches_python(spark):
    edges = set()
    for eid, _ts, uid, _typ, _val in _events():
        x, y = uid % 41, (2 * uid + eid) % 41
        if x != y:
            edges.add((min(x, y), max(x, y)))
    nbrs: dict = defaultdict(set)
    for x, y in edges:
        nbrs[x].add(y)
        nbrs[y].add(x)
    scored = []
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for c in nodes[i + 1 :]:
            if c in nbrs[a]:
                continue
            common = len(nbrs[a] & nbrs[c])
            if not common:
                continue
            uni = len(nbrs[a]) + len(nbrs[c]) - common
            scored.append(
                (-(common * 1000000 // uni), a, c, common, uni)
            )
    scored.sort()
    want = [
        (a, c, common, len(nbrs[a]), len(nbrs[c]), uni, -negscore)
        for negscore, a, c, common, uni in scored[:20]
    ]
    got = [
        (r.a, r.c, r.common, r.deg_a, r.deg_c, r.uni, r.score_micro)
        for r in QUERIES["q_node_jaccard"](spark, SF_DIR).collect()
    ]
    assert got == want


def test_intradoc_dedup_matches_python(spark):
    want = {}
    for doc_id, _lang, _n, text in _docs():
        tk = _tokens(text)
        seen = set()
        kept = []
        for t in tk:
            if t not in seen:
                seen.add(t)
                kept.append(t)
        fp = hashlib.md5(" ".join(kept).encode()).hexdigest()
        want[doc_id] = (len(tk), len(kept), fp)
    got = {
        r.doc_id: (r.n_tok, r.n_kept, r.fp)
        for r in QUERIES["q_intradoc_dedup"](spark, SF_DIR).collect()
    }
    assert got == want
