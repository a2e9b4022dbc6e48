"""Independent witnesses for the round-6 batch-6 analytics (Zipf check,
graph mixing metrics, join-key skew, cardinality q-error, SLO burn,
price-quantity correlation, hazard table, source similarity,
dispersion): pure-Python recomputation from the raw parquet rows (via
DuckDB reads, no SQL math), so a shared Spark/oracle formula slip
cannot self-certify."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import datetime

import duckdb

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES

from .conftest import SF_DIR

_EPOCH0 = datetime(1970, 1, 1)


def _sec(ts: datetime) -> int:
    d = ts - _EPOCH0
    return d.days * 86400 + d.seconds


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


def test_zipf_check_matches_python(spark):
    freq: Counter = Counter()
    for _d, _s, text in _docs():
        freq.update(_tokens(text))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    f1 = ranked[0][1]
    rows = QUERIES["q_zipf_check"](spark, SF_DIR).collect()
    assert len(rows) == min(30, len(ranked))
    for r, (tok, f) in zip(rows, ranked):
        assert (r.tok, r.freq, r.rank_freq, r.zipf_micro) == (
            tok,
            f,
            r.rank * f,
            (r.rank * f * 1_000_000) // f1,
        )


def _graph_edges(mod: int) -> set[tuple[int, int]]:
    edges = set()
    for eid, _ts, uid, _t, _v in _events():
        a, b = uid % mod, (2 * uid + eid) % mod
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return edges


def test_assortativity_matches_python(spark):
    raw = _graph_edges(499)
    sym = [(a, b) for a, b in raw] + [(b, a) for a, b in raw]
    deg: Counter = Counter(a for a, _ in sym)
    xs = [(deg[a], deg[b]) for a, b in sym]
    n = len(xs)
    sx = sum(x for x, _ in xs)
    sy = sum(y for _, y in xs)
    sxx = sum(x * x for x, _ in xs)
    syy = sum(y * y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    row = QUERIES["q_assortativity"](spark, SF_DIR).collect()[0]
    assert (row.n_half_edges, row.num, row.den_x, row.den_y) == (
        n,
        num,
        den_x,
        den_y,
    )
    assert abs(
        row.assortativity - num / (math.sqrt(den_x) * math.sqrt(den_y))
    ) < 1e-12


def test_reciprocity_matches_python(spark):
    edges = set()
    for eid, _ts, uid, _t, _v in _events():
        a, b = uid % 97, (2 * uid + eid) % 97
        if a != b:
            edges.add((a, b))
    n_recip = sum(1 for a, b in edges if (b, a) in edges)
    row = QUERIES["q_reciprocity"](spark, SF_DIR).collect()[0]
    assert (row.n_edges, row.n_recip, row.recip_micro) == (
        len(edges),
        n_recip,
        (n_recip * 1_000_000) // len(edges),
    )
    assert abs(row.reciprocity - n_recip / len(edges)) < 1e-12


def test_key_skew_matches_python(spark):
    keys = Counter(
        v
        for (v,) in duckdb.sql(
            f"SELECT l_suppkey FROM '{SF_DIR}/lineitem.parquet'"
        ).fetchall()
    )
    total = sum(keys.values())
    n_keys = len(keys)
    ranked = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = QUERIES["q_key_skew"](spark, SF_DIR).collect()
    assert len(rows) == min(10, n_keys)
    cum = 0
    for r, (k, c) in zip(rows, ranked):
        cum += c
        assert (r.key, r.cnt, r.share_micro, r.cum_share_micro) == (
            k,
            c,
            (c * 1_000_000) // total,
            (cum * 1_000_000) // total,
        )
        assert r.over_avg_micro == (c * n_keys * 1_000_000) // total
        assert (r.n_keys, r.total_rows) == (n_keys, total)


def test_join_card_est_matches_python(spark):
    r = Counter(
        v
        for (v,) in duckdb.sql(
            f"SELECT o_orderkey FROM '{SF_DIR}/orders.parquet'"
        ).fetchall()
    )
    s = Counter(
        v
        for (v,) in duckdb.sql(
            f"SELECT l_orderkey FROM '{SF_DIR}/lineitem.parquet'"
        ).fetchall()
    )
    rb: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    sb: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    act: Counter = Counter()
    for k, c in r.items():
        rb[k % 64][0] += c
        rb[k % 64][1] += 1
        if k in s:
            act[k % 64] += c * s[k]
    for k, c in s.items():
        sb[k % 64][0] += c
        sb[k % 64][1] += 1
    rows = QUERIES["q_join_card_est"](spark, SF_DIR).collect()
    assert len(rows) == len(set(rb) & set(sb))
    for row in rows:
        n_r, d_r = rb[row.bucket]
        n_s, d_s = sb[row.bucket]
        actual = act.get(row.bucket, 0)
        est_den = max(d_r, d_s)
        qerr = max(
            (n_r * n_s * 1_000_000) // (est_den * max(actual, 1)),
            (est_den * actual * 1_000_000) // (n_r * n_s),
        )
        assert (
            row.n_r,
            row.d_r,
            row.n_s,
            row.d_s,
            row.actual,
            row.est_num,
            row.est_den,
            row.qerr_micro,
        ) == (n_r, d_r, n_s, d_s, actual, n_r * n_s, est_den, qerr)


def test_slo_burn_matches_python(spark):
    wins: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for _e, ts, _u, typ, _v in _events():
        w = wins[_sec(ts) // 21600]
        w[0] += 1
        if typ == "error":
            w[1] += 1
    rows = QUERIES["q_slo_burn"](spark, SF_DIR).collect()
    assert [r.win for r in rows] == sorted(wins)
    for r in rows:
        total, err = wins[r.win]
        assert (r.total, r.err, r.burn_micro) == (
            total,
            err,
            (err * 100_000_000) // (total * 22),
        )
        assert r.breach == (1 if err * 100 > total * 22 else 0)
        assert r.fast_burn == (1 if err * 100 > 2 * total * 22 else 0)


def test_elasticity_matches_python(spark):
    brand = dict(
        duckdb.sql(
            f"SELECT p_partkey, p_brand FROM '{SF_DIR}/part.parquet'"
        ).fetchall()
    )
    li = duckdb.sql(
        f"SELECT l_partkey, l_quantity, l_extendedprice "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    stats: dict[str, list[int]] = defaultdict(lambda: [0] * 6)
    for pk, q, p in li:
        x = int(q)
        y = math.floor(p + 0.5) // 100
        st = stats[brand[pk]]
        st[0] += 1
        st[1] += x
        st[2] += y
        st[3] += x * x
        st[4] += y * y
        st[5] += x * y
    rows = QUERIES["q_elasticity"](spark, SF_DIR).collect()
    assert [r.p_brand for r in rows] == sorted(stats)
    for r in rows:
        n, sx, sy, sxx, syy, sxy = stats[r.p_brand]
        num = n * sxy - sx * sy
        den_x = n * sxx - sx * sx
        den_y = n * syy - sy * sy
        assert (r.n, r.num, r.den_x, r.den_y) == (n, num, den_x, den_y)
        assert abs(
            r.price_qty_corr - num / (math.sqrt(den_x) * math.sqrt(den_y))
        ) < 1e-12


def test_hazard_rate_matches_python(spark):
    span: dict[int, list[int]] = {}
    for _e, ts, uid, _t, _v in _events():
        sec = _sec(ts)
        if uid not in span:
            span[uid] = [sec, sec]
        else:
            span[uid][0] = min(span[uid][0], sec)
            span[uid][1] = max(span[uid][1], sec)
    hist = Counter((b - a) // 604800 for a, b in span.values())
    rows = QUERIES["q_hazard_rate"](spark, SF_DIR).collect()
    assert [r.week for r in rows] == sorted(hist)
    for r in rows:
        at_risk = sum(c for w, c in hist.items() if w >= r.week)
        assert (r.churned, r.at_risk, r.hazard_micro) == (
            hist[r.week],
            at_risk,
            (hist[r.week] * 1_000_000) // at_risk,
        )
        assert abs(r.hazard - hist[r.week] / at_risk) < 1e-12


def test_source_similarity_matches_python(spark):
    tf: dict[str, Counter] = defaultdict(Counter)
    for _d, src, text in _docs():
        tf[src].update(_tokens(text))
    norms = {s: sum(v * v for v in c.values()) for s, c in tf.items()}
    expect = {}
    srcs = sorted(tf)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            dot = sum(tf[sa][t] * tf[sb][t] for t in tf[sa] if t in tf[sb])
            if dot > 0:
                expect[(sa, sb)] = dot
    rows = QUERIES["q_source_similarity"](spark, SF_DIR).collect()
    assert {(r.src_a, r.src_b) for r in rows} == set(expect)
    for r in rows:
        dot = expect[(r.src_a, r.src_b)]
        assert (r.dot, r.n2_a, r.n2_b) == (
            dot,
            norms[r.src_a],
            norms[r.src_b],
        )
        assert abs(
            r.cosine
            - dot / (math.sqrt(norms[r.src_a]) * math.sqrt(norms[r.src_b]))
        ) < 1e-12


def test_dispersion_matches_python(spark):
    hourly: dict[int, Counter] = defaultdict(Counter)
    for _e, ts, _u, typ, _v in _events():
        hourly[_sec(ts) // 3600][typ] += 1
    types = ["click", "error", "purchase", "signup", "view"]
    rows = QUERIES["q_dispersion"](spark, SF_DIR).collect()
    assert [r.event_type for r in rows] == types
    for r in rows:
        xs = [hourly[h][r.event_type] for h in hourly]
        n = len(xs)
        sx = sum(xs)
        sxx = sum(x * x for x in xs)
        num = n * sxx - sx * sx
        den = n * sx
        assert (r.n_hours, r.n_events, r.disp_num, r.disp_den) == (
            n,
            sx,
            num,
            den,
        )
        assert abs(r.dispersion - num / den) < 1e-12
