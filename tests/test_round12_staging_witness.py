"""Pure-Python witnesses for the round-12 STAGED queries (plans/
staging.py) at sf0.001 — independent recomputation, the third leg next
to the Spark build and the DuckDB oracle, written at staging time so
promotion to the catalog is a move, not a build — plus plan pins."""

from __future__ import annotations

import collections
import hashlib
import math

import duckdb
import pytest

from aws_vpcflowlogs_parquet_spark.plans.staging import STAGED_QUERIES

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _events(duck):
    return duck.sql(
        f"SELECT event_id, epoch_us(ts), user_id, event_type, value,"
        f" CAST(ts AS DATE)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()


def _daily_cents(duck):
    daily = collections.defaultdict(dict)
    for _eid, _us, _uid, etype, val, d in _events(duck):
        daily[etype][d] = daily[etype].get(d, 0) + round(val * 100)
    return daily


def test_turning_points_witness(spark, duck):
    daily = _daily_cents(duck)
    for r in STAGED_QUERIES["q_turning_points"](spark, SF_DIR).collect():
        xs = [x for _, x in sorted(daily[r.event_type].items())]
        n = len(xs)
        t = sum(
            1
            for i in range(1, n - 1)
            if (xs[i] > xs[i - 1] and xs[i] > xs[i + 1])
            or (xs[i] < xs[i - 1] and xs[i] < xs[i + 1])
        )
        assert (r.n, r.t_count) == (n, t)
        z = (t - 2.0 * (n - 2) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
        assert r.zstat == pytest.approx(z, rel=1e-12)


def test_ar1_unit_root_witness(spark, duck):
    daily = _daily_cents(duck)
    for r in STAGED_QUERIES["q_ar1_unit_root"](spark, SF_DIR).collect():
        xs = [x // 1024 for _, x in sorted(daily[r.event_type].items())]
        pairs = list(zip(xs, xs[1:]))
        n = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        sxy = sum(a * b for a, b in pairs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        assert (r.n_pairs, r.rho_num, r.rho_den) == (n, num, den)
        assert r.rho == pytest.approx(num / den, rel=1e-12)
        assert abs(r.rho) < 1.5  # sanity: a daily sum series, not junk


def test_seasonal_strength_witness(spark, duck):
    import datetime

    daily = _daily_cents(duck)
    anchor = datetime.date(1995, 1, 1)
    for r in STAGED_QUERIES["q_seasonal_strength"](
        spark, SF_DIR
    ).collect():
        cells = sorted(daily[r.event_type].items())
        n = len(cells)
        s = sum(x for _, x in cells)
        q = sum(x * x for _, x in cells)
        groups = collections.defaultdict(list)
        for d, x in cells:
            groups[(d - anchor).days % 7].append(x)
        within = sum(
            sum(g) * sum(g) / len(g) for _k, g in sorted(groups.items())
        )
        strength = 1.0 - (q - within) / (q - s * s / n)
        assert r.n == n
        assert r.strength == pytest.approx(strength, rel=1e-9)
        assert 0.0 <= r.strength <= 1.0 or r.strength < 0.1


def test_cohens_d_witness(spark, duck):
    g1, g2 = [], []
    for _eid, _us, _uid, etype, val, _d in _events(duck):
        if etype == "click":
            g1.append(round(val * 100))
        elif etype == "purchase":
            g2.append(round(val * 100))
    n1, n2 = len(g1), len(g2)
    m1, m2 = sum(g1) / n1, sum(g2) / n2
    ss1 = sum(x * x for x in g1) - sum(g1) ** 2 / n1
    ss2 = sum(x * x for x in g2) - sum(g2) ** 2 / n2
    sp = math.sqrt((ss1 + ss2) / (n1 + n2 - 2))
    d = (m1 - m2) / sp
    g = d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
    (row,) = STAGED_QUERIES["q_cohens_d"](spark, SF_DIR).collect()
    assert (row.n1, row.n2) == (n1, n2)
    assert row.cohens_d == pytest.approx(d, rel=1e-9)
    assert row.hedges_g == pytest.approx(g, rel=1e-9)
    assert abs(row.hedges_g) < abs(row.cohens_d)


def test_process_capability_witness(spark, duck):
    groups = collections.defaultdict(list)
    for _eid, _us, _uid, etype, val, _d in _events(duck):
        groups[etype].append(round(val * 100))
    for r in STAGED_QUERIES["q_process_capability"](
        spark, SF_DIR
    ).collect():
        xs = groups[r.event_type]
        n = len(xs)
        s, q = sum(xs), sum(x * x for x in xs)
        sig = math.sqrt((q - s * s / n) / (n - 1))
        mu = s / n
        assert (r.n, r.n_above, r.n_below) == (
            n,
            sum(x > 45000 for x in xs),
            sum(x < 500 for x in xs),
        )
        assert r.cp == pytest.approx((45000 - 500) / (6 * sig), rel=1e-9)
        assert r.cpk == pytest.approx(
            min(45000 - mu, mu - 500) / (3 * sig), rel=1e-9
        )
        assert r.cpk <= r.cp + 1e-12  # Cpk never exceeds Cp


def test_cohort_ltv_witness(spark, duck):
    rows = duck.sql(
        f"""SELECT o_custkey,
           (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
        FROM '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    per_cust = collections.defaultdict(list)
    for ck, m, cents in rows:
        per_cust[ck].append((m, cents))
    exp = collections.defaultdict(lambda: [0, 0])
    for ck, lst in per_cust.items():
        cohort = min(m for m, _ in lst)
        for k in (1, 3, 6, 12):
            spend = sum(c for m, c in lst if m < cohort + k)
            cell = exp[(cohort, k)]
            cell[0] += 1
            cell[1] += spend
    got = {
        (r.cohort, r.k): (r.n_cust, r.total_cents, r.ltv_avg)
        for r in STAGED_QUERIES["q_cohort_ltv"](spark, SF_DIR).collect()
    }
    assert set(got) == set(exp)
    for key, (nc, tot) in exp.items():
        gn, gt, ga = got[key]
        assert (gn, gt) == (nc, tot)
        assert ga == pytest.approx(tot / nc / 100.0, rel=1e-12)
    # LTV is monotone in the age horizon for every cohort
    for (cohort, k), (nc, tot) in exp.items():
        if (cohort, 12) in exp:
            assert exp[(cohort, 12)][1] >= tot


def test_xyz_volatility_witness(spark, duck):
    rows = duck.sql(
        f"""SELECT l_partkey % 500,
           date_trunc('month', l_shipdate),
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        FROM '{SF_DIR}/lineitem.parquet'
        GROUP BY 1, 2"""
    ).fetchall()
    per_pk = collections.defaultdict(list)
    for pk, _m, q in rows:
        per_pk[pk].append(q)
    exp = collections.Counter()
    for pk, qs in per_pk.items():
        n = len(qs)
        if n < 2:
            continue
        s, ss = sum(qs), sum(q * q for q in qs)
        if 4 * n * ss <= 5 * s * s:
            exp["X"] += 1
        elif n * ss <= 2 * s * s:
            exp["Y"] += 1
        else:
            exp["Z"] += 1
    got = {
        r.xyz_class: r.n_parts
        for r in STAGED_QUERIES["q_xyz_volatility"](spark, SF_DIR).collect()
    }
    assert got == dict(exp)


def _ewma_fold(xs):
    e = 0
    for i, x in enumerate(xs):
        e = x if i == 0 else (3 * x + 7 * e) // 10
    return e


def test_stream_ewma_witness(spark, duck):
    per_user = collections.defaultdict(list)
    for eid, us, uid, _etype, val, _d in _events(duck):
        per_user[uid].append((us, eid, int(math.floor(val * 100.0 + 0.5))))
    exp = {}
    for uid, lst in per_user.items():
        lst.sort()
        exp[uid] = (len(lst), _ewma_fold([x for _, _, x in lst]))
    got = {
        r.user_id: (r.n_events, r.ewma_cents)
        for r in STAGED_QUERIES["q_stream_ewma"](spark, SF_DIR).collect()
    }
    assert got == exp and got


def test_stream_ewma_cross_batch(spark, tmp_path):
    """The integer fold must carry across batch boundaries bit-exactly:
    a two-file event-time split stream's LAST emission per key equals
    the single-batch fold."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from aws_vpcflowlogs_parquet_spark.sources.tables import stream_events
    from aws_vpcflowlogs_parquet_spark.streaming.windows import stream_ewma

    src = tmp_path / "ewma_src"
    src.mkdir()
    tbl = pq.read_table(f"{SF_DIR}/events.parquet")
    ts = tbl.column("ts")
    cut = pc.quantile(ts.cast("int64"), q=0.5).to_pylist()[0]
    mask = pc.less(ts.cast("int64"), int(cut))
    pq.write_table(tbl.filter(mask), src / "events.parquet")
    stream = stream_ewma(stream_events(spark, str(src)))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("r12_ewma_x")
        .start()
    )
    try:
        q.processAllAvailable()
        pq.write_table(tbl.filter(pc.invert(mask)), src / "events2.parquet")
        q.processAllAvailable()
        # last emission per key = the one with the max n_events
        got = {
            r.user_id: (r.n_events, r.ewma_cents)
            for r in spark.sql(
                """SELECT user_id, n_events, ewma_cents FROM (
                     SELECT *, row_number() OVER (PARTITION BY user_id
                       ORDER BY n_events DESC) AS rn FROM r12_ewma_x
                   ) WHERE rn = 1"""
            ).collect()
        }
    finally:
        q.stop()
    single = {
        r.user_id: (r.n_events, r.ewma_cents)
        for r in STAGED_QUERIES["q_stream_ewma"](spark, SF_DIR).collect()
    }
    assert got == single


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    [
        "q_turning_points",
        "q_ar1_unit_root",
        "q_seasonal_strength",
        "q_cohens_d",
        "q_process_capability",
        "q_cohort_ltv",
        "q_xyz_volatility",
    ],
)
def test_no_python_row_udfs_in_round12_staged(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ------------------------------------------------ staging batch 2


def test_simpson_paradox_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, CAST(date_part('hour', ts) AS BIGINT),"
        f" CAST(round(value*100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    grp = collections.defaultdict(lambda: [0, 0, 0, 0])
    for etype, x, y in rows:
        g = grp[etype]
        g[0] += 1
        g[1] += x
        g[2] += y
        g[3] += x * y
    pn = sum(g[0] for g in grp.values())
    psx = sum(g[1] for g in grp.values())
    psy = sum(g[2] for g in grp.values())
    psxy = sum(g[3] for g in grp.values())
    pnum = pn * psxy - psx * psy
    for r in STAGED_QUERIES["q_simpson_paradox"](spark, SF_DIR).collect():
        n, sx, sy, sxy = grp[r.event_type]
        gnum = n * sxy - sx * sy
        assert (r.group_num, r.pooled_num) == (gnum, pnum)
        assert r.sign_flip == (1 if gnum * pnum < 0 else 0)


def test_mean_excess_witness(spark, duck):
    groups = collections.defaultdict(list)
    for _eid, _us, _uid, etype, val, _d in _events(duck):
        groups[etype].append(round(val * 100))
    rows = STAGED_QUERIES["q_mean_excess"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        ex = [x - r.u for x in groups[r.event_type] if x > r.u]
        assert (r.n_exceed, r.sum_excess) == (len(ex), sum(ex))
        assert r.mean_excess == pytest.approx(
            sum(ex) / len(ex), rel=1e-12
        )
    # completeness: every (type, threshold) with exceedances appears
    present = {(r.event_type, r.u) for r in rows}
    for etype, xs in groups.items():
        for u in (10000, 20000, 30000):
            if any(x > u for x in xs):
                assert (etype, u) in present


def test_interarrival_cv_witness(spark, duck):
    per_user = collections.defaultdict(list)
    for eid, us, uid, _etype, _v, _d in _events(duck):
        per_user[uid].append((us, eid))
    for r in STAGED_QUERIES["q_interarrival_cv"](spark, SF_DIR).collect():
        evs = sorted(per_user[r.user_id])
        gaps = [
            (b[0] - a[0]) // 1_000_000 for a, b in zip(evs, evs[1:])
        ]
        n, s, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        assert (r.n_gaps, r.sum_s, r.sum_s2) == (n, s, s2)
        assert r.cv2 == pytest.approx(n * s2 / (s * s) - 1.0, rel=1e-12)
        assert r.overdispersed == (1 if n * s2 > 2 * s * s else 0)


@pytest.mark.parametrize(
    "name",
    ["q_simpson_paradox", "q_mean_excess", "q_interarrival_cv"],
)
def test_no_python_row_udfs_in_round12_staged_b2(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ------------------------------------------------ staging batch 3


def test_shapley_attribution_witness(spark, duck):
    per_user = collections.defaultdict(lambda: [0, 0])
    touched = collections.defaultdict(set)
    for _eid, _us, uid, etype, _v, _d in _events(duck):
        if etype in ("view", "click", "purchase"):
            touched[uid].add(etype)
        if etype == "signup":
            per_user[uid][1] = 1
        per_user[uid][0] = 1
    cnt = collections.Counter()
    for uid in per_user:
        if per_user[uid][1]:
            bits = (
                ("view" in touched[uid])
                + 2 * ("click" in touched[uid])
                + 4 * ("purchase" in touched[uid])
            )
            cnt[bits] += 1

    def v(s):
        return sum(c for k, c in cnt.items() if k & ~s == 0)

    exp = {
        "view": 2 * (v(1) - v(0)) + (v(3) - v(2)) + (v(5) - v(4))
        + 2 * (v(7) - v(6)),
        "click": 2 * (v(2) - v(0)) + (v(3) - v(1)) + (v(6) - v(4))
        + 2 * (v(7) - v(5)),
        "purchase": 2 * (v(4) - v(0)) + (v(5) - v(1)) + (v(6) - v(2))
        + 2 * (v(7) - v(3)),
    }
    rows = STAGED_QUERIES["q_shapley_attribution"](spark, SF_DIR).collect()
    got = {r.channel: r.phi_x6 for r in rows}
    assert got == exp
    for r in rows:
        assert r.total_attributed == v(7) - v(0)
        assert r.phi == pytest.approx(r.phi_x6 / 6.0, rel=1e-15)
    # efficiency axiom: the phis split exactly v(N) - v(empty)
    assert sum(exp.values()) == 6 * (v(7) - v(0))


def test_decay_activity_witness(spark, duck):
    import datetime

    ref = datetime.date(2024, 1, 31)
    w = {d: round(1e9 * 0.9**d) for d in range(31)}
    per_user = collections.defaultdict(lambda: [0, 0])
    for _eid, _us, uid, _etype, _v, d in _events(duck):
        age = (ref - d).days
        if age in w:
            per_user[uid][0] += 1
            per_user[uid][1] += w[age]
    got = {
        r.user_id: (r.n_events, r.score_nano)
        for r in STAGED_QUERIES["q_decay_activity"](spark, SF_DIR).collect()
    }
    assert got == {u: tuple(v) for u, v in per_user.items() if v[0]}


def test_pythagorean_means_witness(spark, duck):
    groups = collections.defaultdict(list)
    for _eid, _us, _uid, etype, val, _d in _events(duck):
        if val > 0:
            groups[etype].append(round(val * 100))
    for r in STAGED_QUERIES["q_pythagorean_means"](
        spark, SF_DIR
    ).collect():
        xs = groups[r.event_type]
        n, s = len(xs), sum(xs)
        lnsum = sum(
            int(math.floor(math.log(x) * 1e9 + 0.5)) for x in xs
        )
        inv = sum(10**12 // x for x in xs)
        assert (r.n, r.s, r.lnsum_nano, r.inv_pico) == (n, s, lnsum, inv)
        assert r.am == pytest.approx(s / n, rel=1e-12)
        assert r.gm_ln == pytest.approx(lnsum / (n * 1e9), rel=1e-12)
        assert r.hm == pytest.approx(n * 1e12 / inv, rel=1e-12)
        # the mean inequality chain (strict unless degenerate)
        gm = math.exp(r.gm_ln)
        assert r.am >= gm - 1e-6 and gm >= r.hm - 1e-6


@pytest.mark.parametrize(
    "name",
    ["q_shapley_attribution", "q_decay_activity", "q_pythagorean_means"],
)
def test_no_python_row_udfs_in_round12_staged_b3(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ------------------------------------------------ staging batch 4


def test_srm_check_witness(spark, duck):
    per_type = collections.defaultdict(lambda: [set(), set()])
    for _eid, _us, uid, etype, _v, _d in _events(duck):
        arm = int(hashlib.md5(f"{uid}:srm".encode()).hexdigest()[:8], 16) % 2
        per_type[etype][arm].add(uid)
    for r in STAGED_QUERIES["q_srm_check"](spark, SF_DIR).collect():
        a, b = len(per_type[r.event_type][0]), len(per_type[r.event_type][1])
        assert (r.n_a, r.n_b) == (a, b)
        assert r.chi2 == pytest.approx((a - b) ** 2 / (a + b), rel=1e-12)
        assert r.srm_flag == (1 if 100 * (a - b) ** 2 > 384 * (a + b) else 0)


def test_price_volume_mix_witness(spark, duck):
    rows = duck.sql(
        f"""SELECT l_partkey % 100,
           CASE WHEN year(l_shipdate) < 1998 THEN 0 ELSE 1 END,
           CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT),
           CAST(l_quantity AS BIGINT)
        FROM '{SF_DIR}/lineitem.parquet'"""
    ).fetchall()
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for pk, period, r, q in rows:
        cell = agg[pk]
        cell[period] += r
        cell[2 + period] += q
    got = {
        r.pk: r
        for r in STAGED_QUERIES["q_price_volume_mix"](
            spark, SF_DIR
        ).collect()
    }
    for pk, (r0, r1, q0, q1) in agg.items():
        if q0 == 0 or q1 == 0:
            assert pk not in got
            continue
        g = got[pk]
        assert (g.r0, g.r1, g.q0, g.q1) == (r0, r1, q0, q1)
        assert g.price_eff_xq0 == r1 * q0 - r0 * q1
        assert g.volume_eff_xq0 == r0 * (q1 - q0)
        # bridge identity: price + volume telescopes to (R1-R0)*Q0
        assert g.price_eff_xq0 + g.volume_eff_xq0 == (r1 - r0) * q0


def test_fleiss_kappa_witness(spark, duck):
    per_day = collections.defaultdict(list)
    for eid, us, _uid, _etype, val, d in _events(duck):
        per_day[d].append((us, eid, round(val * 100) // 12500))
    cells = collections.defaultdict(collections.Counter)
    for d, evs in per_day.items():
        evs.sort()
        if len(evs) < 20:
            continue
        for _us, _eid, cat in evs[:20]:
            cells[d][cat] += 1
    n_items = len(cells)
    pbar_num = sum(
        sum(c * c for c in cnt.values()) - 20 for cnt in cells.values()
    )
    tj = collections.Counter()
    for cnt in cells.values():
        tj.update(cnt)
    pe_num = sum(t * t for t in tj.values())
    (row,) = STAGED_QUERIES["q_fleiss_kappa"](spark, SF_DIR).collect()
    assert (row.n_items, row.pbar_num, row.pe_num) == (
        n_items,
        pbar_num,
        pe_num,
    )
    pbar = pbar_num / (n_items * 380.0)
    pe = pe_num / (400.0 * n_items * n_items)
    assert row.kappa == pytest.approx((pbar - pe) / (1 - pe), rel=1e-9)
    assert -1.0 <= row.kappa <= 1.0


def test_set_cover_greedy_witness(spark, duck):
    rows = duck.sql(
        f"SELECT source, lower(text) FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    member = collections.defaultdict(set)
    for source, text in rows:
        tk = [x for x in text.split(" ") if x]
        for i in range(len(tk) - 1):
            member[source].add(f"{tk[i]} {tk[i + 1]}")
    uncovered = set().union(*member.values())
    exp = []
    for rnd in (1, 2, 3, 4):
        # total order: count DESC then source ASC
        best = sorted(
            member, key=lambda s: (-len(member[s] & uncovered), s)
        )[0]
        n_new = len(member[best] & uncovered)
        uncovered -= member[best]
        exp.append((rnd, best, n_new, len(uncovered)))
    got = [
        (r.round, r.source, r.n_new, r.n_remaining)
        for r in STAGED_QUERIES["q_set_cover_greedy"](
            spark, SF_DIR
        ).collect()
    ]
    assert got == exp
    # greedy makes progress every round on this fixture
    assert all(n > 0 for _r, _s, n, _u in exp)


@pytest.mark.parametrize(
    "name",
    [
        "q_srm_check",
        "q_price_volume_mix",
        "q_fleiss_kappa",
        "q_set_cover_greedy",
    ],
)
def test_no_python_row_udfs_in_round12_staged_b4(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ------------------------------------------------ staging batch 5
# (round-13 candidates: classical-statistics completions)


def test_theil_index_witness(spark, duck):
    rows = duck.sql(
        f"SELECT o_orderpriority, CAST(round(o_totalprice*100) AS BIGINT)"
        f" FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    by_g = collections.defaultdict(list)
    for g, cents in rows:
        by_g[g].append(cents)
    n = sum(len(v) for v in by_g.values())
    s = sum(sum(v) for v in by_g.values())
    got = {
        r.g: r for r in STAGED_QUERIES["q_theil_index"](spark, SF_DIR).collect()
    }
    assert set(got) == set(by_g)
    t_total_nano = 0
    t_between = 0.0
    t_within_weighted = 0.0
    for g, xs in by_g.items():
        r = got[g]
        n_g, s_g = len(xs), sum(xs)
        assert (r.n_g, r.s_g) == (n_g, s_g)
        win = sum(
            math.floor((x * n_g / s_g) * math.log(x * n_g / s_g) * 1e9 + 0.5)
            for x in xs
        )
        tot = sum(
            math.floor((x * n / s) * math.log(x * n / s) * 1e9 + 0.5)
            for x in xs
        )
        # each lattice term can differ by 1 ulp across libm's ln
        assert abs(r.within_nano_sum - win) <= n_g
        assert abs(r.total_nano_sum - tot) <= n_g
        bet = math.floor(
            (s_g / s) * math.log((s_g * n) / (s * n_g)) * 1e9 + 0.5
        )
        assert abs(r.between_nano - bet) <= 1
        assert r.theil_g == pytest.approx(
            r.within_nano_sum / (n_g * 1e9), rel=1e-12
        )
        t_total_nano += r.total_nano_sum
        t_between += r.between_nano / 1e9
        t_within_weighted += (s_g / s) * (r.within_nano_sum / (n_g * 1e9))
    # the decomposition identity T = T_between + sum s_g T_g (additive
    # decomposability -- the property that makes Theil the group-level
    # inequality index) holds on the lattice
    assert t_total_nano / (n * 1e9) == pytest.approx(
        t_between + t_within_weighted, abs=1e-5
    )


def test_kruskal_wallis_witness(spark, duck):
    rows = duck.sql(
        f"SELECT l_returnflag, CAST(l_quantity AS BIGINT)"
        f" FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    n = len(rows)
    # midranks via value counting (independent of the SQL): rank of
    # value v spans (before, before + t], midrank*2 = 2*before + t + 1
    cnt = collections.Counter(v for _g, v in rows)
    bef, start = {}, 0
    for v in sorted(cnt):
        bef[v] = start
        start += cnt[v]
    r2 = collections.defaultdict(int)
    ng = collections.Counter()
    for g, v in rows:
        r2[g] += 2 * bef[v] + cnt[v] + 1
        ng[g] += 1
    assert sum(r2.values()) == n * (n + 1)  # doubled rank sum identity
    tie_sum = sum(t**3 - t for t in cnt.values())
    r = STAGED_QUERIES["q_kruskal_wallis"](spark, SF_DIR).collect()[0]
    assert (r.n, r.tie_sum) == (n, tie_sum)
    assert (r.n_a, r.n_n, r.n_r) == (ng["A"], ng["N"], ng["R"])
    assert (r.r2_a, r.r2_n, r.r2_r) == (r2["A"], r2["N"], r2["R"])
    h = (
        sum(3.0 * r2[g] * r2[g] / (ng[g] * n * (n + 1)) for g in "ANR")
        - 3.0 * (n + 1)
    )
    c = 1.0 - tie_sum / (float(n) ** 3 - n)
    assert r.h_corrected == pytest.approx(h / c, rel=1e-9)
    assert r.h_corrected >= 0.0


def test_odds_ratio_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, user_id, CAST(round(value*100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    cells = collections.defaultdict(lambda: [0, 0, 0, 0])
    for t, uid, cents in rows:
        exposed, out = uid % 2 == 0, cents > 5000
        idx = (0 if out else 1) if exposed else (2 if out else 3)
        cells[t][idx] += 1
    got = {
        r.t: r for r in STAGED_QUERIES["q_odds_ratio"](spark, SF_DIR).collect()
    }
    assert set(got) == set(cells)
    for t, (a, b, c, d) in cells.items():
        r = got[t]
        assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
        hald = 1 if a * b * c * d == 0 else 0
        assert r.haldane == hald
        aa, bb, cc, dd = (2 * x + hald for x in (a, b, c, d))
        assert r.or_hat == pytest.approx((aa * dd) / (bb * cc), rel=1e-15)
        se = math.sqrt(2.0 / aa + 2.0 / bb + 2.0 / cc + 2.0 / dd)
        assert r.se_log_or == pytest.approx(se, rel=1e-12)
        lor = math.floor(math.log((aa * dd) / (bb * cc)) * 1e9 + 0.5)
        assert abs(r.log_or_nano - lor) <= 1
        width = math.floor(1.96 * se * 1e9 + 0.5)
        assert abs((r.ci_hi_nano - r.ci_lo_nano) - 2 * width) <= 2
        assert r.ci_lo_nano <= r.log_or_nano <= r.ci_hi_nano


def test_levene_test_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, CAST(round(value*100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    by_g = collections.defaultdict(list)
    for g, cents in rows:
        by_g[g].append(cents)
    zs = {}
    for g, xs in by_g.items():
        xs.sort()
        m = len(xs)
        med2 = xs[(m + 1) // 2 - 1] + xs[(m + 2) // 2 - 1]
        zs[g] = [abs(2 * x - med2) for x in xs]
    n = sum(len(v) for v in zs.values())
    k = len(zs)
    zbar = sum(sum(v) for v in zs.values()) / n
    num = sum(
        math.floor(len(v) * (sum(v) / len(v) - zbar) ** 2 * 1e3 + 0.5)
        for v in zs.values()
    )
    den = sum(
        math.floor(
            (sum(z * z for z in v) - sum(v) * sum(v) / len(v)) * 1e3 + 0.5
        )
        for v in zs.values()
    )
    r = STAGED_QUERIES["q_levene_test"](spark, SF_DIR).collect()[0]
    assert (r.n, r.k) == (n, k)
    assert abs(r.num_milli - num) <= k
    assert abs(r.den_milli - den) <= k
    assert r.w == pytest.approx(
        (n - k) / (k - 1) * r.num_milli / r.den_milli, rel=1e-12
    )
    assert r.w >= 0.0


@pytest.mark.parametrize(
    "name",
    [
        "q_theil_index",
        "q_kruskal_wallis",
        "q_odds_ratio",
        "q_levene_test",
    ],
)
def test_no_python_row_udfs_in_round12_staged_b5(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ------------------------------------------------ staging batch 6
# (round-13 candidates: actuarial / financial mechanisms)


def test_chain_ladder_witness(spark, duck):
    rows = duck.sql(
        f"SELECT year(o_orderdate) - 1995, o_orderkey % 4,"
        f" CAST(round(o_totalprice*100) AS BIGINT)"
        f" FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    inc = collections.defaultdict(int)
    for y, d, cents in rows:
        if y + d <= 6:
            inc[(y, d)] += cents
    cum = {}
    for y in range(7):
        run = 0
        for d in range(min(3, 6 - y) + 1):
            run += inc.get((y, d), 0)
            cum[(y, d)] = run
    nu, de = {}, {}
    for d in range(3):
        ys = [y for y in range(7) if min(3, 6 - y) >= d + 1]
        nu[d] = sum(cum[(y, d + 1)] for y in ys)
        de[d] = sum(cum[(y, d)] for y in ys)
    got = {
        r.origin_year: r
        for r in STAGED_QUERIES["q_chain_ladder"](spark, SF_DIR).collect()
    }
    assert set(got) == set(range(1995, 2002))
    for y in range(7):
        r = got[1995 + y]
        ly = min(3, 6 - y)
        assert (r.latest_dev, r.c_latest) == (ly, cum[(y, ly)])
        assert (r.nu0, r.de0, r.nu1, r.de1, r.nu2, r.de2) == (
            nu[0], de[0], nu[1], de[1], nu[2], de[2],
        )
        ult = float(cum[(y, ly)])
        for d in range(ly, 3):
            ult = ult * (nu[d] / de[d])
        assert r.ultimate == pytest.approx(ult, rel=1e-12)
        # fully-developed origins project to themselves; censored
        # origins develop upward (factors > 1 on a cumulative triangle)
        if ly == 3:
            assert r.ultimate == float(r.c_latest)
        else:
            assert r.ultimate >= float(r.c_latest)


def test_amortization_schedule_witness(spark, duck):
    loans = duck.sql(
        f"SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT),"
        f" 300 + 25 * (c_nationkey % 10)"
        f" FROM '{SF_DIR}/customer.parquet' WHERE c_acctbal > 0"
    ).fetchall()
    got = collections.defaultdict(dict)
    for r in STAGED_QUERIES["q_amortization_schedule"](
        spark, SF_DIR
    ).collect():
        got[r.id][r.k] = (r.pay_c, r.int_c, r.prin_c, r.bal)
    assert set(got) == {cid for cid, _p, _r in loans}
    for cid, p, rbp in loans:
        i = rbp / 120000.0
        q = 1.0 + i
        q12 = q * q * q * q * q * q * q * q * q * q * q * q
        a = math.floor(p * i * q12 / (q12 - 1.0) + 0.5)
        bal = p
        for k in range(1, 13):
            intc = (bal * rbp) // 120000
            payc = bal + intc if k == 12 else min(a, bal + intc)
            prin = payc - intc
            bal -= prin
            assert got[cid][k] == (payc, intc, prin, bal), (cid, k)
        assert bal == 0  # month 12 pays off exactly
        # total principal repaid equals the loan
        assert sum(v[2] for v in got[cid].values()) == p


def test_irr_lattice_witness(spark, duck):
    rows = duck.sql(
        f"SELECT o_orderpriority, year(o_orderdate),"
        f" CAST(round(o_totalprice*100) AS BIGINT)"
        f" FROM '{SF_DIR}/orders.parquet'"
        f" WHERE year(o_orderdate) <= 1998"
    ).fetchall()
    s0 = collections.defaultdict(int)
    cf = collections.defaultdict(lambda: [0, 0, 0, 0])
    for g, y, cents in rows:
        if y == 1995:
            s0[g] += cents
        else:
            cf[g][y - 1995] += cents
    for g in s0:
        cf[g][0] = -((9 * s0[g]) // 5)

    def poly(c, m):  # exact arbitrary-precision integer sign oracle
        nd, s = 1024 + m, 1024
        return (
            c[0] * nd**3 + c[1] * nd**2 * s + c[2] * nd * s**2 + c[3] * s**3
        )

    got = {
        r.g: r for r in STAGED_QUERIES["q_irr_lattice"](spark, SF_DIR).collect()
    }
    assert set(got) == set(cf)
    for g, c in cf.items():
        r = got[g]
        assert (r.cf0, r.cf1, r.cf2, r.cf3) == tuple(c)
        m_star = max(m for m in range(4097) if poly(c, m) > 0)
        assert r.m_star == m_star
        assert 0 < m_star < 4096  # root strictly inside the lattice
        assert int(r.p_at) == poly(c, m_star) and int(r.p_at) > 0
        assert int(r.p_next) == poly(c, m_star + 1) and int(r.p_next) <= 0
        assert r.irr_lo == pytest.approx(m_star / 1024.0, rel=1e-15)
        # NPV strictly decreasing on the lattice (the bracketing proof)
        vals = [poly(c, m) for m in range(0, 4097, 512)]
        assert all(x > y for x, y in zip(vals, vals[1:]))


def test_german_tank_witness(spark, duck):
    rows = duck.sql(
        f"SELECT o_orderpriority, o_orderkey"
        f" FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    by_g = collections.defaultdict(list)
    for g, key in rows:
        by_g[g].append(key)
    got = {
        r.g: r for r in STAGED_QUERIES["q_german_tank"](spark, SF_DIR).collect()
    }
    assert set(got) == set(by_g)
    for g, ks in by_g.items():
        r = got[g]
        k, m, s = len(ks), max(ks), sum(ks)
        assert (r.k, r.m, r.s) == (k, m, s)
        assert r.mvue_num == m * (k + 1) - k
        assert r.mvue == pytest.approx((m * (k + 1) - k) / k, rel=1e-15)
        assert r.moment == pytest.approx((2 * s - k) / k, rel=1e-15)
        ln_up = math.floor(
            (math.log(m) - math.log(0.05) / k) * 1e9 + 0.5
        )
        assert abs(r.ln_upper_nano - ln_up) <= 1
        assert r.mvue >= m  # the estimator always sits above the max


@pytest.mark.parametrize(
    "name",
    [
        "q_chain_ladder",
        "q_amortization_schedule",
        "q_irr_lattice",
        "q_german_tank",
    ],
)
def test_no_python_row_udfs_in_round12_staged_b6(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ------------------------------------------------ staging batch 7
# (round-13 candidates: weighting / stylometry / districting / fairness)


def test_ipf_raking_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, user_id % 4 FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    n = collections.Counter((t, b) for t, b in rows)
    n_tot = sum(n.values())
    w = {c: 10**9 for c in n}
    for step in range(6):
        if step % 2 == 0:
            marg = collections.defaultdict(int)
            for (t, b), c in n.items():
                marg[t] += c * w[(t, b)]
            w = {
                (t, b): math.floor(
                    w[(t, b)] * n_tot * 1e9 / (5.0 * marg[t]) + 0.5
                )
                for (t, b) in n
            }
        else:
            marg = collections.defaultdict(int)
            for (t, b), c in n.items():
                marg[b] += c * w[(t, b)]
            w = {
                (t, b): math.floor(
                    w[(t, b)] * n_tot * 1e9 / (4.0 * marg[b]) + 0.5
                )
                for (t, b) in n
            }
    got = {
        (r.t, r.b): r
        for r in STAGED_QUERIES["q_ipf_raking"](spark, SF_DIR).collect()
    }
    assert set(got) == set(n)
    for c in n:
        assert got[c].n == n[c]
        assert got[c].w_nano == w[c]
        assert got[c].fitted == pytest.approx(
            n[c] * w[c] / 1e9, rel=1e-12
        )
    # after the final COLUMN sweep the column margins hit the 1/4
    # target to lattice precision
    colsum = collections.defaultdict(float)
    for (t, b), c in n.items():
        colsum[b] += c * w[(t, b)] / 1e9
    for b, s in colsum.items():
        assert s == pytest.approx(n_tot / 4.0, rel=1e-6)


def test_burrows_delta_witness(spark, duck):
    rows = duck.sql(
        f"SELECT source, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    toks = []
    for src, text in rows:
        toks.extend((src, t) for t in text.lower().split(" ") if t)
    cnt_all = collections.Counter(t for _s, t in toks)
    topw = sorted(cnt_all, key=lambda t: (-cnt_all[t], t))[:15]
    stot = collections.Counter(s for s, _t in toks)
    cnt = collections.Counter((s, t) for s, t in toks if t in set(topw))
    f = {
        (s, t): (cnt.get((s, t), 0) * 10**9) // stot[s]
        for s in stot
        for t in topw
    }
    srcs = sorted(stot)
    z = {}
    for t in topw:
        vals = [f[(s, t)] for s in srcs]
        s_n, f1, f2 = len(vals), sum(vals), sum(v * v for v in vals)
        disc = s_n * f2 - f1 * f1
        for s in srcs:
            z[(s, t)] = (
                0
                if disc == 0
                else math.floor(
                    (s_n * f[(s, t)] - f1) / math.sqrt(disc) * 1e6 + 0.5
                )
            )
    got = {
        (r.source_a, r.source_b): r
        for r in STAGED_QUERIES["q_burrows_delta"](spark, SF_DIR).collect()
    }
    pairs = [(a, b) for a in srcs for b in srcs if a < b]
    assert set(got) == set(pairs)
    for a, b in pairs:
        sabz = sum(abs(z[(a, t)] - z[(b, t)]) for t in topw)
        r = got[(a, b)]
        # each z lattice point can slip 1 ulp across libm sqrt
        assert abs(r.sum_absz_micro - sabz) <= 15
        assert r.delta == pytest.approx(
            r.sum_absz_micro / 15e6, rel=1e-12
        )
        assert r.delta >= 0.0


def test_efficiency_gap_witness(spark, duck):
    rows = duck.sql(
        f"SELECT o_custkey % 15, o_orderkey % 2"
        f" FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    va = collections.Counter(d for d, p in rows if p == 0)
    vb = collections.Counter(d for d, p in rows if p == 1)
    dists = sorted(set(va) | set(vb))
    wa = wb = v = 0
    exp = {}
    for d in dists:
        a, b = va.get(d, 0), vb.get(d, 0)
        t = (a + b) // 2 + 1
        if a > b:
            winner, w_a, w_b = "A", a - t, b
        elif b > a:
            winner, w_a, w_b = "B", a, b - t
        else:
            winner, w_a, w_b = "TIE", a, b
        exp[d] = (a, b, winner, w_a, w_b)
        wa, wb, v = wa + w_a, wb + w_b, v + a + b
    got = {
        r.d: r
        for r in STAGED_QUERIES["q_efficiency_gap"](spark, SF_DIR).collect()
    }
    assert set(got) == set(dists)
    winners = set()
    for d in dists:
        r = got[d]
        assert (r.va, r.vb, r.winner, r.wasted_a, r.wasted_b) == exp[d]
        assert r.efficiency_gap == pytest.approx((wa - wb) / v, rel=1e-12)
        winners.add(r.winner)
    assert {"A", "B"} <= winners  # the electorate genuinely flips


def test_jain_fairness_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, user_id, CAST(round(value*100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    x = collections.defaultdict(int)
    for t, u, c in rows:
        x[(t, u)] += c
    by_t = collections.defaultdict(list)
    for (t, _u), v in x.items():
        by_t[t].append(v)
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_jain_fairness"](spark, SF_DIR).collect()
    }
    assert set(got) == set(by_t)
    for t, xs in by_t.items():
        r = got[t]
        n, s, ss = len(xs), sum(xs), sum(v * v for v in xs)
        assert (r.n_users, r.sum_cents) == (n, s)
        assert int(r.sumsq) == ss
        assert (r.max_cents, r.min_cents) == (max(xs), min(xs))
        assert r.jain == pytest.approx(
            (float(s) * float(s)) / (float(n) * float(ss)), rel=1e-12
        )
        assert 1.0 / n <= r.jain <= 1.0 + 1e-12  # Jain's index bounds
        assert r.fair == (10 * s * s > 9 * n * ss)


@pytest.mark.parametrize(
    "name",
    [
        "q_ipf_raking",
        "q_burrows_delta",
        "q_efficiency_gap",
        "q_jain_fairness",
    ],
)
def test_no_python_row_udfs_in_round12_staged_b7(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ------------------------------------------------ staging batch 8
# (round-13 candidates: filtering / information rate / ranking)


def test_kalman_1d_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, datediff('day', DATE '2024-01-01',"
        f" CAST(ts AS DATE)), CAST(round(value*100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    daily = collections.defaultdict(int)
    types = set()
    for t, d, c in rows:
        daily[(t, d)] += c
        types.add(t)
    got = {
        r.t: r for r in STAGED_QUERIES["q_kalman_1d"](spark, SF_DIR).collect()
    }
    assert set(got) == types
    for t in types:
        zs = [daily.get((t, d), 0) / 100.0 for d in range(30)]
        x, p = zs[0], 0.0
        for z in zs[1:]:
            p1 = p + 4.0
            kg = p1 / (p1 + 64.0)
            x = x + kg * (z - x)
            p = (1.0 - kg) * p1
        r = got[t]
        assert r.n_days == 30
        assert r.kf_level == pytest.approx(x, rel=1e-12)
        assert r.kf_var == pytest.approx(p, rel=1e-12)
        # covariance converges toward the steady-state Riccati value
        # P* = (sqrt(Q^2 + 4 Q R) - Q)/2 for this (Q=4, R=64) pair
        p_star = (math.sqrt(16.0 + 4 * 4 * 64.0) - 4.0) / 2.0
        assert r.kf_var == pytest.approx(p_star, rel=1e-6)


def test_transition_entropy_witness(spark, duck):
    rows = duck.sql(
        f"SELECT user_id, event_type, ts, event_id"
        f" FROM '{SF_DIR}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs = collections.defaultdict(list)
    for u, t, _ts, _eid in rows:
        seqs[u].append(t)
    cells = collections.Counter()
    for seq in seqs.values():
        for cur, nxt in zip(seq, seq[1:]):
            cells[(cur, nxt)] += 1
    ct = collections.Counter()
    for (cur, _n), c in cells.items():
        ct[cur] += c
    nano = {
        k: c * math.floor(math.log(ct[k[0]] / c) * 1e9 + 0.5)
        for k, c in cells.items()
    }
    n_trans = sum(cells.values())
    h_nano_n = sum(nano.values())
    got = {
        r.cur: r
        for r in STAGED_QUERIES["q_transition_entropy"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(ct)
    for cur in ct:
        r = got[cur]
        state = sum(v for k, v in nano.items() if k[0] == cur)
        assert r.c_cur == ct[cur]
        assert abs(r.h_state_nano - state) <= ct[cur]  # 1 nano/term ulp
        assert r.n_trans == n_trans
        assert abs(r.h_nano_n - h_nano_n) <= n_trans
        assert r.h_cond_nats == pytest.approx(
            r.h_nano_n / (n_trans * 1e9), rel=1e-12
        )
        assert 0.0 <= r.h_cond_nats <= math.log(len(ct)) + 1e-9


def test_bradley_terry_witness(spark, duck):
    rows = duck.sql(
        f"SELECT user_id, CAST(ts AS DATE), event_type,"
        f" CAST(round(value*100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    daily = collections.defaultdict(int)
    for u, d, t, c in rows:
        daily[(u, d, t)] += c
    types = ("click", "error", "purchase", "signup", "view")
    pairs = [
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    ]
    byday = collections.defaultdict(dict)
    for (u, d, t), c in daily.items():
        byday[(u, d)][t] = c
    n = collections.Counter()
    w = collections.Counter()
    for _ud, tc in byday.items():
        present = sorted(tc)
        for i, a in enumerate(present):
            for b in present[i + 1 :]:
                n[(a, b)] += 1
                if tc[a] >= tc[b]:
                    w[(a, b)] += 1
    wins = {
        t: sum(w[(a, b)] for a, b in pairs if a == t)
        + sum(n[(a, b)] - w[(a, b)] for a, b in pairs if b == t)
        for t in types
    }
    pi = {t: 1.0 for t in types}
    for _it in range(2):
        new = {}
        for t in types:
            den = 0.0
            for a, b in pairs:
                if a == t:
                    den += n[(a, b)] / (pi[t] + pi[b])
                elif b == t:
                    den += n[(a, b)] / (pi[t] + pi[a])
            new[t] = wins[t] / den
        pi = new
    r = STAGED_QUERIES["q_bradley_terry"](spark, SF_DIR).collect()[0]
    for t in types:
        assert getattr(r, f"wins_{t}") == wins[t]
        assert getattr(r, f"pi2_{t}") == pytest.approx(pi[t], rel=1e-9)
    s = sum(pi.values())
    share_sum = 0
    for t in types:
        share = math.floor(pi[t] * 1e9 / s + 0.5)
        assert abs(getattr(r, f"share_{t}_nano") - share) <= 1
        share_sum += getattr(r, f"share_{t}_nano")
    assert abs(share_sum - 10**9) <= 5  # shares partition unity


@pytest.mark.parametrize(
    "name",
    ["q_kalman_1d", "q_transition_entropy", "q_bradley_terry"],
)
def test_no_python_row_udfs_in_round12_staged_b8(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ------------------------------------------------ staging batch 9
# (round-13 candidates: robust decomposition / SPRT / spectral / R-S)


def _daily_dollars(duck):
    rows = duck.sql(
        f"SELECT event_type, datediff('day', DATE '2024-01-01',"
        f" CAST(ts AS DATE)), CAST(round(value*100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    cents = collections.defaultdict(int)
    for t, d, c in rows:
        cents[(t, d)] += c
    types = sorted({t for t, _d in cents})
    return {
        t: [cents.get((t, d), 0) // 100 for d in range(30)] for t in types
    }


def test_median_polish_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, datediff('day', DATE '2024-01-01',"
        f" CAST(ts AS DATE)) % 7, CAST(round(value*100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    v = collections.defaultdict(int)
    for t, dow, c in rows:
        v[(t, dow)] += c
    types = sorted({t for t, _d in v})
    e = {(t, d): v.get((t, d), 0) for t in types for d in range(7)}
    r_eff = {t: 0 for t in types}
    c_eff = {d: 0 for d in range(7)}
    for _sweep in range(2):
        for t in types:
            m = sorted(e[(t, d)] for d in range(7))[3]
            for d in range(7):
                e[(t, d)] -= m
            r_eff[t] += m
        for d in range(7):
            m = sorted(e[(t, d)] for t in types)[2]
            for t in types:
                e[(t, d)] -= m
            c_eff[d] += m
    got = {
        (r.t, r.dow): r
        for r in STAGED_QUERIES["q_median_polish"](spark, SF_DIR).collect()
    }
    assert set(got) == set(e)
    for (t, d), resid in e.items():
        r = got[(t, d)]
        assert (r.resid, r.row_eff, r.col_eff) == (
            resid, r_eff[t], c_eff[d],
        )
        # decomposition identity holds cell by cell, exactly
        assert r.row_eff + r.col_eff + r.resid == v.get((t, d), 0)


def test_sprt_boundary_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, ts, event_id,"
        f" CAST(round(value*100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
        f" ORDER BY event_type, ts, event_id"
    ).fetchall()
    step = math.floor(math.log(0.55 / 0.45) * 1e9 + 0.5)
    bound = math.floor(math.log(19.0) * 1e9 + 0.5)
    seqs = collections.defaultdict(list)
    for t, _ts, _eid, c in rows:
        seqs[t].append(1 if c > 5000 else 0)
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_sprt_boundary"](spark, SF_DIR).collect()
    }
    assert set(got) == set(seqs)
    for t, ys in seqs.items():
        s = 0
        first, decision = None, "CONTINUE"
        for k, y in enumerate(ys, 1):
            s += y
            cum = (2 * s - k) * step
            if first is None and (cum >= bound or cum <= -bound):
                first = k
                decision = "H1" if cum >= bound else "H0"
        r = got[t]
        assert r.n == len(ys)
        assert r.first_cross_k == first
        assert r.decision == decision
        assert r.llr_final_nano == (2 * s - len(ys)) * step


def test_periodogram_witness(spark, duck):
    daily = _daily_dollars(duck)
    trig = {
        (k, t): (
            math.floor(math.cos(2 * math.pi * k * t / 30) * 1e6 + 0.5),
            math.floor(math.sin(2 * math.pi * k * t / 30) * 1e6 + 0.5),
        )
        for k in range(1, 5)
        for t in range(30)
    }
    got = {
        (r.t, r.k): r
        for r in STAGED_QUERIES["q_periodogram"](spark, SF_DIR).collect()
    }
    assert set(got) == {(t, k) for t in daily for k in range(1, 5)}
    for t, xs in daily.items():
        powers = {}
        for k in range(1, 5):
            re = sum(x * trig[(k, d)][0] for d, x in enumerate(xs))
            im = sum(x * trig[(k, d)][1] for d, x in enumerate(xs))
            powers[k] = re * re + im * im
            r = got[(t, k)]
            assert (r.re_micro, r.im_micro) == (re, im)
            assert int(r.power) == powers[k]
        best = max(powers.values())
        doms = [k for k in range(1, 5) if got[(t, k)].dominant]
        assert doms == [k for k in range(1, 5) if powers[k] == best]


def test_hurst_rs_witness(spark, duck):
    daily = _daily_dollars(duck)
    got = {
        r.t: r for r in STAGED_QUERIES["q_hurst_rs"](spark, SF_DIR).collect()
    }
    assert set(got) == set(daily)
    for t, xs in daily.items():
        n, s, ss = 30, sum(xs), sum(x * x for x in xs)
        cum, c = [], 0
        for x in xs:
            c += n * x - s
            cum.append(c)
        r_lat = max(max(cum), 0) - min(min(cum), 0)
        disc = n * ss - s * s
        r = got[t]
        assert (r.n, r.r_lattice, r.disc) == (n, r_lat, disc)
        rs = r_lat / math.sqrt(disc)
        assert r.rs_ratio == pytest.approx(rs, rel=1e-12)
        h = math.floor(math.log(rs) / math.log(15.0) * 1e9 + 0.5)
        assert abs(r.hurst_nano - h) <= 1
        assert 0.0 < r.hurst_nano / 1e9 <= 1.2  # sane Hurst range


@pytest.mark.parametrize(
    "name",
    ["q_median_polish", "q_sprt_boundary", "q_periodogram", "q_hurst_rs"],
)
def test_no_python_row_udfs_in_round12_staged_b9(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 10


def test_good_turing_witness(spark, duck):
    rows = duck.sql(
        f"SELECT text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    freq = collections.Counter()
    n_grams = 0
    for (text,) in rows:
        toks = [t for t in text.lower().split(" ") if t]
        for i in range(len(toks) - 2):
            freq[" ".join(toks[i : i + 3])] += 1
            n_grams += 1
    ff = collections.Counter(freq.values())
    got = {
        r.r: r
        for r in STAGED_QUERIES["q_good_turing"](spark, SF_DIR).collect()
    }
    assert set(got) == set(range(1, 9))
    for r in range(1, 9):
        g = got[r]
        assert (g.n_r, g.n_next) == (ff.get(r, 0), ff.get(r + 1, 0))
        if ff.get(r, 0):
            rstar = (r + 1) * ff.get(r + 1, 0) / ff[r]
            assert g.rstar == pytest.approx(rstar, rel=1e-12)
            assert g.p_gt == pytest.approx(rstar / n_grams, rel=1e-12)
        else:
            assert (g.rstar, g.p_gt) == (0.0, 0.0)
        assert g.p0 == pytest.approx(ff.get(1, 0) / n_grams, rel=1e-12)
    # Good-Turing discounts singletons below their raw count
    assert got[1].rstar < 1.0 and got[1].n_r > 0


def test_energy_distance_witness(spark, duck):
    rows = duck.sql(
        f"SELECT l_linestatus, l_returnflag, CAST(l_quantity AS BIGINT)"
        f" FROM '{SF_DIR}/lineitem.parquet'"
        f" WHERE l_returnflag IN ('A', 'R')"
    ).fetchall()
    hist = collections.defaultdict(collections.Counter)
    for ls, fl, q in rows:
        hist[(ls, fl)][q] += 1

    def pairsum(ha, hb):
        return sum(
            abs(v - w) * cv * cw
            for v, cv in ha.items()
            for w, cw in hb.items()
        )

    for r in STAGED_QUERIES["q_energy_distance"](spark, SF_DIR).collect():
        ha, hb = hist[(r.ls, "A")], hist[(r.ls, "R")]
        na, nb = sum(ha.values()), sum(hb.values())
        sab, saa, sbb = pairsum(ha, hb), pairsum(ha, ha), pairsum(hb, hb)
        assert (r.n_a, r.n_b) == (na, nb)
        assert (r.s_ab, r.s_aa, r.s_bb) == (sab, saa, sbb)
        e = 2 * sab / (na * nb) - saa / na**2 - sbb / nb**2
        assert r.energy == pytest.approx(e, rel=1e-12)
        assert r.energy >= 0.0  # E-distance is a metric: nonnegative


def test_cramer_von_mises_witness(spark, duck):
    import datetime

    rows = duck.sql(
        f"SELECT event_type, CAST(round(value * 100) AS BIGINT),"
        f" CAST(ts AS DATE) FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    anchor = datetime.date(2024, 1, 1)
    samples = collections.defaultdict(lambda: ([], []))
    for t, v, d in rows:
        we = (d - anchor).days % 7 in (5, 6)
        samples[t][0 if we else 1].append(v)
    for r in STAGED_QUERIES["q_cramer_von_mises"](spark, SF_DIR).collect():
        wk, wd = samples[r.t]
        n, m = len(wk), len(wd)
        assert (r.n, r.m) == (n, m)
        a = collections.Counter(wk)
        b = collections.Counter(wd)
        ca = cb = 0
        num = 0
        for v in sorted(set(a) | set(b)):
            ca += a.get(v, 0)
            cb += b.get(v, 0)
            num += (m * ca - n * cb) ** 2 * (a.get(v, 0) + b.get(v, 0))
        assert int(r.t_num) == num
        tstat = num / (n * m * (n + m) ** 2)
        assert r.tstat == pytest.approx(tstat, rel=1e-12)
        assert r.reject == (1000 * num > 461 * n * m * (n + m) ** 2)


def test_cochran_armitage_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, hour(ts) // 5,"
        f" CAST(round(value * 100) AS BIGINT) > 5000"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    cells = collections.defaultdict(lambda: [0, 0])
    for t, w, s in rows:
        cells[(t, w)][0] += 1
        cells[(t, w)][1] += 1 if s else 0
    types = sorted({t for t, _ in cells})
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_cochran_armitage"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(types)
    for t in types:
        N = sum(cells[(t, w)][0] for w in range(5) if (t, w) in cells)
        S = sum(cells[(t, w)][1] for w in range(5) if (t, w) in cells)
        swn = sum(
            w * cells[(t, w)][0] for w in range(5) if (t, w) in cells
        )
        sws = sum(
            w * cells[(t, w)][1] for w in range(5) if (t, w) in cells
        )
        swwn = sum(
            w * w * cells[(t, w)][0] for w in range(5) if (t, w) in cells
        )
        trend = N * sws - S * swn
        z2n = N * trend * trend
        z2d = S * (N - S) * (N * swwn - swn * swn)
        r = got[t]
        assert (r.n_total, r.s_total, r.trend_num) == (N, S, trend)
        assert (int(r.z2_num), int(r.z2_den)) == (z2n, z2d)
        z2 = 0.0 if z2d == 0 else z2n / z2d
        assert r.z2 == pytest.approx(z2, rel=1e-12)
        assert r.reject == (10000 * z2n > 38416 * z2d)
    # the success cut is genuinely mixed on the fixture
    assert any(0 < got[t].s_total < got[t].n_total for t in types)


@pytest.mark.parametrize(
    "name",
    [
        "q_good_turing",
        "q_energy_distance",
        "q_cramer_von_mises",
        "q_cochran_armitage",
    ],
)
def test_no_python_row_udfs_in_round12_staged_b10(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 11


def test_icc_oneway_witness(spark, duck):
    daily = _daily_cents(duck)
    types = sorted(daily)
    grid = {
        (t, d): daily[t].get(d, 0)
        for t in types
        for d in sorted({dd for v in daily.values() for dd in v})
    }
    days = sorted({d for _, d in grid})
    assert len(days) == 30 and len(types) == 5
    y = {
        (t, i): daily[t].get(d, 0) // 100
        for t in types
        for i, d in enumerate(days)
    }
    n, k = 30, 5
    t_i = [sum(y[(t, i)] for t in types) for i in range(n)]
    g = sum(t_i)
    st2 = sum(v * v for v in t_i)
    syy = sum(v * v for v in y.values())
    a = n * st2 - g * g
    b = k * syy - st2
    p = (k - 1) * a - (n - 1) * b
    q = (k - 1) * (a + (n - 1) * b)
    [r] = STAGED_QUERIES["q_icc_oneway"](spark, SF_DIR).collect()
    assert (r.n_items, r.k, r.a, r.b, r.p, r.q) == (n, k, a, b, p, q)
    assert r.msb == pytest.approx(a / (n * k * (n - 1)), rel=1e-12)
    assert r.msw == pytest.approx(b / (k * n * (k - 1)), rel=1e-12)
    assert r.icc == pytest.approx(p / q, rel=1e-12)
    assert r.reliable == (2 * p > q)
    assert -1.0 / (k - 1) <= r.icc <= 1.0  # ICC(1) analytic range


def test_log_rank_witness(spark, duck):
    rows = duck.sql(
        f"SELECT user_id, datediff('day', CAST(MIN(ts) AS DATE),"
        f" CAST(MAX(ts) AS DATE)) FROM '{SF_DIR}/events.parquet'"
        f" GROUP BY user_id"
    ).fetchall()
    life = []
    for uid, t in rows:
        arm = int(hashlib.md5(f"{uid}:lr".encode()).hexdigest()[:8], 16) % 2
        life.append((t, 1 if uid % 4 != 0 else 0, arm))
    times = sorted({t for t, _, _ in life})
    u_sum = v_sum = n_times = 0
    for tt in times:
        d1 = sum(e for t, e, a in life if t == tt and a == 1)
        d = sum(e for t, e, _ in life if t == tt)
        n1 = sum(1 for t, _, a in life if t >= tt and a == 1)
        n = sum(1 for t, _, _ in life if t >= tt)
        if d == 0:
            continue
        n_times += 1
        u_sum += math.floor((n * d1 - d * n1) / n * 1e9 + 0.5)
        if n > 1:
            v_sum += math.floor(
                d * n1 * (n - n1) * (n - d) / (n * n * (n - 1)) * 1e9
                + 0.5
            )
    [r] = STAGED_QUERIES["q_log_rank"](spark, SF_DIR).collect()
    assert (r.n_times, r.u_nano, r.v_nano) == (n_times, u_sum, v_sum)
    z2 = (u_sum / 1e9) ** 2 / (v_sum / 1e9)
    assert r.z2 == pytest.approx(z2, rel=1e-12)
    assert r.reject == (10000 * u_sum * u_sum > 38416 * 10**9 * v_sum)


def test_deming_regression_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    xs = [daily["click"].get(d, 0) // 100 for d in days]
    ys = [daily["view"].get(d, 0) // 100 for d in days]
    n = len(days)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    bx = n * sxx - sx * sx
    ay = n * syy - sy * sy
    c = n * sxy - sx * sy
    [r] = STAGED_QUERIES["q_deming_regression"](spark, SF_DIR).collect()
    assert (r.n, r.bx, r.ay, r.c) == (n, bx, ay, c)
    slope = (ay - bx + math.sqrt((ay - bx) ** 2 + 4 * c * c)) / (2 * c)
    assert r.slope == pytest.approx(slope, rel=1e-12)
    assert r.intercept == pytest.approx((sy - slope * sx) / n, rel=1e-12)
    assert r.positively_associated == (c > 0)
    # Deming slope majorizes the OLS slope when both noises share scale
    assert abs(slope) >= abs(c / bx) - 1e-12


def test_mood_median_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, CAST(round(value * 100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    vals = sorted(v for _, v in rows)
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]
    per = collections.defaultdict(lambda: [0, 0])
    for t, v in rows:
        per[t][0] += 1
        per[t][1] += 1 if v > med else 0
    a = sum(ab for _, ab in per.values())
    chi2 = 0
    cells = {}
    for t, (nt, o) in per.items():
        num = (n * o - nt * a) ** 2
        cells[t] = math.floor(num / (nt * a * (n - a)) * 1e9 + 0.5)
        chi2 += cells[t]
    got = {
        r.t: r for r in STAGED_QUERIES["q_mood_median"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for t, r in got.items():
        nt, o = per[t]
        assert (r.n_t, r.above, r.below) == (nt, o, nt - o)
        assert r.grand_median == med
        assert r.cell_nano == cells[t]
        assert r.chi2_nano == chi2
        assert r.reject == (chi2 > 9488000000)


@pytest.mark.parametrize(
    "name",
    ["q_icc_oneway", "q_log_rank", "q_deming_regression", "q_mood_median"],
)
def test_no_python_row_udfs_in_round12_staged_b11(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 12


def test_knapsack_dp_witness(spark, duck):
    rows = duck.sql(
        f"SELECT c_nationkey, c_custkey, CAST(round(c_acctbal * 100)"
        f" AS BIGINT) FROM '{SF_DIR}/customer.parquet'"
        f" WHERE c_acctbal > 0"
    ).fetchall()
    per = collections.defaultdict(list)
    for nk, ck, v in rows:
        per[nk].append((v, ck))
    got = {
        r.nk: r
        for r in STAGED_QUERIES["q_knapsack_dp"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for nk, items in per.items():
        top = sorted(items, key=lambda t: (-t[0], t[1]))[:10]
        wv = [(1 + ck % 7, v) for v, ck in top]
        best = 0
        for mask in range(1 << len(wv)):
            w = sum(wv[i][0] for i in range(len(wv)) if mask >> i & 1)
            v = sum(wv[i][1] for i in range(len(wv)) if mask >> i & 1)
            if w <= 15:
                best = max(best, v)
        r = got[nk]
        assert (r.n_items, r.capacity) == (len(wv), 15)
        assert r.total_value == sum(v for _, v in wv)
        assert r.best_value == best
        assert r.best_value <= r.total_value


def test_elo_ratings_witness(spark, duck):
    from aws_vpcflowlogs_parquet_spark.plans.staging import (
        _ELO_E,
        _ELO_PLAYERS,
    )

    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    ratings = [1500000] * 5
    wins = [0] * 5
    n_games = 0
    for d in days:
        for ia in range(5):
            for ib in range(ia + 1, 5):
                xa = daily[_ELO_PLAYERS[ia]].get(d, 0)
                xb = daily[_ELO_PLAYERS[ib]].get(d, 0)
                sa = 1 if xa >= xb else 0
                idx = (
                    max(min(ratings[ib] - ratings[ia], 400000), -400000)
                    + 400000
                ) // 25000
                delta = 16 * (1000 * sa - _ELO_E[idx])
                ratings[ia] += delta
                ratings[ib] -= delta
                wins[ia if sa else ib] += 1
                n_games += 1
    got = {
        r.player: r
        for r in STAGED_QUERIES["q_elo_ratings"](spark, SF_DIR).collect()
    }
    assert set(got) == set(_ELO_PLAYERS)
    for i, p in enumerate(_ELO_PLAYERS):
        assert got[p].rating_milli == ratings[i], p
        assert got[p].n_wins == wins[i], p
        assert got[p].n_games == n_games // 10 * 4
    # Elo is zero-sum: total rating mass is invariant
    assert sum(r.rating_milli for r in got.values()) == 5 * 1500000


def test_croston_witness(spark, duck):
    rows = duck.sql(
        f"SELECT user_id % 8, CAST(ts AS DATE),"
        f" CAST(round(value * 100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet' WHERE event_type = 'signup'"
    ).fetchall()
    import datetime

    anchor = datetime.date(2024, 1, 1)
    daily = collections.defaultdict(int)
    for bk, d, c in rows:
        daily[(bk, (d - anchor).days)] += c
    got = {
        r.bk: r for r in STAGED_QUERIES["q_croston"](spark, SF_DIR).collect()
    }
    assert set(got) == set(range(8))
    for bk in range(8):
        seen, z, i, since, nd = 0, 0, 0, 0, 0
        for d in range(30):
            q = daily.get((bk, d), 0)
            if q > 0:
                nd += 1
                if seen == 0:
                    z, i, seen = q, (since + 1) * 1000, 1
                else:
                    z = (3 * q + 7 * z) // 10
                    i = (3 * (since + 1) * 1000 + 7 * i) // 10
                since = 0
            else:
                since += 1
        r = got[bk]
        assert (r.n_demands, r.z_cents, r.i_milli) == (nd, z, i)
        fc = 0.0 if i == 0 else z * 1000 / i
        assert r.forecast == pytest.approx(fc, rel=1e-12)
        assert r.i_milli >= 1000 or r.n_demands == 0  # interval >= 1 day


@pytest.mark.parametrize(
    "name", ["q_knapsack_dp", "q_elo_ratings", "q_croston"]
)
def test_no_python_row_udfs_in_round12_staged_b12(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 13


def test_hodges_lehmann_witness(spark, duck):
    rows = duck.sql(
        f"SELECT l_returnflag, CAST(l_quantity AS BIGINT)"
        f" FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    per = collections.defaultdict(list)
    for fl, q in rows:
        per[fl].append(q)
    got = {
        r.fl: r
        for r in STAGED_QUERIES["q_hodges_lehmann"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for fl, xs in per.items():
        n = len(xs)
        xs = sorted(xs)
        walsh = sorted(
            xs[i] + xs[j] for i in range(n) for j in range(i, n)
        )
        m = len(walsh)
        s_star = walsh[(m + 1) // 2 - 1]
        r = got[fl]
        assert (r.n, r.m_pairs, r.s_star) == (n, m, s_star)
        assert r.hl_estimate == pytest.approx(s_star / 2.0)
        # HL sits inside the sample range
        assert xs[0] <= r.hl_estimate <= xs[-1]


def test_page_trend_witness(spark, duck):
    daily = _daily_cents(duck)
    types = sorted(daily)
    days = sorted({d for v in daily.values() for d in v})
    assert len(days) == 30
    r2_sum = dict.fromkeys(types, 0)
    for d in days:
        vals = {t: daily[t].get(d, 0) for t in types}
        for t in types:
            r2 = (
                sum(
                    2 if vals[u] < vals[t] else (1 if vals[u] == vals[t] else 0)
                    for u in types
                )
                + 1
            )
            r2_sum[t] += r2
    l2 = sum((j + 1) * r2_sum[t] for j, t in enumerate(types))
    got = {
        r.t: r for r in STAGED_QUERIES["q_page_trend"](spark, SF_DIR).collect()
    }
    assert set(got) == set(types)
    e_l, sd = 30 * 5 * 36 / 4.0, math.sqrt(30 * 25 * 36 * 4 / 144.0)
    for j, t in enumerate(types):
        r = got[t]
        assert (r.j, r.r2_sum, r.l2) == (j + 1, r2_sum[t], l2)
        assert r.z == pytest.approx((l2 / 2.0 - e_l) / sd, rel=1e-12)
        assert r.increasing == (l2 / 2.0 > e_l + 1.6449 * sd)
    # doubled ranks over 30 blocks of 5 always total 30 * (2+4+...+10)
    assert sum(r2_sum.values()) == 30 * 30


def test_triad_motifs_witness(spark, duck):
    rows = duck.sql(
        f"SELECT DISTINCT user_id % 97,"
        f" (2 * user_id + event_id) % 97 FROM '{SF_DIR}/events.parquet'"
        f" WHERE user_id % 97 != (2 * user_id + event_id) % 97"
    ).fetchall()
    edges = set(rows)
    n_mutual = sum(1 for s, d in edges if (d, s) in edges) // 2
    p2 = sum(
        1
        for s, d in edges
        for d2 in [e[1] for e in edges if e[0] == d]
        if d2 != s
    )
    cyc = sum(
        1
        for (u, v) in edges
        for (v2, w) in edges
        if v2 == v and (w, u) in edges and u < v and u < w
    )
    tra = sum(
        1
        for (u, v) in edges
        for (v2, w) in edges
        if v2 == v and w != u and (u, w) in edges
    )
    [r] = STAGED_QUERIES["q_triad_motifs"](spark, SF_DIR).collect()
    assert (r.n_edges, r.n_mutual_pairs) == (len(edges), n_mutual)
    assert (r.n_path2, r.n_cyclic3, r.n_trans3) == (p2, cyc, tra)
    assert r.closure_micro == r.n_trans3 * 1000000 // r.n_path2
    assert r.closure == pytest.approx(tra / p2, rel=1e-12)


def test_dtw_distance_witness(spark, duck):
    daily = _daily_cents(duck)
    import datetime

    anchor = datetime.date(2024, 1, 1)
    prof = {}
    for t, per_day in daily.items():
        p = [0] * 7
        for d, c in per_day.items():
            p[(d - anchor).days % 7] += c
        prof[t] = [v // 100 for v in p]

    def dtw(x, y):
        big = float("inf")
        d = [[big] * 7 for _ in range(7)]
        for i in range(7):
            for j in range(7):
                cost = abs(x[i] - y[j])
                if i == 0 and j == 0:
                    d[i][j] = cost
                elif i == 0:
                    d[i][j] = cost + d[0][j - 1]
                elif j == 0:
                    d[i][j] = cost + d[i - 1][0]
                else:
                    d[i][j] = cost + min(
                        d[i - 1][j], d[i][j - 1], d[i - 1][j - 1]
                    )
        return d[6][6]

    rows = STAGED_QUERIES["q_dtw_distance"](spark, SF_DIR).collect()
    types = sorted(prof)
    assert [(r.ta, r.tb) for r in rows] == [
        (a, b) for a in types for b in types if a < b
    ]
    for r in rows:
        x, y = prof[r.ta], prof[r.tb]
        assert r.dtw == dtw(x, y)
        l1 = sum(abs(a - b) for a, b in zip(x, y))
        assert r.l1_diag == l1
        assert r.dtw <= l1  # warping can only help


@pytest.mark.parametrize(
    "name",
    ["q_hodges_lehmann", "q_page_trend", "q_triad_motifs", "q_dtw_distance"],
)
def test_no_python_row_udfs_in_round12_staged_b13(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 14


def test_mantel_haenszel_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, user_id,"
        f" CAST(round(value * 100) AS BIGINT) > 5000"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    cells = collections.defaultdict(lambda: [0, 0, 0, 0])
    for t, uid, hit in rows:
        exp = int(hashlib.md5(f"{uid}:mh".encode()).hexdigest()[:8], 16) % 2
        i = (
            0
            if (exp and hit)
            else 1 if exp else 2 if hit else 3
        )
        cells[t][i] += 1
    num = den = 0
    rs = {}
    for t, (a, b, c, d) in cells.items():
        n = a + b + c + d
        r_nano = math.floor(a * d / n * 1e9 + 0.5)
        s_nano = math.floor(b * c / n * 1e9 + 0.5)
        rs[t] = (a, b, c, d, r_nano, s_nano)
        num += r_nano
        den += s_nano
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_mantel_haenszel"](spark, SF_DIR).collect()
    }
    assert set(got) == set(cells)
    for t, r in got.items():
        a, b, c, d, r_nano, s_nano = rs[t]
        assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
        assert (r.r_nano, r.s_nano) == (r_nano, s_nano)
        assert (r.num_nano, r.den_nano) == (num, den)
        assert r.or_mh == pytest.approx(num / den, rel=1e-12)
        assert r.harmful == (num > den)


def test_nelson_aalen_witness(spark, duck):
    rows = duck.sql(
        f"SELECT user_id, datediff('day', CAST(MIN(ts) AS DATE),"
        f" CAST(MAX(ts) AS DATE)) FROM '{SF_DIR}/events.parquet'"
        f" GROUP BY user_id"
    ).fetchall()
    life = [(t, 1 if uid % 4 != 0 else 0) for uid, t in rows]
    times = sorted({t for t, _ in life})
    cum = 0
    expect = []
    for tt in times:
        d = sum(e for t, e in life if t == tt)
        n = sum(1 for t, _ in life if t >= tt)
        if d == 0:
            continue
        h = math.floor(d / n * 1e9 + 0.5)
        cum += h
        expect.append((tt, d, n, h, cum))
    rows2 = STAGED_QUERIES["q_nelson_aalen"](spark, SF_DIR).collect()
    assert [
        (r.t_days, r.n_events, r.n_risk, r.h_nano, r.hcum_nano)
        for r in rows2
    ] == expect
    for r in rows2:
        assert r.h_cum == pytest.approx(r.hcum_nano / 1e9, rel=1e-12)
    # H is nondecreasing and dominates -ln(S_KM) partial sums' first term
    assert all(
        a.hcum_nano <= b.hcum_nano for a, b in zip(rows2, rows2[1:])
    )


def test_little_law_witness(spark, duck):
    rows = duck.sql(
        f"SELECT user_id, CAST(epoch_us(MIN(ts)) // 1000000 AS BIGINT),"
        f" CAST(epoch_us(MAX(ts)) // 1000000 AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet' GROUP BY user_id"
    ).fetchall()
    n = len(rows)
    wait = sum(dep - arr for _, arr, dep in rows)
    t0 = min(arr for _, arr, _ in rows)
    t1 = max(dep for _, _, dep in rows)
    # independent sweep
    deltas = collections.Counter()
    for _, arr, dep in rows:
        deltas[arr] += 1
        deltas[dep] -= 1
    pts = sorted(deltas)
    area = 0
    active = 0
    for a, b in zip(pts, pts[1:]):
        active += deltas[a]
        area += active * (b - a)
    [r] = STAGED_QUERIES["q_little_law"](spark, SF_DIR).collect()
    assert (r.n_users, r.total_wait_s, r.area_s) == (n, wait, area)
    assert r.horizon_s == t1 - t0
    assert r.identity_exact and wait == area  # Little's law, exactly
    assert r.lambda_per_hr == pytest.approx(n * 3600 / (t1 - t0), rel=1e-12)
    assert r.w_mean_s == pytest.approx(wait / n, rel=1e-12)
    assert r.l_avg == pytest.approx(area / (t1 - t0), rel=1e-12)


def test_huffman_cost_witness(spark, duck):
    import heapq

    rows = duck.sql(
        f"SELECT user_id % 8, COUNT(*) FROM '{SF_DIR}/events.parquet'"
        f" GROUP BY 1"
    ).fetchall()
    heap = sorted(int(w) for _, w in rows)
    heapq.heapify(heap)
    cost = 0
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        cost += a + b
        heapq.heappush(heap, a + b)
    total = sum(int(w) for _, w in rows)
    [r] = STAGED_QUERIES["q_huffman_cost"](spark, SF_DIR).collect()
    assert (r.n_symbols, r.total_weight, r.huffman_cost) == (8, total, cost)
    assert r.avg_bits == pytest.approx(cost / total, rel=1e-12)
    # Huffman cost for 8 roughly-equal weights is ~3 bits/symbol
    assert 1.0 <= r.avg_bits <= 7.0


@pytest.mark.parametrize(
    "name",
    ["q_mantel_haenszel", "q_nelson_aalen", "q_little_law", "q_huffman_cost"],
)
def test_no_python_row_udfs_in_round12_staged_b14(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 15


def _gs_instance(duck):
    rows = duck.sql(
        f"SELECT c.c_mktsegment, o.o_orderpriority,"
        f" SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))"
        f" FROM '{SF_DIR}/orders.parquet' o"
        f" JOIN '{SF_DIR}/customer.parquet' c"
        f" ON c.c_custkey = o.o_custkey"
        f" GROUP BY 1, 2"
    ).fetchall()
    from aws_vpcflowlogs_parquet_spark.plans.staging import (
        _GS_PRIS,
        _GS_SEGS,
    )

    aff = {}
    for seg, pri, a in rows:
        if seg in _GS_SEGS and pri in _GS_PRIS:
            aff[(_GS_SEGS.index(seg), _GS_PRIS.index(pri))] = int(a)
    return aff


def test_transportation_nw_witness(spark, duck):
    sup_rows = duck.sql(
        f"SELECT c.c_mktsegment, SUM(CAST(l.l_quantity AS BIGINT))"
        f" FROM '{SF_DIR}/lineitem.parquet' l"
        f" JOIN '{SF_DIR}/orders.parquet' o ON o.o_orderkey = l.l_orderkey"
        f" JOIN '{SF_DIR}/customer.parquet' c ON c.c_custkey = o.o_custkey"
        f" GROUP BY 1 ORDER BY 1"
    ).fetchall()
    dem_rows = duck.sql(
        f"SELECT o.o_orderpriority, SUM(CAST(l.l_quantity AS BIGINT))"
        f" FROM '{SF_DIR}/lineitem.parquet' l"
        f" JOIN '{SF_DIR}/orders.parquet' o ON o.o_orderkey = l.l_orderkey"
        f" GROUP BY 1 ORDER BY 1"
    ).fetchall()
    si = [int(s) for _, s in sup_rows]
    dj = [int(d) for _, d in dem_rows]
    assert sum(si) == sum(dj)  # balanced by construction
    sup0, dem0 = si[:], dj[:]
    i = j = 0
    allocs = []
    for step in range(1, 10):
        q = min(si[i], dj[j])
        allocs.append((i, j, q, step))
        si[i] -= q
        dj[j] -= q
        if si[i] == 0 and i < 4:
            i += 1
        elif j < 4:
            j += 1
    rows = STAGED_QUERIES["q_transportation_nw"](spark, SF_DIR).collect()
    assert [(r.i, r.j, r.alloc, r.step) for r in rows] == [
        a for a in allocs if a[2] > 0
    ]
    # feasibility invariants
    row_sums = collections.Counter()
    col_sums = collections.Counter()
    for r in rows:
        row_sums[r.i] += r.alloc
        col_sums[r.j] += r.alloc
    assert [row_sums[k] for k in range(5)] == sup0
    assert [col_sums[k] for k in range(5)] == dem0
    assert len(rows) <= 9  # at most m + n - 1 basic cells


def test_gale_shapley_witness(spark, duck):
    from aws_vpcflowlogs_parquet_spark.plans.staging import (
        _GS_PRIS,
        _GS_SEGS,
    )

    aff = _gs_instance(duck)
    assert len(aff) == 16  # every cell populated on the fixture
    pm = {
        i: sorted(range(4), key=lambda j: (-aff[(i, j)], j))
        for i in range(4)
    }
    wrank = {
        j: {
            i: rank
            for rank, i in enumerate(
                sorted(range(4), key=lambda i: (-aff[(i, j)], i)), 1
            )
        }
        for j in range(4)
    }
    # textbook serial GS (independent implementation)
    nxt = [0] * 4
    cur = [-1] * 4
    while True:
        free = [
            m
            for m in range(4)
            if m not in cur and nxt[m] < 4
        ]
        if not free:
            break
        m = free[0]
        j = pm[m][nxt[m]]
        nxt[m] += 1
        if cur[j] == -1 or wrank[j][m] < wrank[j][cur[j]]:
            cur[j] = m
    rows = STAGED_QUERIES["q_gale_shapley"](spark, SF_DIR).collect()
    got = {r.acceptor: r for r in rows}
    assert len(rows) == 4
    match = {}
    for j in range(4):
        r = got[_GS_PRIS[j]]
        m = _GS_SEGS.index(r.proposer)
        match[j] = m
        assert m == cur[j]  # man-optimal matching reproduced
        assert r.affinity_cents == aff[(m, j)]
        assert r.acceptor_rank_of_match == wrank[j][m]
        assert r.proposer_rank_of_match == pm[m].index(j) + 1
    # STABILITY: no blocking pair (m, j) where both prefer each other
    for m in range(4):
        jm = next(j for j, mm in match.items() if mm == m)
        for j in range(4):
            if j == jm:
                continue
            m_prefers = pm[m].index(j) < pm[m].index(jm)
            w_prefers = wrank[j][m] < wrank[j][match[j]]
            assert not (m_prefers and w_prefers), (m, j)


def test_rake_keywords_witness(spark, duck):
    rows = duck.sql(
        f"SELECT text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    phrases = []
    for (text,) in rows:
        toks = [t for t in text.lower().split(" ") if t]
        run = []
        for t in toks:
            if t in ("a", "the"):
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(t)
        if run:
            phrases.append(tuple(run))
    freq = collections.Counter()
    deg = collections.Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    wscore = {
        w: math.floor(deg[w] / freq[w] * 1e9 + 0.5) for w in freq
    }
    ptype = collections.Counter(phrases)
    scored = sorted(
        (
            (-sum(wscore[w] for w in p), " ".join(p), len(p), n)
            for p, n in ptype.items()
        ),
    )[:10]
    got = STAGED_QUERIES["q_rake_keywords"](spark, SF_DIR).collect()
    assert len(got) == 10
    for r, (neg, phrase, n_words, n_occ) in zip(got, scored):
        assert r.phrase == phrase
        assert (r.n_words, r.n_occurrences, r.score_nano) == (
            n_words,
            n_occ,
            -neg,
        )
        assert r.score == pytest.approx(-neg / 1e9, rel=1e-12)
    # RAKE favors longer phrases: top phrase has >= 2 words
    assert got[0].n_words >= 2


@pytest.mark.parametrize(
    "name",
    ["q_transportation_nw", "q_gale_shapley", "q_rake_keywords"],
)
def test_no_python_row_udfs_in_round12_staged_b15(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 16


def test_cvar_es_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, CAST(round(value * 100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    per = collections.defaultdict(list)
    for t, v in rows:
        per[t].append(v)
    got = {
        r.t: r for r in STAGED_QUERIES["q_cvar_es"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for t, xs in per.items():
        xs = sorted(xs)
        n = len(xs)
        var = xs[(19 * n + 19) // 20 - 1]
        tail = [v for v in xs if v >= var]
        r = got[t]
        assert (r.n, r.var_cents) == (n, var)
        assert (r.tail_n, r.tail_sum) == (len(tail), sum(tail))
        assert r.es_cents == pytest.approx(sum(tail) / len(tail), rel=1e-12)
        assert r.es_cents >= r.var_cents  # ES dominates VaR (coherence)
        assert r.tail_n <= n - (19 * n + 19) // 20 + len(
            [v for v in xs if v == var]
        )


def test_mean_log_deviation_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, user_id,"
        f" SUM(CAST(round(value * 100) AS BIGINT))"
        f" FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    per = collections.defaultdict(list)
    for t, _, x in rows:
        if x > 0:
            per[t].append(int(x))
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_mean_log_deviation"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(per)
    for t, xs in per.items():
        n = len(xs)
        sum_ln = sum(math.floor(math.log(x) * 1e9 + 0.5) for x in xs)
        ln_mean = math.floor(math.log(sum(xs) / n) * 1e9 + 0.5)
        r = got[t]
        assert (r.n, r.sum_cents) == (n, sum(xs))
        assert (r.sum_ln_nano, r.ln_mean_nano) == (sum_ln, ln_mean)
        mld = ln_mean / 1e9 - sum_ln / 1e9 / n
        assert r.mld == pytest.approx(mld, rel=1e-9)
        assert r.mld >= -1e-9  # Jensen: ln(mean) >= mean(ln)
        assert r.unequal == (10 * (ln_mean * n - sum_ln) > 10**9 * n)


def test_edit_distance_dp_witness(spark, duck):
    names = sorted(
        n
        for (n,) in duck.sql(
            f"SELECT DISTINCT p_name FROM '{SF_DIR}/part.parquet'"
        ).fetchall()
    )

    def lev(a, b):
        prev = list(range(len(a) + 1))
        for j, cb in enumerate(b, 1):
            cur = [j]
            for i, ca in enumerate(a, 1):
                cur.append(
                    min(
                        prev[i] + 1,
                        cur[i - 1] + 1,
                        prev[i - 1] + (0 if ca == cb else 1),
                    )
                )
            prev = cur
        return prev[-1]

    rows = STAGED_QUERIES["q_edit_distance_dp"](spark, SF_DIR).collect()
    assert [(r.name_a, r.name_b) for r in rows] == list(
        zip(names, names[1:])
    )
    for r in rows:
        d = lev(r.name_a, r.name_b)
        assert r.edit_distance == d
        assert (r.len_a, r.len_b) == (len(r.name_a), len(r.name_b))
        # metric bounds
        assert abs(r.len_a - r.len_b) <= d <= max(r.len_a, r.len_b)


@pytest.mark.parametrize(
    "name", ["q_cvar_es", "q_mean_log_deviation", "q_edit_distance_dp"]
)
def test_no_python_row_udfs_in_round12_staged_b16(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 17


def test_hilbert_locality_witness(spark, duck):
    rows = duck.sql(
        f"SELECT DISTINCT user_id % 32, (2 * user_id + event_id) % 32"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    cells = {(int(x), int(y)) for x, y in rows}

    def xy2d(x, y):
        d = 0
        s = 16
        while s > 0:
            rx = (x // s) % 2
            ry = (y // s) % 2
            d += s * s * ((3 * rx) ^ ry)
            xl, yl = x % s, y % s
            if ry == 0:
                if rx == 1:
                    xl, yl = s - 1 - xl, s - 1 - yl
                xl, yl = yl, xl
            x, y = xl, yl
            s //= 2
        return d

    # the defining Hilbert property: consecutive indices are
    # grid-adjacent (unit Manhattan steps) — pins the masked variant
    inv = {xy2d(x, y): (x, y) for x in range(32) for y in range(32)}
    assert len(inv) == 1024
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(1023)
    )

    def zi(x, y):
        d = 0
        for b in range(5):
            d |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return d

    pairs = [
        (a, b)
        for a in cells
        for b in [(a[0] + 1, a[1]), (a[0], a[1] + 1)]
        if b in cells
    ]
    got = {
        r.curve: r
        for r in STAGED_QUERIES["q_hilbert_locality"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == {"hilbert", "zorder"}
    for curve, f in [("hilbert", xy2d), ("zorder", zi)]:
        gaps = [abs(f(*a) - f(*b)) for a, b in pairs]
        r = got[curve]
        assert (r.n_cells, r.n_adj_pairs) == (len(cells), len(gaps))
        assert r.gap1_pairs == sum(1 for g in gaps if g == 1)
        assert (r.gap_sum, r.gap_max) == (sum(gaps), max(gaps))
        assert r.gap1_micro == r.gap1_pairs * 1000000 // r.n_adj_pairs
    # the thesis: Hilbert preserves adjacency better than Z-order
    assert got["hilbert"].gap1_micro > got["zorder"].gap1_micro


def test_cem_matching_witness(spark, duck):
    rows = duck.sql(
        f"SELECT user_id, SUM(CAST(round(value * 100) AS BIGINT)),"
        f" LEAST(COUNT(*) // 10, 5),"
        f" LEAST(datediff('day', CAST(MIN(ts) AS DATE),"
        f" CAST(MAX(ts) AS DATE)) // 10, 2)"
        f" FROM '{SF_DIR}/events.parquet' GROUP BY user_id"
    ).fetchall()
    bins = collections.defaultdict(lambda: [0, 0, 0, 0])
    for uid, y, cb, sb in rows:
        tr = int(hashlib.md5(f"{uid}:cem".encode()).hexdigest()[:8], 16) % 2
        b = bins[(int(sb), int(cb))]
        if tr:
            b[0] += 1
            b[2] += int(y)
        else:
            b[1] += 1
            b[3] += int(y)
    matched = {
        k: v for k, v in bins.items() if v[0] > 0 and v[1] > 0
    }
    n_matched = sum(v[0] for v in matched.values())
    y_t = sum(v[2] for v in matched.values())
    cf = sum(
        math.floor(v[0] * v[3] / v[1] + 0.5) for v in matched.values()
    )
    got = {
        (r.sb, r.cb): r
        for r in STAGED_QUERIES["q_cem_matching"](spark, SF_DIR).collect()
    }
    assert set(got) == set(matched)
    for k, (mt, mc, syt, syc) in matched.items():
        r = got[k]
        assert (r.m_t, r.m_c, r.sum_y_t, r.sum_y_c) == (mt, mc, syt, syc)
        assert r.cf_cents == math.floor(mt * syc / mc + 0.5)
        assert r.n_matched == n_matched
        assert r.att_cents == pytest.approx(
            (y_t - cf) / n_matched, rel=1e-12
        )


def test_welford_fold_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_welford_fold"](spark, SF_DIR).collect()
    }
    assert set(got) == set(daily)
    for t in daily:
        xs = [daily[t].get(d, 0) // 100 for d in days]
        n, mean, m2 = 0, 0.0, 0.0
        for x in xs:
            n += 1
            nm = mean + (x - mean) / n
            m2 = m2 + (x - mean) * (x - nm)
            mean = nm
        s, ss = sum(xs), sum(v * v for v in xs)
        r = got[t]
        assert (r.sum_dollars, r.sumsq) == (s, ss)
        assert r.var_welford == pytest.approx(m2 / 29.0, rel=1e-12)
        ve = (30 * ss - s * s) / (30.0 * 29.0)
        assert r.var_exact == pytest.approx(ve, rel=1e-12)
        assert r.agree  # the two algebraic routes coincide
        assert abs(r.var_welford - ve) < 1e-6 * (1 + ve)


@pytest.mark.parametrize(
    "name", ["q_hilbert_locality", "q_cem_matching", "q_welford_fold"]
)
def test_no_python_row_udfs_in_round12_staged_b17(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 18


def test_theta_forecast_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_theta_forecast"](spark, SF_DIR).collect()
    }
    assert set(got) == set(daily)
    for t in daily:
        xs = [daily[t].get(d, 0) for d in days]
        e = xs[0]
        for x in xs[1:]:
            e = (3 * x + 7 * e) // 10
        s = sum(xs)
        sdx = sum(d * x for d, x in enumerate(xs))
        slope_num = 30 * sdx - 435 * s
        trend30 = s / 30.0 + slope_num / 67425.0 * (30.0 - 14.5)
        r = got[t]
        assert (r.ses_cents, r.slope_num, r.slope_den) == (
            e,
            slope_num,
            67425,
        )
        assert r.trend30_cents == pytest.approx(trend30, rel=1e-12)
        assert r.theta_forecast == pytest.approx(
            0.5 * trend30 + 0.5 * e, rel=1e-12
        )


def test_pacf_durbin_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_pacf_durbin"](spark, SF_DIR).collect()
    }
    assert set(got) == set(daily)
    for t in daily:
        xs = [daily[t].get(d, 0) // 100 for d in days]
        s = sum(xs)
        cx = [30 * x - s for x in xs]
        a = [sum(c * c for c in cx)] + [
            sum(cx[i] * cx[i - k] for i in range(k, 30))
            for k in range(1, 6)
        ]
        r_ = [a[k] / a[0] for k in range(1, 6)]
        phi = [r_[0]]
        pacf = [r_[0]]
        for k in range(1, 5):
            num = r_[k] - sum(phi[i] * r_[k - 1 - i] for i in range(k))
            den = 1.0 - sum(phi[i] * r_[i] for i in range(k))
            pk = num / den
            phi = [phi[j] - pk * phi[k - 1 - j] for j in range(k)] + [pk]
            pacf.append(pk)
        row = got[t]
        assert [
            row.a0, row.a1, row.a2, row.a3, row.a4, row.a5
        ] == a
        for k in range(5):
            assert getattr(row, f"pacf{k + 1}") == pytest.approx(
                pacf[k], rel=1e-9
            )
        assert getattr(row, "pacf1") == pytest.approx(r_[0], rel=1e-12)


def test_tsp_greedy_witness(spark, duck):
    import itertools

    rows = duck.sql(
        f"SELECT user_id % 8,"
        f" SUM(CAST(round(value * 100) AS BIGINT)) % 97, COUNT(*) % 89"
        f" FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    pts = {int(c): (int(x), int(y)) for c, x, y in rows}
    assert set(pts) == set(range(8))

    def dsq(a, b):
        return (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2

    # greedy replay
    cur, vis, legs = 0, {0}, [(0, 0)]
    for _ in range(7):
        best = min(
            (c for c in range(8) if c not in vis),
            key=lambda c: (dsq(cur, c), c),
        )
        legs.append((best, dsq(cur, best)))
        vis.add(best)
        cur = best
    total = sum(d for _, d in legs)
    got = STAGED_QUERIES["q_tsp_greedy"](spark, SF_DIR).collect()
    assert [(r.city, r.leg_dsq) for r in got] == legs
    assert sorted(r.city for r in got) == list(range(8))  # a permutation
    assert all(r.total_dsq == total for r in got)
    # exhaustive optimum over all open tours from city 0
    opt = min(
        sum(
            dsq(p[i], p[i + 1]) for i in range(7)
        )
        for p in (
            (0,) + perm for perm in itertools.permutations(range(1, 8))
        )
    )
    assert opt <= total  # greedy never beats the optimum


@pytest.mark.parametrize(
    "name", ["q_theta_forecast", "q_pacf_durbin", "q_tsp_greedy"]
)
def test_no_python_row_udfs_in_round12_staged_b18(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 19


def test_youden_j_witness(spark, duck):
    rows = duck.sql(
        f"SELECT CAST(floor(value * 2) AS BIGINT),"
        f" CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        f" FROM '{SF_DIR}/events.parquet'"
        f" WHERE event_type IN ('purchase', 'click')"
    ).fetchall()
    p = sum(y for _, y in rows)
    n = len(rows) - p
    bins = sorted({b for b, _ in rows})
    best = None
    for thr in bins:
        tp = sum(1 for b, y in rows if b >= thr and y == 1)
        fp = sum(1 for b, y in rows if b >= thr and y == 0)
        jn = n * tp - p * fp
        key = (-jn, thr)
        if best is None or key < best[0]:
            best = (key, thr, tp, fp, jn)
    _, thr, tp, fp, jn = best
    [r] = STAGED_QUERIES["q_youden_j"](spark, SF_DIR).collect()
    assert (r.best_bin, r.p, r.n, r.tp, r.fp, r.j_num) == (
        thr,
        p,
        n,
        tp,
        fp,
        jn,
    )
    assert (r.fn, r.tn) == (p - tp, n - fp)
    assert r.sensitivity == pytest.approx(tp / p, rel=1e-12)
    assert r.specificity == pytest.approx((n - fp) / n, rel=1e-12)
    assert r.youden_j == pytest.approx(tp / p + (n - fp) / n - 1, rel=1e-9)
    assert -1.0 <= r.youden_j <= 1.0


def test_brier_decomposition_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_id % 100,"
        f" CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    n = len(rows)
    sy = sum(y for _, y in rows)
    brier_num = sum((p - 100 * y) ** 2 for p, y in rows)
    bins = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    for p, y in rows:
        b = bins[p // 10]
        b[0] += 1
        b[1] += p
        b[2] += p * p
        b[3] += y
        b[4] += p * y
    rel = res = wbv = wbc = 0
    for nk, sp, spp, syk, spy in bins.values():
        rel += math.floor((sp - 100 * syk) ** 2 / nk / 1e4 * 1e9 / n + 0.5)
        res += math.floor(
            (n * syk - nk * sy) ** 2 / nk / n / n * 1e9 / n + 0.5
        )
        wbv += math.floor((spp - sp * sp / nk) / 1e4 * 1e9 / n + 0.5)
        wbc += math.floor((spy - sp * syk / nk) / 1e2 * 1e9 / n + 0.5)
    got = STAGED_QUERIES["q_brier_decomposition"](spark, SF_DIR).collect()
    assert len(got) == len(bins)
    ybar = sy / n
    for r in got:
        nk, sp, spp, syk, spy = bins[r.bin]
        assert (r.n_k, r.sp, r.sy) == (nk, sp, syk)
        assert (r.rel_nano, r.res_nano, r.wbv_nano, r.wbc_nano) == (
            rel,
            res,
            wbv,
            wbc,
        )
        assert r.brier == pytest.approx(brier_num / n / 1e4, rel=1e-12)
        assert r.uncertainty == pytest.approx(ybar * (1 - ybar), rel=1e-12)
        assert r.identity_holds  # Murphy's generalized identity
        recon = (
            rel / 1e9
            - res / 1e9
            + ybar * (1 - ybar)
            + wbv / 1e9
            - 2 * wbc / 1e9
        )
        assert abs(r.brier - recon) < 1e-6


def test_banzhaf_power_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    types = sorted(daily)
    seats = collections.Counter()
    for d in days:
        seats[
            max(types, key=lambda t: (daily[t].get(d, 0), [-ord(c) for c in t]))
        ] += 1
    w = [seats.get(t, 0) for t in types]
    assert sum(w) == 30
    swings = [0] * 5
    for m in range(32):
        tw = sum(w[i] for i in range(5) if m >> i & 1)
        for i in range(5):
            if not (m >> i & 1) and tw < 16 <= tw + w[i]:
                swings[i] += 1
    total = sum(swings)
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_banzhaf_power"](spark, SF_DIR).collect()
    }
    assert set(got) == set(types)
    for i, t in enumerate(types):
        r = got[t]
        assert (r.seats, r.n_swings, r.total_swings) == (
            w[i],
            swings[i],
            total,
        )
        if total:
            assert r.banzhaf_micro == swings[i] * 1000000 // total
            assert r.banzhaf == pytest.approx(swings[i] / total, rel=1e-12)


def test_condorcet_borda_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    types = sorted(daily)
    borda = collections.Counter()
    beats = collections.Counter()
    for d in days:
        order = sorted(types, key=lambda t: (-daily[t].get(d, 0), t))
        for rk, t in enumerate(order, 1):
            borda[t] += 5 - rk
        for i, a in enumerate(order):
            for b in order[i + 1 :]:
                beats[(a, b)] += 1
    wins = {
        t: sum(
            1
            for u in types
            if u != t and beats.get((t, u), 0) > 15
        )
        for t in types
    }
    bw = max(types, key=lambda t: (borda[t], [-ord(c) for c in t]))
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_condorcet_borda"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(types)
    for t in types:
        r = got[t]
        assert (r.borda_score, r.pairwise_wins) == (borda[t], wins[t])
        assert r.is_condorcet_winner == (wins[t] == 4)
        assert r.is_borda_winner == (t == bw)
    # Borda points over strict ballots always total 30 * (0+1+2+3+4)
    assert sum(borda.values()) == 30 * 10
    assert sum(1 for t in types if got[t].is_borda_winner) == 1


@pytest.mark.parametrize(
    "name",
    [
        "q_youden_j",
        "q_brier_decomposition",
        "q_banzhaf_power",
        "q_condorcet_borda",
    ],
)
def test_no_python_row_udfs_in_round12_staged_b19(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 20


def _strict_ballots(duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    types = sorted(daily)
    return [
        sorted(types, key=lambda t: (-daily[t].get(d, 0), t)) for d in days
    ]


def test_instant_runoff_witness(spark, duck):
    ballots = _strict_ballots(duck)
    remaining = sorted({t for b in ballots for t in b})
    elim_order = []
    for _ in range(4):
        votes = collections.Counter()
        for b in ballots:
            votes[next(t for t in b if t in remaining)] += 1
        loser = min(remaining, key=lambda t: (votes.get(t, 0), t))
        elim_order.append(loser)
        remaining.remove(loser)
    rows = STAGED_QUERIES["q_instant_runoff"](spark, SF_DIR).collect()
    assert [(r.rnd, r.eliminated) for r in rows] == [
        (i + 1, t) for i, t in enumerate(elim_order)
    ]
    assert all(r.winner == remaining[0] for r in rows)
    assert len(remaining) == 1


def test_kemeny_exhaustive_witness(spark, duck):
    import itertools

    ballots = _strict_ballots(duck)
    types = sorted({t for b in ballots for t in b})
    beats = collections.Counter()
    for b in ballots:
        for i, a in enumerate(b):
            for c in b[i + 1 :]:
                beats[(a, c)] += 1
    best = None
    for pid, perm in enumerate(itertools.permutations(range(5))):
        order = [types[i] for i in perm]
        cost = sum(
            beats.get((order[j], order[i]), 0)
            for i in range(5)
            for j in range(i + 1, 5)
        )
        if best is None or (cost, pid) < best[:2]:
            best = (cost, pid, order)
    cost, pid, order = best
    rows = STAGED_QUERIES["q_kemeny_exhaustive"](spark, SF_DIR).collect()
    assert [r.candidate for r in rows] == order
    assert all(r.kemeny_cost == cost and r.perm_id == pid for r in rows)
    # Kemeny cost can never exceed total pair-ballot mass
    assert cost <= 30 * 10


def test_double_auction_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type, user_id,"
        f" SUM(CAST(round(value * 100) AS BIGINT))"
        f" FROM '{SF_DIR}/events.parquet'"
        f" WHERE event_type IN ('purchase', 'click') GROUP BY 1, 2"
    ).fetchall()
    bids = sorted(
        (int(v) for t, _, v in rows if t == "purchase"), reverse=True
    )
    asks = sorted(int(v) for t, _, v in rows if t == "click")
    # textbook route: k* = max k with bid_(k) >= ask_(k)
    kstar = 0
    for k in range(min(len(bids), len(asks))):
        if bids[k] >= asks[k]:
            kstar = k + 1
    # lattice route (the query's derivation)
    lattice = sorted(set(bids) | set(asks))
    cands = [
        (
            min(
                sum(1 for b in bids if b >= v),
                sum(1 for a in asks if a <= v),
            ),
            v,
        )
        for v in lattice
    ]
    n_trades, price = max(cands, key=lambda c: (c[0], -c[1]))
    [r] = STAGED_QUERIES["q_double_auction"](spark, SF_DIR).collect()
    assert (r.n_buyers, r.n_sellers) == (len(bids), len(asks))
    assert r.n_trades == kstar == n_trades  # the two routes agree
    assert r.clearing_price_cents == price
    assert r.demand_at_clear >= r.n_trades
    assert r.supply_at_clear >= r.n_trades


@pytest.mark.parametrize(
    "name",
    ["q_instant_runoff", "q_kemeny_exhaustive", "q_double_auction"],
)
def test_no_python_row_udfs_in_round12_staged_b20(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 21


def test_secretary_stop_witness(spark, duck):
    import datetime

    daily = _daily_cents(duck)
    anchor = datetime.date(2024, 1, 1)
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_secretary_stop"](spark, SF_DIR).collect()
    }
    assert set(got) == set(daily)
    found = 0
    for t in daily:
        byday = {(d - anchor).days: c for d, c in daily[t].items()}
        xs = [byday.get(d, 0) for d in range(30)]
        bar = max(xs[:11])
        pick = next((d for d in range(11, 30) if xs[d] > bar), 29)
        r = got[t]
        assert (r.threshold_cents, r.pick_day) == (bar, pick)
        assert r.picked_cents == xs[pick]
        assert r.best_cents == max(xs)
        assert r.found_best == (xs[pick] == max(xs))
        found += r.found_best
    assert found >= 1  # the 1/e rule finds a true max somewhere


def test_ski_rental_witness(spark, duck):
    rows = duck.sql(
        f"SELECT user_id, COUNT(DISTINCT CAST(ts AS DATE))"
        f" FROM '{SF_DIR}/events.parquet' GROUP BY user_id"
    ).fetchall()
    per_days = collections.Counter()
    opt_total = online_total = 0
    for _, days in rows:
        days = int(days)
        per_days[days] += 1
        opt = min(days, 10)
        online = days if days < 10 else 20
        opt_total += opt
        online_total += online
        assert online <= 2 * opt  # 2-competitive, always
    got = {
        r.days: r
        for r in STAGED_QUERIES["q_ski_rental"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per_days)
    for days, r in got.items():
        assert r.n_users_at == per_days[days]
        assert r.opt_cost == min(days, 10)
        assert r.online_cost == (days if days < 10 else 20)
        assert (r.opt_total, r.online_total) == (opt_total, online_total)
        assert r.ratio_violations == 0
        assert r.competitive_ratio == pytest.approx(
            online_total / opt_total, rel=1e-12
        )
        assert r.competitive_ratio <= 2.0


def test_lru_vs_belady_witness(spark, duck):
    rows = duck.sql(
        f"SELECT user_id, event_type FROM '{SF_DIR}/events.parquet'"
        f" ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs = collections.defaultdict(list)
    for uid, tok in rows:
        seqs[uid].append(tok)
    lru_hits = opt_hits = n_acc = 0
    for seq in seqs.values():
        n_acc += len(seq)
        # LRU
        cache = []
        for tok in seq:
            if tok in cache:
                lru_hits += 1
                cache.remove(tok)
            cache.insert(0, tok)
            cache = cache[:3]
        # Belady OPT with deterministic (nu desc, t desc) eviction
        nxt = {}
        nus = [0] * len(seq)
        for i in range(len(seq) - 1, -1, -1):
            nus[i] = nxt.get(seq[i], 10**9)
            nxt[seq[i]] = i + 1
        cache2 = {}
        for i, tok in enumerate(seq):
            if tok in cache2:
                opt_hits += 1
                cache2[tok] = nus[i]
            elif len(cache2) < 3:
                cache2[tok] = nus[i]
            else:
                victim = max(cache2, key=lambda t: (cache2[t], t))
                del cache2[victim]
                cache2[tok] = nus[i]
    [r] = STAGED_QUERIES["q_lru_vs_belady"](spark, SF_DIR).collect()
    assert (r.n_users, r.n_accesses) == (len(seqs), n_acc)
    assert (r.lru_hits, r.opt_hits) == (lru_hits, opt_hits)
    assert r.lru_rate == pytest.approx(lru_hits / n_acc, rel=1e-12)
    assert r.opt_rate == pytest.approx(opt_hits / n_acc, rel=1e-12)
    assert r.opt_dominates and opt_hits >= lru_hits  # Belady optimality


@pytest.mark.parametrize(
    "name", ["q_secretary_stop", "q_ski_rental", "q_lru_vs_belady"]
)
def test_no_python_row_udfs_in_round12_staged_b21(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 22


def test_rendezvous_hash_witness(spark, duck):
    keys = [
        int(u)
        for (u,) in duck.sql(
            f"SELECT DISTINCT user_id FROM '{SF_DIR}/events.parquet'"
        ).fetchall()
    ]
    nodes = [f"n{i}" for i in range(5)]

    def w(uid, node):
        return int(
            hashlib.md5(f"{uid}@{node}".encode()).hexdigest()[:15], 16
        )

    own5 = {
        uid: max(nodes, key=lambda nd: (w(uid, nd), [-ord(c) for c in nd]))
        for uid in keys
    }
    own4 = {
        uid: max(
            nodes[:4], key=lambda nd: (w(uid, nd), [-ord(c) for c in nd])
        )
        for uid in keys
    }
    moved = sum(1 for uid in keys if own5[uid] != own4[uid])
    illegal = sum(
        1 for uid in keys if own5[uid] != own4[uid] and own5[uid] != "n4"
    )
    counts = collections.Counter(own5.values())
    got = {
        r.node: r
        for r in STAGED_QUERIES["q_rendezvous_hash"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) <= set(nodes)
    for node, r in got.items():
        assert r.n_keys_owned == counts[node]
        assert (r.n_keys, r.n_moved) == (len(keys), moved)
        assert r.n_illegal_moves == illegal == 0  # HRW guarantee
        assert r.moved_fraction == pytest.approx(
            moved / len(keys), rel=1e-12
        )
    # only n4's keys moved
    assert moved == counts["n4"]


def test_vector_clocks_witness(spark, duck):
    rows = duck.sql(
        f"SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)),"
        f" event_type, COUNT(*) FROM '{SF_DIR}/events.parquet'"
        f" GROUP BY 1, 2"
    ).fetchall()
    types = ["click", "error", "purchase", "signup", "view"]
    clocks = collections.defaultdict(lambda: [0] * 5)
    for d, t, n in rows:
        clocks[d][types.index(t)] = n
    days = sorted(clocks)
    classed = collections.Counter()
    for i, da in enumerate(days):
        for db in days[i + 1 :]:
            a, b = clocks[da], clocks[db]
            le = all(x <= y for x, y in zip(a, b))
            ge = all(y <= x for x, y in zip(a, b))
            classed[
                "equal"
                if le and ge
                else "happens_before"
                if le
                else "happens_after"
                if ge
                else "concurrent"
            ] += 1
    got = {
        r.relation: r.n_pairs
        for r in STAGED_QUERIES["q_vector_clocks"](spark, SF_DIR).collect()
    }
    assert got == dict(classed)
    assert sum(got.values()) == len(days) * (len(days) - 1) // 2


def test_douglas_peucker_witness(spark, duck):
    import datetime

    daily = _daily_cents(duck)
    anchor = datetime.date(2024, 1, 1)
    rows = STAGED_QUERIES["q_douglas_peucker"](spark, SF_DIR).collect()
    per = collections.defaultdict(list)
    for r in rows:
        per[r.t].append(r)
    assert set(per) == set(daily)
    for t, rs in per.items():
        byday = {(d - anchor).days: c // 100 for d, c in daily[t].items()}
        xs = [byday.get(d, 0) for d in range(30)]

        def split(da, db):
            best = max(
                ((abs((db - da) * (xs[d] - xs[da])
                      - (d - da) * (xs[db] - xs[da])), -d), d)
                for d in range(da + 1, db)
            )
            return best[1], best[0][0]

        m1, cr1 = split(0, 29)
        m20, cr20 = split(0, m1)
        m21, cr21 = split(m1, 29)
        expect = sorted(
            [
                (0, 0, -1, 0),
                (29, 0, -1, 0),
                (m1, 1, -1, cr1),
                (m20, 2, 0, cr20),
                (m21, 2, 1, cr21),
            ]
        )
        gotrows = sorted((r.d, r.lvl, r.seg, r.cr) for r in rs)
        assert gotrows == [
            (d, lvl, seg, cr) for d, lvl, seg, cr in expect
        ]
        for r in rs:
            assert r.x == xs[r.d]
        # level-1 split dominates both level-2 residuals on its chord
        assert len(rs) == 5


@pytest.mark.parametrize(
    "name", ["q_rendezvous_hash", "q_vector_clocks", "q_douglas_peucker"]
)
def test_no_python_row_udfs_in_round12_staged_b22(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 23


def test_sorting_network_witness(spark, duck):
    from aws_vpcflowlogs_parquet_spark.plans.staging import _batcher8

    net = _batcher8()
    assert len(net) == 19

    def apply(xs):
        xs = list(xs)
        for a, b in net:
            if xs[a] > xs[b]:
                xs[a], xs[b] = xs[b], xs[a]
        return xs

    # 0-1 principle: sorting all 256 binary vectors proves the
    # network sorts EVERY input (Knuth TAOCP 5.3.4)
    for m in range(256):
        bits = [(m >> i) & 1 for i in range(8)]
        assert apply(bits) == sorted(bits), m
    rows = duck.sql(
        f"SELECT user_id % 8, SUM(CAST(round(value * 100) AS BIGINT))"
        f" FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    vals = [int(v) for _, v in rows]
    got = STAGED_QUERIES["q_sorting_network"](spark, SF_DIR).collect()
    assert [r.v for r in got] == apply(vals) == sorted(vals)
    assert all(r.network_sorts for r in got)
    assert [r.pos for r in got] == list(range(8))


def test_gorilla_cost_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_type,"
        f" datediff('day', DATE '2024-01-01', CAST(ts AS DATE)),"
        f" CAST(epoch_us(ts) // 1000000 AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet' ORDER BY event_type, ts, event_id"
    ).fetchall()
    streams = collections.defaultdict(list)
    for t, day, s in rows:
        streams[(t, day)].append(int(s))

    def price(dd):
        if dd == 0:
            return "b0_zero", 1
        if -63 <= dd <= 64:
            return "b1_7bit", 9
        if -255 <= dd <= 256:
            return "b2_9bit", 12
        if -2047 <= dd <= 2048:
            return "b3_12bit", 16
        return "b4_32bit", 36

    agg = collections.defaultdict(lambda: [0, 0])
    for (t, _), ss in streams.items():
        for i in range(2, len(ss)):
            dd = (ss[i] - ss[i - 1]) - (ss[i - 1] - ss[i - 2])
            b, cost = price(dd)
            agg[(t, b)][0] += 1
            agg[(t, b)][1] += cost
    tots = collections.defaultdict(lambda: [0, 0])
    for (t, _), (n, bits) in agg.items():
        tots[t][0] += n
        tots[t][1] += bits
    got = STAGED_QUERIES["q_gorilla_cost"](spark, SF_DIR).collect()
    assert {(r.t, r.bucket) for r in got} == set(agg)
    for r in got:
        n, bits = agg[(r.t, r.bucket)]
        assert (r.n, r.bits) == (n, bits)
        assert (r.n_dods, r.dod_bits) == tuple(tots[r.t])
        assert r.compression_ratio == pytest.approx(
            tots[r.t][1] / (64 * tots[r.t][0]), rel=1e-12
        )
        assert r.compression_ratio < 1.0  # it actually compresses


def test_roaring_containers_witness(spark, duck):
    rows = duck.sql(
        f"SELECT DISTINCT event_type, CAST(event_id AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    chunks = collections.defaultdict(set)
    for t, v in rows:
        chunks[(t, v // 65536)].add(v % 65536)
    got = {
        (r.t, r.chunk): r
        for r in STAGED_QUERIES["q_roaring_containers"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(chunks)
    for (t, chunk), los in chunks.items():
        ordered = sorted(los)
        n_runs = sum(
            1
            for i, v in enumerate(ordered)
            if i == 0 or ordered[i - 1] != v - 1
        )
        r = got[(t, chunk)]
        assert (r.card, r.n_runs) == (len(los), n_runs)
        assert r.array_bytes == 2 * len(los)
        assert r.bitmap_bytes == 8192
        assert r.run_bytes == 2 + 4 * n_runs
        best = min(r.run_bytes, r.array_bytes, r.bitmap_bytes)
        assert r.best_bytes == best
        if r.run_bytes < min(r.array_bytes, r.bitmap_bytes):
            assert r.container == "run"
        elif r.card <= 4096:
            assert r.container == "array"
        else:
            assert r.container == "bitmap"


@pytest.mark.parametrize(
    "name",
    ["q_sorting_network", "q_gorilla_cost", "q_roaring_containers"],
)
def test_no_python_row_udfs_in_round12_staged_b23(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 24


def _daily_error_counts(duck):
    import datetime

    rows = duck.sql(
        f"SELECT CAST(ts AS DATE), COUNT(*)"
        f" FROM '{SF_DIR}/events.parquet'"
        f" WHERE event_type = 'error' GROUP BY 1"
    ).fetchall()
    anchor = datetime.date(2024, 1, 1)
    byday = {(d - anchor).days: int(n) for d, n in rows}
    return [byday.get(d, 0) for d in range(30)]


def test_pid_control_witness(spark, duck):
    ys = _daily_error_counts(duck)
    sp = sum(ys) // 30

    def tdiv(a, b):
        return int(a / b)  # truncation toward zero, both engines

    prev_e, integ = 0, 0
    expect = []
    for y in ys:
        e = sp - y
        integ += e
        u = tdiv(50 * e + 10 * integ + 20 * (e - prev_e), 100)
        expect.append((e, integ, u))
        prev_e = e
    rows = STAGED_QUERIES["q_pid_control"](spark, SF_DIR).collect()
    assert [(r.error, r.integral, r.control) for r in rows] == expect
    assert all(r.setpoint == sp for r in rows)
    assert [r.d for r in rows] == list(range(30))
    # the integral telescopes: last integral equals sum of errors
    assert rows[-1].integral == sum(sp - y for y in ys)


def test_aimd_congestion_witness(spark, duck):
    ys = _daily_error_counts(duck)
    bar = sum(ys) // 30
    cwnd, nl = 10, 0
    expect = []
    for e in ys:
        if e > bar:
            cwnd = max(cwnd // 2, 1)
            nl += 1
        else:
            cwnd += 1
        expect.append((e, e > bar, cwnd, nl))
    rows = STAGED_QUERIES["q_aimd_congestion"](spark, SF_DIR).collect()
    assert [(r.errs, r.loss, r.cwnd, r.n_losses) for r in rows] == expect
    assert all(r.bar == bar for r in rows)
    assert all(r.cwnd >= 1 for r in rows)  # the floor holds
    assert 0 < rows[-1].n_losses < 30  # the bar genuinely bites


def test_sir_epidemic_witness(spark, duck):
    ys = _daily_error_counts(duck)
    i0 = max(ys[0] % 100, 1)
    s, i, r = 10000 - i0, i0, 0
    expect = [(s, i, r)]
    for _ in range(30):
        new_inf = (3 * s * i) // 20000
        rec = i // 4
        s, i, r = s - new_inf, i + new_inf - rec, r + rec
        expect.append((s, i, r))
    rows = STAGED_QUERIES["q_sir_epidemic"](spark, SF_DIR).collect()
    assert [
        (x.susceptible, x.infected, x.recovered) for x in rows
    ] == expect
    # conservation is structural: S+I+R = N every step
    assert all(x.total == 10000 for x in rows)
    # the epidemic actually takes off and then recovers mass
    assert max(x.infected for x in rows) > i0
    assert rows[-1].recovered > 0


@pytest.mark.parametrize(
    "name", ["q_pid_control", "q_aimd_congestion", "q_sir_epidemic"]
)
def test_no_python_row_udfs_in_round12_staged_b24(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 25


def test_sharpe_sortino_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_sharpe_sortino"](spark, SF_DIR).collect()
    }
    assert set(got) == set(daily)
    for t in daily:
        xs = [daily[t].get(d, 0) // 100 for d in days]
        rs = [b - a for a, b in zip(xs, xs[1:])]
        n, s = len(rs), sum(rs)
        ss = sum(r * r for r in rs)
        ssd = sum(r * r for r in rs if r < 0)
        r = got[t]
        assert (r.n, r.s, r.ss, r.ssd) == (n, s, ss, ssd)
        assert r.n_down == sum(1 for x in rs if x < 0)
        mean = s / n
        sd = math.sqrt((n * ss - s * s) / (n * (n - 1)))
        assert r.mean_ret == pytest.approx(mean, rel=1e-12)
        assert r.sharpe == pytest.approx(mean / sd, rel=1e-12)
        if ssd:
            assert r.sortino == pytest.approx(
                mean / math.sqrt(ssd / n), rel=1e-12
            )


def test_kupiec_backtest_witness(spark, duck):
    import datetime

    rows = duck.sql(
        f"SELECT event_type, CAST(ts AS DATE),"
        f" CAST(round(value * 100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    anchor = datetime.date(2024, 1, 1)
    per = collections.defaultdict(lambda: ([], []))
    for t, d, v in rows:
        per[t][0 if (d - anchor).days < 15 else 1].append(v)
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_kupiec_backtest"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(per)
    for t, (train, test) in per.items():
        train = sorted(train)
        n = len(train)
        var = train[(19 * n + 19) // 20 - 1]
        x = sum(1 for v in test if v > var)
        nt = len(test)
        r = got[t]
        assert (r.var_cents, r.n_test, r.x) == (var, nt, x)
        assert r.breach_rate == pytest.approx(x / nt, rel=1e-12)
        if 0 < x < nt:
            lr = -2 * (
                (nt - x) * math.log(0.95)
                + x * math.log(0.05)
                - (nt - x) * math.log(1 - x / nt)
                - x * math.log(x / nt)
            )
            assert r.lr_pof == pytest.approx(lr, rel=1e-9)
            assert r.reject == (lr > 3.841)
            assert r.lr_pof >= 0.0  # an LR statistic is nonnegative


def test_second_price_auction_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    fp_rev = sp_rev = 0
    expect = {}
    for i, d in enumerate(days):
        bids = sorted(
            ((daily[t].get(d, 0), t) for t in daily),
            key=lambda bt: (-bt[0], bt[1]),
        )
        fp, w = bids[0][0], bids[0][1]
        sp = bids[1][0] if len(bids) > 1 else 0
        expect[i] = (w, fp, sp)
        fp_rev += fp
        sp_rev += sp
    got = {
        r.d: r
        for r in STAGED_QUERIES["q_second_price_auction"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(expect)
    for d, (w, fp, sp) in expect.items():
        r = got[d]
        assert (r.winner, r.first_price, r.second_price) == (w, fp, sp)
        assert (r.fp_revenue, r.sp_revenue) == (fp_rev, sp_rev)
        assert r.winner_surplus == fp_rev - sp_rev
        assert r.first_price >= r.second_price  # rank order holds


@pytest.mark.parametrize(
    "name",
    ["q_sharpe_sortino", "q_kupiec_backtest", "q_second_price_auction"],
)
def test_no_python_row_udfs_in_round12_staged_b25(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 26


def test_lis_dp_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    got = {
        r.t: r for r in STAGED_QUERIES["q_lis_dp"](spark, SF_DIR).collect()
    }
    assert set(got) == set(daily)
    for t in daily:
        xs = [daily[t].get(d, 0) for d in days]
        lis = []
        for k, x in enumerate(xs):
            lis.append(
                1 + max((lis[j] for j in range(k) if xs[j] < x), default=0)
            )
        best = max(lis)
        r = got[t]
        assert (r.lis_len, r.n) == (best, 30)
        assert r.ends_at == lis.index(best) + 1
        assert 1 <= r.lis_len <= 30


def test_quadrature_simpson_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_quadrature_simpson"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(daily)
    for t in daily:
        xs = [daily[t].get(d, 0) for d in days[:29]]
        sn = sum(
            x * (1 if d in (0, 28) else 4 if d % 2 == 1 else 2)
            for d, x in enumerate(xs)
        )
        tn = sum(x * (1 if d in (0, 28) else 2) for d, x in enumerate(xs))
        r = got[t]
        assert (r.simpson_num, r.trap_num, r.total) == (sn, tn, sum(xs))
        assert r.simpson_integral == pytest.approx(sn / 3.0, rel=1e-12)
        assert r.trapezoid_integral == pytest.approx(tn / 2.0, rel=1e-12)
        assert r.rule_gap == pytest.approx(sn / 3.0 - tn / 2.0, rel=1e-9)
        # both rules integrate a constant exactly: equal iff flat
        # (sanity: weights sum to 3*(n-1) and 2*(n-1) panels' worth)
        assert sum(
            1 if d in (0, 28) else 4 if d % 2 == 1 else 2
            for d in range(29)
        ) == 3 * 28
        assert sum(1 if d in (0, 28) else 2 for d in range(29)) == 2 * 28


def test_hotelling_t2_witness(spark, duck):
    daily = _daily_cents(duck)
    days = sorted({d for v in daily.values() for d in v})
    xs = [daily["click"].get(d, 0) // 100 for d in days]
    ys = [daily["view"].get(d, 0) // 100 for d in days]
    n = len(days)
    sx, sy = sum(xs), sum(ys)
    a = n * sum(v * v for v in xs) - sx * sx
    b = n * sum(p * q for p, q in zip(xs, ys)) - sx * sy
    c = n * sum(v * v for v in ys) - sy * sy
    det = a * c - b * b
    rows = STAGED_QUERIES["q_hotelling_t2"](spark, SF_DIR).collect()
    assert len(rows) == n
    n_flagged = 0
    for r in rows:
        i = r.d
        u = n * xs[i] - sx
        v = n * ys[i] - sy
        qn = c * u * u - 2 * b * u * v + a * v * v
        assert int(r.t2_num) == qn
        assert int(r.det_scaled) == det
        assert r.dof == n - 1
        assert r.t2 == pytest.approx(qn * (n - 1) / (det * n), rel=1e-12)
        assert r.t2 >= 0.0  # a quadratic form in a PD matrix
        assert r.out_of_control == (
            1000 * (n - 1) * qn > 13816 * n * det
        )
        n_flagged += r.out_of_control
    assert n_flagged < n  # the chart cannot flag every day


@pytest.mark.parametrize(
    "name", ["q_lis_dp", "q_quadrature_simpson", "q_hotelling_t2"]
)
def test_no_python_row_udfs_in_round12_staged_b26(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 27


def test_weighted_interval_dp_witness(spark, duck):
    import datetime

    daily = _daily_cents(duck)
    anchor = datetime.date(2024, 1, 1)
    got = {
        r.t: r
        for r in STAGED_QUERIES["q_weighted_interval_dp"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(daily)
    for t in daily:
        byday = {(d - anchor).days: c for d, c in daily[t].items()}
        iv = []
        for d in range(30):
            x = byday.get(d, 0)
            iv.append((d, d + 1 + x % 5, 1 + x % 97))
        iv.sort(key=lambda z: (z[1], z[0]))
        m = [0]
        for j, (s, e, w) in enumerate(iv, 1):
            p = max(
                (jj for jj in range(1, j) if iv[jj - 1][1] <= s),
                default=0,
            )
            m.append(max(m[j - 1], w + m[p]))
        r = got[t]
        assert (r.best_weight, r.n_intervals) == (m[30], 30)
        assert max(w for _, _, w in iv) <= r.best_weight
        assert r.best_weight <= sum(w for _, _, w in iv)


def test_blelloch_scan_witness(spark, duck):
    rows = duck.sql(
        f"SELECT user_id % 32, SUM(CAST(round(value * 100) AS BIGINT))"
        f" FROM '{SF_DIR}/events.parquet' GROUP BY 1"
    ).fetchall()
    byb = {int(b): int(v) for b, v in rows}
    xs = [byb.get(i, 0) for i in range(32)]
    # independent Blelloch replay
    a = list(xs)
    for h in (1, 2, 4, 8, 16):
        for i in range(2 * h - 1, 32, 2 * h):
            a[i] += a[i - h]
    a[31] = 0
    for h in (16, 8, 4, 2, 1):
        for i in range(2 * h - 1, 32, 2 * h):
            a[i - h], a[i] = a[i], a[i] + a[i - h]
    excl = [sum(xs[:i]) for i in range(32)]
    assert a == excl  # the scan theorem, verified in Python too
    rows2 = STAGED_QUERIES["q_blelloch_scan"](spark, SF_DIR).collect()
    assert [r.v for r in rows2] == xs
    assert [r.excl_blelloch for r in rows2] == excl
    assert [r.excl_seq for r in rows2] == excl
    assert all(r.routes_agree for r in rows2)


def test_for_bitpacking_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_id // 32, CAST(round(value * 100) AS BIGINT)"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    blocks = collections.defaultdict(list)
    for b, v in rows:
        blocks[int(b)].append(int(v))
    hist = collections.Counter()
    packed = raw = nv = 0
    for vs in blocks.values():
        rng = max(vs) - min(vs)
        width = rng.bit_length()
        hist[width] += 1
        packed += 64 + len(vs) * width
        raw += 64 * len(vs)
        nv += len(vs)
    got = {
        r.width_bits: r
        for r in STAGED_QUERIES["q_for_bitpacking"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(hist)
    for w, r in got.items():
        assert r.n_blocks_at == hist[w]
        assert (r.n_blocks, r.n_values) == (len(blocks), nv)
        assert (r.packed_bits, r.raw_bits) == (packed, raw)
        assert r.compression_ratio == pytest.approx(
            packed / raw, rel=1e-12
        )
        assert r.compression_ratio < 1.0


@pytest.mark.parametrize(
    "name",
    ["q_weighted_interval_dp", "q_blelloch_scan", "q_for_bitpacking"],
)
def test_no_python_row_udfs_in_round12_staged_b27(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------- batch 28


def test_kfold_assign_witness(spark, duck):
    rows = duck.sql(
        f"SELECT DISTINCT user_id, event_type"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    strata = collections.defaultdict(list)
    for uid, t in rows:
        strata[t].append(uid)
    sizes = {}
    for t, uids in strata.items():
        order = sorted(
            uids,
            key=lambda u: (
                hashlib.md5(f"{u}:cv".encode()).hexdigest(),
                u,
            ),
        )
        for rk, _ in enumerate(order):
            sizes[(t, rk % 5)] = sizes.get((t, rk % 5), 0) + 1
    got = {
        (r.stratum, r.fold): r
        for r in STAGED_QUERIES["q_kfold_assign"](spark, SF_DIR).collect()
    }
    assert set(got) == set(sizes)
    for (t, f), n in sizes.items():
        r = got[(t, f)]
        assert r.n == n
        assert r.n_stratum == len(strata[t])
        spread = max(
            sizes.get((t, ff), 0) for ff in range(5)
        ) - min(sizes.get((t, ff), 0) for ff in range(5))
        assert r.spread == spread
        assert r.balanced and spread <= 1  # round-robin guarantee


def test_woe_iv_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_id % 10,"
        f" CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    bins = collections.defaultdict(lambda: [0, 0])
    for b, y in rows:
        bins[int(b)][0 if y else 1] += 1
    gt = sum(g for g, _ in bins.values())
    bt = sum(b for _, b in bins.values())
    woes = {}
    iv = 0
    for bn, (g, b) in bins.items():
        if g > 0 and b > 0:
            w = math.floor(math.log(g * bt / (b * gt)) * 1e9 + 0.5)
            woes[bn] = w
            iv += math.floor((g / gt - b / bt) * w + 0.5)
    got = {
        r.bin: r for r in STAGED_QUERIES["q_woe_iv"](spark, SF_DIR).collect()
    }
    assert set(got) == set(woes)
    for bn, r in got.items():
        g, b = bins[bn]
        assert (r.g, r.b) == (g, b)
        assert r.woe_nano == woes[bn]
        assert r.iv_nano == iv
        assert r.information_value == pytest.approx(iv / 1e9, rel=1e-12)
        assert r.predictive == (iv > 20000000)
    assert iv >= 0  # IV is a sum of (p-q)*ln(p/q) >= 0 terms


def test_randomized_response_witness(spark, duck):
    rows = duck.sql(
        f"SELECT event_id, CAST(round(value * 100) AS BIGINT) > 5000"
        f" FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    n = len(rows)
    n_true = n_yes = 0
    for eid, truth in rows:
        truth = 1 if truth else 0
        c1 = int(hashlib.md5(f"{eid}:rr1".encode()).hexdigest()[:8], 16) % 2
        c2 = int(hashlib.md5(f"{eid}:rr2".encode()).hexdigest()[:8], 16) % 2
        n_true += truth
        n_yes += truth if c1 == 1 else c2
    [r] = STAGED_QUERIES["q_randomized_response"](spark, SF_DIR).collect()
    assert (r.n, r.n_true, r.n_yes) == (n, n_true, n_yes)
    est = 2 * n_yes / n - 0.5
    assert r.true_rate == pytest.approx(n_true / n, rel=1e-12)
    assert r.observed_rate == pytest.approx(n_yes / n, rel=1e-12)
    assert r.estimated_rate == pytest.approx(est, rel=1e-12)
    assert r.estimator_error == pytest.approx(
        abs(est - n_true / n), rel=1e-9
    )
    # the debiased estimate lands near truth (within sampling noise)
    assert r.estimator_error < 0.2


@pytest.mark.parametrize(
    "name", ["q_kfold_assign", "q_woe_iv", "q_randomized_response"]
)
def test_no_python_row_udfs_in_round12_staged_b28(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_halton_qmc_witness(spark, duck):
    def phi(n, base, digits):
        out = 0
        for i in range(digits):
            out += ((n // base**i) % base) * base ** (digits - 1 - i)
        return out

    n_inside = 0
    for n in range(4096):
        x2 = phi(n, 2, 12)
        y3 = phi(n, 3, 8)
        if x2 * x2 * 6561**2 + y3 * y3 * 4096**2 < (4096 * 6561) ** 2:
            n_inside += 1
    [r] = STAGED_QUERIES["q_halton_qmc"](spark, SF_DIR).collect()
    assert (r.n_points, r.n_inside) == (4096, n_inside)
    est = 4 * n_inside / 4096
    assert r.pi_estimate == pytest.approx(est, rel=1e-12)
    assert r.pi_error == pytest.approx(
        abs(est - 3.14159265358979), rel=1e-9
    )
    assert r.converged and abs(est - math.pi) < 0.01  # QMC discrepancy


@pytest.mark.parametrize("name", ["q_halton_qmc"])
def test_no_python_row_udfs_in_round12_staged_b28b(spark, name):
    plan = _executed(STAGED_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name
