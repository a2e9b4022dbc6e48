"""Pure-Python witnesses for the round-9 mechanism queries at sf0.001 —
independent recomputation (no SQL on either engine), the third leg of
the per-batch validation loop."""

from __future__ import annotations

import collections

import duckdb
import pytest

from aws_vpcflowlogs_parquet_spark.plans.catalog import QUERIES

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _mst_edges(duck):
    """The q_mst_boruvka synthetic graph, derived independently."""
    rows = duck.sql(
        f"SELECT event_id, user_id FROM '{SF_DIR}/events.parquet' "
        f"WHERE event_id % 23 = 0"
    ).fetchall()
    E = {}
    for eid, uid in rows:
        blk = uid // 16
        v = blk * 16 + ((uid % 16 + 1 + eid % 15) % 16)
        a, b = min(uid, v), max(uid, v)
        E[(blk, a, b)] = 1 + (a * 31 + b * 17) % 8
    return E


def _kruskal(E):
    """Reference MSF: Kruskal with union-find — a THIRD algorithm,
    independent of both the Spark Borůvka and the oracle's threshold
    identity."""
    blocks = collections.defaultdict(list)
    nodes = collections.defaultdict(set)
    for (b, u, v), w in E.items():
        blocks[b].append((w, u, v))
        nodes[b].update((u, v))
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = {}
    for b in blocks:
        for n in nodes[b]:
            parent[n] = n
        wsum = cnt = 0
        for w, u, v in sorted(blocks[b]):
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
                wsum += w
                cnt += 1
        comps = len({find(n) for n in nodes[b]})
        out[b] = (len(nodes[b]), comps, cnt, wsum)
    return out


def test_mst_boruvka_matches_kruskal_witness(spark, duck):
    want = _kruskal(_mst_edges(duck))
    got = {
        r.block: (r.n_nodes, r.n_components, r.n_mst_edges, r.mst_weight)
        for r in QUERIES["q_mst_boruvka"](spark, SF_DIR).collect()
    }
    assert got == want


def test_mst_weight_is_tie_invariant(duck):
    # the oracle relies on MSF weight being identical across ALL
    # minimum spanning forests; witness it by running Kruskal under a
    # reversed tie-break order and comparing weights and edge counts
    E = _mst_edges(duck)
    base = _kruskal(E)
    flipped = _kruskal(
        {(b, -u, -v): w for (b, u, v), w in E.items()}
    )
    # node relabeling u -> -u preserves blocks/weights but reverses
    # every (u, v) sort tie-break; totals must agree
    for b in base:
        assert base[b][2:] == flipped[b][2:]
