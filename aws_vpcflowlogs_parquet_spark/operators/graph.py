"""Iterative graph algorithms (SURVEY §2.4 extension surface).

Beside connected components (operators/dedup.py dedup_clusters — min-label
propagation), PageRank is the second canonical iterative dataflow: each
round is joins + an aggregation, the loop runs a fixed iteration count,
and the per-round plan is identical — the shape GraphFrames/Pregel
implement, expressed directly on DataFrames.

Determinism contract (oracle-exact): the per-round contribution sum is the
one order-dependent float reduction in PageRank. Contributions are
quantized to 1e-12 units (bigint) before summation, so accumulation is
exact integer arithmetic — bit-identical across engines, join orders, and
partition counts — and the teleport/damping arithmetic is a fixed
double-expression tree. Three rounds at 100 TB: ranks and edges both hash
by src, so each round reuses one co-partitioned shuffle; the node-count
scalar broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_vpcflowlogs_parquet_spark.caching import track_persist

PR_SCALE = 1_000_000_000_000  # 1e-12 quantization of per-edge contributions
PR_DAMPING = 0.85


def pagerank(edges: DataFrame, n_iter: int = 3, damping: float = PR_DAMPING) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous PageRank rounds.

    ``edges`` is a distinct (src, dst) DataFrame. Dangling nodes (no
    out-edges) contribute nothing (their mass leaks — the simple PR
    variant, matched exactly by the oracle); in-degree-0 nodes keep the
    teleport term via the left join + coalesce.
    """
    # Iterative dataflow hygiene: without lineage truncation every round
    # nests the previous round's plan, so round k re-analyzes and
    # RE-EXECUTES rounds 1..k-1 (3 rounds = ~3x redundant work at sf0.1,
    # unbounded at 100 TB). Persist the loop-invariant inputs once and
    # checkpoint ranks each round — the same discipline GraphX/Pregel
    # apply (periodic checkpointing of the iterative RDD).
    edges = track_persist(edges)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = track_persist(nodes)
    outdeg = track_persist(
        edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    )
    # |V| as a DRIVER-side scalar, not a 1-row aggregate cross-joined
    # back (r13): the broadcast-nn shape re-ran the count subtree and
    # paid one broadcast build per round; the count job here runs once,
    # also materializing the nodes persist the rounds reuse. Arithmetic
    # is unchanged — the same bigint count promoted to double in the
    # same expressions, so ranks are bit-identical.
    n_nodes = float(nodes.count())
    ranks = nodes.select(
        "node", (F.lit(1.0) / F.lit(n_nodes)).alias("rank")
    )
    for _ in range(n_iter):
        contribs = (
            edges.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(
                    F.col("rank") / F.col("outdeg") * F.lit(float(PR_SCALE))
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(
            F.sum("c").cast("bigint").cast("double").alias("csum")
        )
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.lit(n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("csum"), F.lit(0.0))
                        / F.lit(float(PR_SCALE))
                    )
                ).alias("rank"),
            )
        )
        # Truncate lineage: the next round (and the final action) start
        # from materialized ranks, not a re-execution of this round.
        ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", "rank")
    for df in (edges, nodes, outdeg):
        df.unpersist()
    return out


def label_propagation(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """(node, label) after ``n_iter`` synchronous majority-vote rounds —
    community detection, the third iterative-graph surface beside
    connected components (min-label) and PageRank (weighted sums).

    ``edges`` is a directed (src, dst) DataFrame; the graph is treated as
    undirected (symmetrized + distinct). Labels start as node ids; each
    round every node adopts the most frequent label among its neighbors,
    ties broken by the SMALLEST label — the tie-break plus synchronous
    updates make the algorithm fully deterministic (plain LPA's
    random-order updates are not), so an unrolled-CTE oracle can verify
    it exactly. Per round: one join (neighbor labels), one count
    aggregation, one ``max_by`` argmax — all hash-partitioned by node id;
    nothing is ordered globally and no state lives on the driver."""
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()  # loop-invariant; scanned once per round, not re-derived
    )
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(n_iter):
        votes = (
            sym.join(
                labels.select(F.col("node").alias("dst"), "label"), "dst"
            )
            .groupBy("src", "label")
            .agg(F.count("*").alias("cnt"))
        )
        # argmax by (cnt DESC, label ASC): max_by over (cnt, -label)
        labels = votes.groupBy(F.col("src").alias("node")).agg(
            F.max_by(
                "label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
            ).alias("label")
        )
        labels = labels.localCheckpoint(eager=True)  # truncate round lineage
    out = labels.select("node", "label")
    sym.unpersist()
    return out


def sym_edges(events: DataFrame, mod: int) -> DataFrame:
    """Symmetric (a, b) edge list of the shared deterministic
    interaction graph: nodes are ``user_id % mod``, each event
    contributes the undirected edge to ``(2*user_id + event_id) % mod``
    (self-loops dropped), canonicalized (lo, hi) + distinct and then
    symmetrized — every undirected edge appears once per direction, the
    form the wedge/degree queries consume. One distinct-edge shuffle;
    |E| ≤ mod² regardless of event count.

    Shared by q_graph_2hop / q_node_jaccard (mod 41), q_assortativity
    (mod 499, sparse so degree variance is non-degenerate) and the
    staged q_resource_alloc — a single definition so edge
    canonicalization (and any future hub-capping) changes in one
    place."""
    a = F.col("user_id") % mod
    b = (F.lit(2) * F.col("user_id") + F.col("event_id")) % mod
    raw = (
        events.select(F.least(a, b).alias("lo"), F.greatest(a, b).alias("hi"))
        .filter(a != b)
        .distinct()
    )
    return raw.select(F.col("lo").alias("a"), F.col("hi").alias("b")).unionAll(
        raw.select(F.col("hi").alias("a"), F.col("lo").alias("b"))
    )


WEDGE_HUB_THRESHOLD = 10_000  # max center degree before the salted path
WEDGE_SALTS = 8


def wedges(
    edges: DataFrame,
    hub_threshold: int = WEDGE_HUB_THRESHOLD,
    n_salts: int = WEDGE_SALTS,
    max_degree: int | None = None,
) -> DataFrame:
    """All length-2 paths ``(a, z, c)`` (``a—z—c``, ``a != c``) of a
    symmetric edge list, with an explicit super-node guard (r6 VERDICT
    item 5).

    The wedge self-join keys on the CENTER node z, so its fan-out is
    Σ deg(z)² and a single hub serializes deg(z)² pair generation onto
    one shuffle task — the skew q_join_salted guards against for
    equi-joins, recurring here in self-join form. The guard runs the
    q_degree_stats pre-flight inline (one max-degree aggregate over the
    edge relation — bounded metadata, the repo's one sanctioned collect
    shape) and picks the physical strategy:

    - max degree ≤ ``hub_threshold``: the plain equi-self-join — one
      co-partitioned shuffle on z, zero overhead;
    - above it: the SALTED self-join — the (a → z) side gets a
      deterministic salt ``pmod(hash(a), n_salts)``, the (z → c) side is
      replicated across all salts, and the join keys on (z, _salt), so
      one hub's wedge generation spreads over ``n_salts`` tasks. Output
      is provably identical (salting changes partitioning, never the
      pair set — pinned by tests/test_round7_properties.py against the
      plain path on the same graph).

    This is a cap on per-TASK work, not on the Σ deg² total: a true
    degree CAP (dropping or sampling hub wedges) changes results and so
    lives with the caller, not here. Consumers: q_graph_2hop,
    q_node_jaccard, q_resource_alloc.

    Pre-flight cost (r7 ADVICE): the max-degree aggregate is an EAGER
    job at DataFrame-construction time, and callers typically pass an
    unpersisted distinct-edge derivation — so the edge relation is
    persisted here first (one computation feeds both the pre-flight and
    the self-join), unless the caller supplies ``max_degree`` from
    stats it already has (q_degree_stats output, catalog statistics),
    which skips the pre-flight job entirely.
    """
    if max_degree is None:
        from ..caching import track_persist

        edges = track_persist(edges)
        max_degree = (
            edges.groupBy("a")
            .agg(F.count("*").alias("d"))
            .agg(F.max("d").alias("m"))
            .collect()[0]["m"]
        )
    max_deg = max_degree
    e1 = edges.select("a", F.col("b").alias("z"))
    e2 = edges.select(F.col("a").alias("z"), F.col("b").alias("c"))
    if max_deg is not None and max_deg > hub_threshold:
        e1 = e1.withColumn("_salt", F.pmod(F.hash("a"), F.lit(n_salts)))
        e2 = e2.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )
        joined = e1.join(e2, ["z", "_salt"])
    else:
        joined = e1.join(e2, "z")
    return joined.filter(F.col("a") != F.col("c")).select("a", "z", "c")
