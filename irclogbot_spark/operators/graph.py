"""Iterative graph analytics — integer-quantized PageRank.

The second iterative-operator family beside the BPE/k-means trainers:
rank flows along weighted edges for a fixed number of power-iteration
rounds. Floating-point PageRank is partition-order-dependent (double
sums re-associate), so ranks here live in integer MICRO-units with
floor'd edge contributions — BIGINT addition is associative, making
the whole computation a pure function of the graph: bit-identical
under any partitioning, and exactly re-derivable in ANSI SQL (the
importance.py quantization convention applied to graph analytics).

Semantics (the "pruned PageRank" convention): per round,
``r'(v) = BASE + sum over in-edges (u,v,w) of
floor(DAMPING_MILLI * r(u) * w / (1000 * wdeg(u)))`` with
``BASE = (1000 - DAMPING_MILLI) * R0 / 1000``. Mass lost to floor
rounding and dangling nodes is dropped, not redistributed — ranks are
centrality SCORES, not a probability distribution (the common
large-graph engineering choice; a stochastic-exact variant would need
a global mass renormalization each round).

Scale shape: edges partition by src for the contribution join
(co-partitioned with the degree table — one shuffle each, reused
every round); per round ONE (dst, contrib) partial-agg shuffle and
one node-keyed left join; ranks/nodes are node-cardinality frames,
orders of magnitude smaller than edges. Only the loop-invariant inputs (edge weights,
node table) are checkpointed; the rank recurrence itself stays ONE
lazy plan across all rounds — lineage is linear in rounds and no
driver action happens between them, so per-round truncation would
only add jobs (the fully-lazy-loop rule; contrast the
driver-coordinated k-means/BPE trainers, which MUST checkpoint per
iteration because each step's argmax returns to the driver).
Division is
integer DIV, never a double: contributions can exceed 2^53 on a big
graph, where double division silently loses ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R0 = 1_000_000  # initial rank per node, micro-mass units


def pagerank(
    edges: DataFrame,
    n_iter: int = 4,
    damping_milli: int = 850,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns
    ``(node, rank_units)`` for every edge endpoint. Undirected graphs
    pass both edge directions. Nodes are edge endpoints — an isolated
    node (no edges at all) is out of scope by construction. Weights
    must be POSITIVE integers: zero-weight edges contribute nothing
    (harmless), but a negative weight breaks the floor'd DIV
    contribution semantics — drop or clamp them upstream (no
    distributed assert here; a validation pass would cost a full
    edge scan per call).
    """
    if not 0 < damping_milli < 1000:
        raise ValueError(f"damping_milli in (0, 1000), got {damping_milli}")
    base = (1000 - damping_milli) * R0 // 1000
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    )
    deg = e.groupBy("src").agg(F.sum("w").alias("wdeg"))
    ew = e.join(deg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.select("node", F.lit(R0).cast("long").alias("r"))
    for _ in range(n_iter):
        # broadcast_ranks=True is the dimension-sized-node-set fast
        # path (caller's assertion — e.g. a bipartite trade graph
        # whose nodes are customers+suppliers): the rank frame ships
        # to every executor and the 4 rounds never sort/shuffle the
        # edge list. Default False: a web-scale graph's rank frame is
        # corpus-sized and must use the shuffle join.
        rside = F.broadcast(ranks) if broadcast_ranks else ranks
        contribs = (
            ew.join(rside, ew["src"] == rside["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"({damping_milli} * r * w) DIV (1000 * wdeg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base).cast("long") + F.coalesce("contrib", F.lit(0)))
            .alias("r"),
        )
        # NO per-round checkpoint: unlike the BPE loop there is no
        # driver-side argmax between rounds, so the whole power
        # iteration stays ONE lazy plan — lineage grows linearly
        # (each round references the previous ranks exactly once)
        # and AQE plans all rounds in a single job.
    return ranks.select("node", F.col("r").alias("rank_units"))
