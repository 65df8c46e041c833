"""k-hop reachability (bounded BFS) over the KG edge set — the subgraph-
extraction primitive behind entity-context gathering and GNN-style
training-sample construction: "give me every node within k hops of these
seeds, with its hop distance".

Scale shape: layer-synchronous BFS — per hop, ONE equi-join of the
frontier against the edge table (shuffle on node id) plus one anti-join
against the visited set; both are plain shuffles Catalyst/AQE can
broadcast when the frontier is small (hop 1 usually is). The visited set
is localCheckpoint()ed every hop so lineage stays flat across iterations
(same discipline as operators/connected_components.py). k bounds the
loop, so the job is k joins, not a convergence loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_hop_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 3,
    directed: bool = False,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Nodes reachable from any seed within ``k`` hops.

    ``edges``: (src, dst) pairs; ``seeds``: one ``node`` column. Returns
    (node, min_hops) with min_hops ∈ [0, k] — 0 for the seeds themselves.
    Layer-by-layer expansion guarantees min_hops is the true BFS distance
    (a node is claimed by the first layer that reaches it; the anti-join
    keeps later layers from re-claiming it).
    """
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    if not directed:
        e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.distinct()

    visited = seeds.select(
        F.col("node"), F.lit(0).alias("min_hops")).distinct().localCheckpoint()
    frontier = visited.select("node")
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("min_hops", F.lit(hop))
        )
        # materialize the layer once: it feeds both the union (visited)
        # and the next join (frontier), and checkpointing flattens the
        # k-deep lineage that would otherwise re-run every prior hop
        nxt = nxt.localCheckpoint()
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return visited
