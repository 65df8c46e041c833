"""E5 — canonicalization via connected components (alternating
large-star / small-star, Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — the same algorithm GraphFrames uses).

Driver-controlled fixpoint of pure DataFrame jobs; ``localCheckpoint()``
every iteration truncates lineage so plans stay O(1) deep no matter how
many rounds run. Node ids are plain strings (IRIs) — min/least give the
deterministic component representative.

Why this and not min-propagation: large-star halves tall components
geometrically, so convergence is O(log d) rounds even for pathological
chain-shaped components — the property that survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    """For every node u: connect each strictly-larger neighbor v to
    m = min(Γ(u) ∪ {u})."""
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.withColumn("mn", F.least("mn", F.col("src")))
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge large→small, then for every node u connect all its
    ≤-neighbors (and u itself) to m = min(N≤(u) ∪ {u})."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()
    mins = oriented.groupBy("src").agg(F.min("dst").alias("mn"))
    out = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .unionByName(mins.select("src", F.col("mn").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return out


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(src, dst) → mapping(node, component) with component = min
    member of each component. Nodes not in any edge are absent (identity)."""
    def _sig(df: DataFrame) -> tuple:
        """Order-insensitive edge-set signature in ONE job: (count,
        sum(hash), xor-ish second moment). Collision-safe enough for a
        fixpoint test; replaces two anti-join jobs per iteration."""
        row = df.select(
            F.count("*").alias("n"),
            # decimal sum: long would overflow under ANSI mode
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h1"),
            F.sum(F.xxhash64("dst", "src", F.lit(7)).cast("decimal(38,0)")).alias("h2"),
        ).first()
        return (row["n"], row["h1"], row["h2"])

    cur = _symmetrize(edges).localCheckpoint(eager=True)
    prev_sig = _sig(cur)
    for _ in range(max_iter):
        sym = _symmetrize(cur)
        after = _small_star(_large_star(sym).unionByName(sym).distinct())
        after = after.localCheckpoint(eager=True)
        cur_sig = _sig(after)
        cur = after
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig
    # At fixpoint every edge is (node, component-min).
    return cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))


def canonicalize_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subject and IRI-object columns through the CC mapping.
    The mapping is small relative to T (only nodes with equivalence edges)
    → broadcast both rewrite joins; identity for unmapped nodes."""
    m = F.broadcast(mapping)
    t = (
        triples.join(m.withColumnsRenamed({"node": "s", "component": "s_canon"}), "s", "left")
        .withColumn("s", F.coalesce("s_canon", "s"))
        .drop("s_canon")
    )
    t = (
        t.join(m.withColumnsRenamed({"node": "o", "component": "o_canon"}), "o", "left")
        .withColumn(
            "o",
            F.when(F.col("o_kind") == "iri", F.coalesce("o_canon", "o")).otherwise(F.col("o")),
        )
        .drop("o_canon")
    )
    return t.dropDuplicates(["s", "p", "o", "o_kind", "o_dtype", "o_lang"])
