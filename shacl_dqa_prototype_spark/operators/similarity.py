"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exactness baseline: one scan, dot product
  via F.aggregate/zip_with (JVM-side, no UDF), orderBy+limit (Spark runs
  this as a TakeOrdered, not a global sort).
* LSH-bucketed ANN — the scale path: random-hyperplane signatures bucket
  the corpus; a query probes only its bucket(s). Hyperplanes are derived
  deterministically from a seed so results are reproducible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector. The query is a literal
    array (broadcast by value into the plan); per-row work is a fused
    zip_with/aggregate — whole-stage-codegen, no shuffle until the final
    TakeOrdered(k)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    v = F.col(vec_col)
    cos = _dot(v, q) / (F.nullif(_norm(v), F.lit(0.0)) * qn)
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _hyperplane(dim: int, plane_idx: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (no numpy RNG state,
    reproducible across engines/runs)."""
    return [
        math.sin(seed * 1_000_003 + plane_idx * 10_007 + j * 97 + 0.5)
        for j in range(dim)
    ]


def lsh_signatures(
    embeddings: DataFrame, dim: int, n_planes: int = 12, seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bit i = sign(v · h_i). Signature is a compact
    long — bucketing key for ANN and for cosine near-dup dedup. The
    ``n_planes`` default MUST match query_signature/ann_topk (12): an
    index built at one width and probed at another never matches —
    silent recall loss, no error."""
    v = F.col(vec_col)
    sig = F.lit(0).cast("long")
    for i in range(n_planes):
        h = F.array(*[F.lit(x) for x in _hyperplane(dim, i, seed)])
        sig = sig + F.when(_dot(v, h) > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return embeddings.withColumn("lsh_sig", sig)


def query_signature(query_vec: list[float], n_planes: int = 12,
                    seed: int = 42) -> int:
    """Driver-side LSH signature of a query vector (same hyperplanes as
    lsh_signatures)."""
    qsig = 0
    for i in range(n_planes):
        h = _hyperplane(len(query_vec), i, seed)
        if sum(a * b for a, b in zip(query_vec, h)) > 0:
            qsig += 2**i
    return qsig


def ann_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_planes: int = 12, seed: int = 42, probe_hamming: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH ANN: restrict the exact cosine scan to every bucket
    whose signature is within ``probe_hamming`` bits of the query's —
    single-bucket probing misses true neighbors whenever one hyperplane
    disagrees, which for a ~30° neighbor over 12 planes is the COMMON
    case, not the exception. Probing Σ C(n_planes, ≤h) of the 2^n_planes
    buckets keeps the scan sublinear at scale (signature is a bucketable/
    partitionable key) while recovering recall; recall@k vs brute force
    is asserted in tests."""
    from itertools import combinations

    dim = len(query_vec)
    with_sig = lsh_signatures(embeddings, dim, n_planes, seed, vec_col)
    qsig = query_signature(query_vec, n_planes, seed)
    # enumerate the probe signatures explicitly (an IN-list prunes
    # sig-partitioned/bucketed storage; a bit_count filter would scan all
    # rows) unless the combinatorial list is impractically large
    n_probes = sum(math.comb(n_planes, h) for h in range(probe_hamming + 1))
    if n_probes <= 4096:
        sigs = [
            qsig ^ sum(1 << b for b in flip)
            for h in range(probe_hamming + 1)
            for flip in combinations(range(n_planes), h)
        ]
        probed = with_sig.filter(F.col("lsh_sig").isin(sigs))
    else:
        probed = with_sig.filter(
            F.bit_count(F.col("lsh_sig").bitwiseXOR(F.lit(qsig)))
            <= probe_hamming
        )
    return cosine_topk(probed, query_vec, k, id_col, vec_col)


def ivf_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_cells: int = 16, n_probe: int = 2, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: a KMeans coarse quantizer partitions the corpus into
    cells; a query probes only the ``n_probe`` nearest cells and runs the
    exact cosine top-k inside them. The scale path for 100 TB: cells map
    to partitions, the centroid table is broadcast, and a query touches
    n_probe/n_cells of the data. Seeded KMeans keeps results reproducible."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.withColumn(
        "features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, maxIter=5).fit(feat)
    centers = model.clusterCenters()

    def cos(a, b) -> float:
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(float(y) * float(y) for y in b)) or 1.0
        return num / (na * nb)

    probe = sorted(range(len(centers)),
                   key=lambda i: -cos(query_vec, centers[i]))[:n_probe]
    bucket = model.transform(feat).filter(F.col("prediction").isin(probe))
    return cosine_topk(bucket.drop("features", "prediction"),
                       query_vec, k, id_col, vec_col)


def embedding_near_duplicates(
    embeddings: DataFrame, threshold: float = 0.95, dim: int = 64,
    n_planes: int = 12, n_bands: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs: BANDED LSH candidate generation +
    exact cosine verify. The signature's n_planes bits are split into
    n_bands bands; a pair is a candidate if ANY band matches (MinHash-LSH
    style), instead of requiring all n_planes bits equal — full-signature
    equality at 12 planes has near-zero recall for anything short of
    exact duplicates. Still O(Σ band-bucket²) work, not O(n²); precision
    is exact (candidates are verified). Tune n_bands up for recall, down
    for pruning."""
    if n_planes % n_bands != 0:
        # ValueError, not assert: asserts vanish under python -O and the
        # uneven-band fallout (silently reduced recall) must stay loud
        raise ValueError(
            f"n_bands ({n_bands}) must divide n_planes ({n_planes})")
    bits = n_planes // n_bands
    sig = lsh_signatures(embeddings, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "lsh_sig"
    )
    # explode into (band, band_sig) keys
    band_key = F.explode(
        F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("lsh_sig"), b * bits)
                .bitwiseAND(F.lit((1 << bits) - 1)).alias("band_sig"),
            )
            for b in range(n_bands)
        ])
    )
    banded = sig.select("id", "v", band_key.alias("bk")).select(
        "id", "v", F.col("bk.band").alias("band"),
        F.col("bk.band_sig").alias("band_sig"),
    )
    a = banded.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                      "band", "band_sig")
    b = banded.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                      "band", "band_sig")
    cand = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "v_a", "v_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = _dot(F.col("v_a"), F.col("v_b")) / (
        F.nullif(_norm(F.col("v_a")), F.lit(0.0))
        * F.nullif(_norm(F.col("v_b")), F.lit(0.0))
    )
    return (
        cand.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def centroid_cosine(
    embeddings: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid affinity: every vector's cosine to the MEAN
    vector of its group — the embedding-space outlier signal a curation
    pass reads to find mislabeled / off-topic members of a cluster,
    source, or dedup family (low cosine to your own centroid = you don't
    belong). Emits ``(vec_id, <group_col>, cos_centroid)`` for every row,
    cosine rounded to 3 decimals (the float32-input discipline of
    cosine_topk — centroid sums are order-sensitive in the last double
    ulps across engines/partitionings, so parity is pinned at 1e-3 where
    it is exact).

    Scale shape: the per-dimension mean runs as posexplode →
    groupBy(group, pos) with map-side partial avg — the shuffle carries
    one row per (group, dimension) PER TASK, not per input row — and the
    reassembled (#groups × 1) centroid table BROADCASTS back onto the
    corpus scan, so the full pass over the vectors is join-shuffle-free.
    The cosine itself is the fused zip_with/aggregate used everywhere in
    this module (JVM-side, no UDF)."""
    g = F.col(group_col)
    pe = embeddings.select(
        g.alias("_g"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"))
    cent = (
        pe.groupBy("_g", "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
        .groupBy("_g")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"]).alias("_centroid"))
    )
    v = F.col(vec_col)
    cos = _dot(v, F.col("_centroid")) / (
        F.nullif(_norm(v), F.lit(0.0))
        * F.nullif(_norm(F.col("_centroid")), F.lit(0.0)))
    return (
        embeddings.join(F.broadcast(cent), g == F.col("_g"))
        .select(F.col(id_col).alias("vec_id"), g.alias(group_col),
                F.round(cos, 3).alias("cos_centroid"))
    )
