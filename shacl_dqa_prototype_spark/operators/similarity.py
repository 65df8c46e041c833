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
    embeddings: DataFrame, dim: int, n_planes: int = 16, seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bit i = sign(v · h_i). Signature is a compact
    long — bucketing key for ANN and for cosine near-dup dedup."""
    v = F.col(vec_col)
    sig = F.lit(0).cast("long")
    for i in range(n_planes):
        h = F.array(*[F.lit(x) for x in _hyperplane(dim, i, seed)])
        sig = sig + F.when(_dot(v, h) > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return embeddings.withColumn("lsh_sig", sig)


def ann_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_planes: int = 12, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict the exact scan to the query's LSH bucket (plus
    fallback to full scan if the bucket is smaller than k is left to the
    caller — this returns bucket-local top-k)."""
    dim = len(query_vec)
    with_sig = lsh_signatures(embeddings, dim, n_planes, seed, vec_col)
    qsig = 0
    for i in range(n_planes):
        h = _hyperplane(dim, i, seed)
        if sum(a * b for a, b in zip(query_vec, h)) > 0:
            qsig += 2**i
    bucket = with_sig.filter(F.col("lsh_sig") == qsig)
    return cosine_topk(bucket, query_vec, k, id_col, vec_col)


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
    n_planes: int = 12, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucket candidate join (equi on
    signature) + exact cosine verify. O(Σ bucket²), not O(n²)."""
    sig = lsh_signatures(embeddings, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "lsh_sig"
    )
    a = sig.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "lsh_sig")
    b = sig.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "lsh_sig")
    cos = _dot(F.col("v_a"), F.col("v_b")) / (
        F.nullif(_norm(F.col("v_a")), F.lit(0.0)) * F.nullif(_norm(F.col("v_b")), F.lit(0.0))
    )
    return (
        a.join(b, "lsh_sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
