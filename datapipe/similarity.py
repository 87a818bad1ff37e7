"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline (JVM-side zip_with /
aggregate — no Python in the hot path); the scale path is LSH bucketing
(deterministic hyperplanes) or IVF with fixed seed centroids, both of
which prune the candidate set before the exact re-rank.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _cos_to(vec: list[float], vec_col: str = "embedding"):
    """Column expr: cosine(embedding, vec) — pure built-ins, float64
    throughout (float32 inputs upcast before any product, so results are
    engine-portable)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = F.array(*[F.lit(float(x)) for x in vec])
    dot = F.aggregate(F.zip_with(v, q, lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    nv = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    nq = float(np.sqrt(np.sum(np.asarray(vec, dtype=np.float64) ** 2)))
    return dot / (nv * F.lit(nq))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force top-k by cosine, ties broken by id asc.
    One scan, no shuffle except the final top-k sort (Spark's
    TakeOrderedAndProject — a per-partition heap + driver merge, not a
    global sort, so it scales to arbitrary corpus size)."""
    return (emb.select(F.col(id_col).alias("vec_id"),
                       _cos_to(query_vec, vec_col).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id"))
            .limit(k)
            .select("vec_id", F.round("cos", 6).alias("cos_r")))


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_buckets(emb: DataFrame, planes: np.ndarray,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket per vector: bit i = (v · plane_i) > 0, packed into
    a long. Pure built-ins (zip_with/aggregate per plane)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        col = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(F.zip_with(vec_col, col, lambda x, y: x * y),
                          F.lit(0.0), lambda a, x: a + x)
        sig = sig + F.when(dot > 0, F.lit(1 << i).cast("long")
                           ).otherwise(F.lit(0).cast("long"))
    return emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("embedding"),
                      sig.alias("bucket"))


def lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             planes: np.ndarray | None = None, max_hamming: int = 2,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: probe buckets within ``max_hamming`` bit flips of the
    query's bucket, exact cosine re-rank inside. Approximate (recall <1
    by design); the bucket filter is a partition-prunable integer
    predicate at scale."""
    q = np.asarray(query_vec, dtype=np.float64)
    if planes is None:
        planes = hyperplanes(len(q))
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(q, p)) > 0:
            qsig |= 1 << i
    n = len(planes)
    probe = {qsig}
    if max_hamming >= 1:
        probe |= {qsig ^ (1 << i) for i in range(n)}
    if max_hamming >= 2:
        probe |= {qsig ^ (1 << i) ^ (1 << j)
                  for i in range(n) for j in range(i + 1, n)}
    b = lsh_buckets(emb, planes, id_col, vec_col)
    return (b.where(F.col("bucket").isin([int(x) for x in probe]))
            .select("vec_id", _cos_to(list(q), "embedding").alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id"))
            .limit(k)
            .select("vec_id", F.round("cos", 6).alias("cos_r")))


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             centroid_ids: list[int] | None = None, nprobe: int = 3,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN with deterministic centroids (a fixed set of member
    vectors, default ids 0,50,100,...,450): assign every vector to its
    max-cosine centroid (one pass, centroids broadcast as literal
    arrays), probe the ``nprobe`` centroids nearest the query, exact
    re-rank inside probed cells."""
    if centroid_ids is None:
        centroid_ids = list(range(0, 500, 50))
    cents = {int(r["vec_id"]): list(r["vec"]) for r in
             emb.where(F.col(id_col).isin(centroid_ids))
                .select(F.col(id_col).alias("vec_id"),
                        F.col(vec_col).alias("vec")).collect()}
    # assignment: greatest cosine wins, ties by centroid id asc
    assign = F.greatest(*[
        F.struct(_cos_to(v, vec_col).alias("c"),
                 F.lit(-cid).alias("negid"))
        for cid, v in sorted(cents.items())])
    q = np.asarray(query_vec, dtype=np.float64)

    def cos_np(v):
        v = np.asarray(v, dtype=np.float64)
        return float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))

    probe = [cid for cid, _ in sorted(cents.items(),
                                      key=lambda kv: (-cos_np(kv[1]), kv[0])
                                      )[:nprobe]]
    return (emb.withColumn("cell", -assign.getField("negid"))
            .where(F.col("cell").isin(probe))
            .select(F.col(id_col).alias("vec_id"),
                    _cos_to(list(q), vec_col).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id"))
            .limit(k)
            .select("vec_id", F.round("cos", 6).alias("cos_r")))
