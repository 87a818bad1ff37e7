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


def sample_centroid_ids(emb: DataFrame, n_centroids: int = 10,
                        seed: int = 42,
                        id_col: str = "vec_id") -> list[int]:
    """Deterministic seeded sample of ``n_centroids`` member-vector ids:
    the n smallest md5('<seed>:'||id) — independent of partitioning and
    reproducible in any engine (Spark F.md5 ≡ DuckDB md5 on the decimal
    string), so an SQL oracle can re-derive the exact same set."""
    rows = (emb.select(F.col(id_col))
            .orderBy(F.md5(F.encode(F.concat(
                F.lit(f"{seed}:"), F.col(id_col).cast("string")), "UTF-8")))
            .limit(int(n_centroids)).collect())
    return [int(r[0]) for r in rows]


def _assign_expr(cents: dict[int, list[float]], vec_col: str):
    """Max-cosine cell assignment as a struct column (c, negid); ties
    break toward the lower centroid id. Handles the single-centroid
    case (F.greatest requires >= 2 columns)."""
    structs = [F.struct(_cos_to(v, vec_col).alias("c"),
                        F.lit(-cid).alias("negid"))
               for cid, v in sorted(cents.items())]
    return structs[0] if len(structs) == 1 else F.greatest(*structs)


def train_centroids(emb: DataFrame, init: list[list[float]],
                    iters: int = 2,
                    vec_col: str = "embedding") -> list[list[float]]:
    """Spherical k-means refinement of ``init`` centroids: each Lloyd
    round assigns every vector to its max-cosine centroid (broadcast
    literal arrays, one scan) and recomputes centroids as the normalized
    elementwise mean via posexplode + groupBy(cell, pos) avg — ONE
    shuffle of (k·dim) aggregated rows per round, k·dim driver state.
    Empty cells keep their previous centroid. Deterministic given
    ``init`` and the data."""
    cents = [np.asarray(c, dtype=np.float64) for c in init]
    for _ in range(int(iters)):
        assign = _assign_expr(
            {i: list(c) for i, c in enumerate(cents)}, vec_col)
        # cell must land in its own projection: a generator (posexplode)
        # in the same select defeats struct-field resolution on greatest()
        rows = (emb.withColumn("cell", -assign.getField("negid"))
                .select("cell",
                        F.posexplode(F.transform(
                            F.col(vec_col), lambda x: x.cast("double")))
                         .alias("pos", "val"))
                .groupBy("cell", "pos").agg(F.avg("val").alias("m"))
                .collect())
        acc: dict[int, dict[int, float]] = {}
        for r in rows:
            acc.setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["m"])
        for i, c in enumerate(cents):
            if i in acc:
                v = np.array([acc[i][p] for p in range(len(c))])
                n = float(np.linalg.norm(v))
                if n > 0:
                    cents[i] = v / n
    return [c.tolist() for c in cents]


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             centroids: list[list[float]] | None = None,
             centroid_ids: list[int] | None = None,
             n_centroids: int = 10, seed: int = 42,
             train_iters: int = 0, nprobe: int = 3,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: assign every vector to its max-cosine centroid (one
    pass, centroids broadcast as literal arrays), probe the ``nprobe``
    centroids nearest the query, exact re-rank inside probed cells.

    Centroid source (first match wins):
      ``centroids``     explicit vectors (e.g. from train_centroids) —
                        cells keyed by list index;
      ``centroid_ids``  explicit member-vector ids;
      default           deterministic seeded sample of ``n_centroids``
                        member vectors (sample_centroid_ids — SQL-oracle
                        reproducible), refined by ``train_iters`` rounds
                        of spherical k-means when train_iters > 0 (the
                        quality path; trained means are data-derived so
                        not inlineable into a static SQL oracle)."""
    if centroids is not None:
        cents = {i: [float(x) for x in c] for i, c in enumerate(centroids)}
    else:
        if centroid_ids is None:
            centroid_ids = sample_centroid_ids(emb, n_centroids, seed,
                                               id_col)
        cents = {int(r["vec_id"]): list(r["vec"]) for r in
                 emb.where(F.col(id_col).isin(centroid_ids))
                    .select(F.col(id_col).alias("vec_id"),
                            F.col(vec_col).alias("vec")).collect()}
        if train_iters > 0:
            trained = train_centroids(
                emb, [v for _, v in sorted(cents.items())],
                iters=train_iters, vec_col=vec_col)
            cents = {i: c for i, c in enumerate(trained)}
    if not cents:
        raise ValueError("ivf_topk: no centroids (empty corpus?)")
    # assignment: greatest cosine wins, ties by centroid id asc
    assign = _assign_expr(cents, vec_col)
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
