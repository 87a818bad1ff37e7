"""Materialized ANN index (VERDICT r3 next #1) + Arrow-vectorized LSH
signatures (next #2).

The one-shot ivf_topk/lsh_topk re-assign every corpus vector per query;
build_ann persists the assignment as a PARTITION column so AnnIndex
queries are partition-pruned reads + exact re-rank — mirroring the fts
side's shard pruning. Signature computation is one numpy matmul per
Arrow batch (planes/centroids broadcast in the closure), replacing the
per-plane Catalyst literal arrays that blow up codegen at real
embedding dims.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from datapipe.similarity import (AnnIndex, ann_signatures, build_ann,
                                 hyperplanes, ivf_topk, lsh_buckets,
                                 lsh_topk)


def _rand_emb(spark, n=300, dim=16, seed=7, dupes=()):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    for a, b in dupes:
        v[b] = v[a] + rng.standard_normal(dim).astype(np.float32) * 1e-3
    rows = [(int(i), [float(x) for x in v[i]]) for i in range(n)]
    return v, spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def test_lsh_buckets_high_dim_matches_numpy(spark):
    """dim=512 x 64 planes: the former literal-array plan would carry
    ~33k literal expressions; the Arrow kernel must stay flat AND agree
    with a straight numpy reference bit-for-bit."""
    dim, n_planes = 512, 63
    v, edf = _rand_emb(spark, n=50, dim=dim, seed=11)
    planes = hyperplanes(dim, n_planes=n_planes, seed=5)
    got = {r["vec_id"]: r["bucket"]
           for r in lsh_buckets(edf, planes).collect()}
    bits = (v.astype(np.float64) @ planes.T) > 0.0
    w = (1 << np.arange(n_planes, dtype=np.int64))
    want = bits.astype(np.int64) @ w
    assert got == {i: int(want[i]) for i in range(len(v))}
    # and the plan contains no per-plane aggregate chain
    plan = lsh_buckets(edf, planes)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "zip_with" not in plan


def test_band_sigs_match_per_band_packing(spark):
    """band_rows grouping must pack planes[band*rows + j] at bit j —
    the exact packing embedding_dup_pairs' oracle SQL reproduces."""
    dim, bands, rows_ = 32, 4, 3
    v, edf = _rand_emb(spark, n=20, dim=dim, seed=12)
    planes = hyperplanes(dim, n_planes=bands * rows_, seed=42)
    out = {r["vec_id"]: r["band_sigs"] for r in ann_signatures(
        edf, dim, planes=planes, band_rows=rows_).collect()}
    for i in range(len(v)):
        for bnd in range(bands):
            sig = 0
            for j in range(rows_):
                d = float(v[i].astype(np.float64)
                          @ planes[bnd * rows_ + j])
                if d > 0:
                    sig |= 1 << j
            assert out[i][bnd] == sig, (i, bnd)


def test_embedding_dup_pairs_lsh_high_dim(spark):
    """Planted near-dup at dim 512 must survive the vectorized LSH path
    (and the plan must not contain a cartesian join)."""
    from datapipe.dedup import embedding_dup_pairs
    _, edf = _rand_emb(spark, n=60, dim=512, seed=13,
                       dupes=[(3, 41), (10, 55)])
    out = embedding_dup_pairs(edf, threshold=0.99, method="lsh")
    assert {(r["a"], r["b"]) for r in out.collect()} == {(3, 41), (10, 55)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


@pytest.fixture(scope="module")
def ivf_ann(spark, tmp_path_factory):
    _, edf = _rand_emb(spark, n=300, dim=16, seed=7)
    root = str(tmp_path_factory.mktemp("ann_ivf"))
    meta = build_ann(spark, edf, root, kind="ivf", n_centroids=8)
    return edf, AnnIndex(spark, root), meta


@pytest.fixture(scope="module")
def lsh_ann(spark, tmp_path_factory):
    _, edf = _rand_emb(spark, n=300, dim=16, seed=7)
    root = str(tmp_path_factory.mktemp("ann_lsh"))
    build_ann(spark, edf, root, kind="lsh", n_planes=12,
              bucket_partitions=32)
    return edf, AnnIndex(spark, root)


def test_ann_ivf_matches_scan_path(spark, ivf_ann):
    """AnnIndex.topk (pruned read) must equal ivf_topk (full re-assign
    scan) row-for-row for the same centroids; topk_local (zero Spark
    jobs) must agree too."""
    edf, idx, meta = ivf_ann
    for qi in (0, 17, 123):
        q = [float(x) for x in
             edf.where(F.col("vec_id") == qi).first()["embedding"]]
        want = ivf_topk(edf, q, k=10, centroids=meta["centroids"],
                        nprobe=3).collect()
        got = idx.topk(q, k=10, nprobe=3).collect()
        assert [(r["vec_id"], r["cos_r"]) for r in got] \
            == [(r["vec_id"], r["cos_r"]) for r in want], qi
        loc = idx.topk_local(q, k=10, nprobe=3)
        assert loc["vec_id"].tolist() == [r["vec_id"] for r in got]
        assert loc["cos_r"].to_numpy() == pytest.approx(
            [r["cos_r"] for r in got], abs=1e-6)


def test_ann_ivf_default_centroids_match_sampled(spark, ivf_ann,
                                                 tmp_path_factory):
    """build_ann's default centroid sampling must reproduce ivf_topk's
    (same seeded md5-order sample, same tie-break keying)."""
    edf, idx, _ = ivf_ann
    q = [float(x) for x in
         edf.where(F.col("vec_id") == 42).first()["embedding"]]
    want = ivf_topk(edf, q, k=10, n_centroids=8, nprobe=3).collect()
    got = idx.topk(q, k=10, nprobe=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ann_lsh_matches_scan_path(spark, lsh_ann):
    edf, idx = lsh_ann
    planes = hyperplanes(16, n_planes=12, seed=42)
    for qi in (0, 55):
        q = [float(x) for x in
             edf.where(F.col("vec_id") == qi).first()["embedding"]]
        want = lsh_topk(edf, q, k=10, planes=planes,
                        max_hamming=2).collect()
        got = idx.topk(q, k=10, max_hamming=2).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], qi
        loc = idx.topk_local(q, k=10, max_hamming=2)
        assert loc["vec_id"].tolist() == [r["vec_id"] for r in got]


def test_ann_partition_pruning_in_plan(spark, ivf_ann, lsh_ann):
    """The whole point of materialization: the query plan must prune
    partitions (PartitionFilters on cell / pbucket), not scan + filter
    the full corpus."""
    edf, idx, _ = ivf_ann
    q = [1.0] * 16
    plan = idx._pruned(q, 3, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    _, lidx = lsh_ann
    lplan = lidx._pruned(q, 3, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in lplan and "pbucket" in lplan
    # pruning is real: probed cells < total cells on disk
    import os
    cells = [d for d in os.listdir(os.path.join(idx.root, "data"))
             if d.startswith("cell=")]
    assert len(cells) > 3


def test_ann_ivf_recall(spark, tmp_path_factory):
    """recall@10 >= 0.9 vs exact brute force on a fresh corpus (the r3
    recall bar, now through the materialized index)."""
    from datapipe.similarity import cosine_topk
    _, edf = _rand_emb(spark, n=400, dim=8, seed=21)
    root = str(tmp_path_factory.mktemp("ann_recall"))
    build_ann(spark, edf, root, kind="ivf", n_centroids=10,
              train_iters=1)
    idx = AnnIndex(spark, root)
    hits = tot = 0
    for qi in (1, 50, 200, 333):
        q = [float(x) for x in
             edf.where(F.col("vec_id") == qi).first()["embedding"]]
        exact = {r["vec_id"] for r in cosine_topk(edf, q, k=10).collect()}
        approx = {r["vec_id"] for r in
                  idx.topk(q, k=10, nprobe=4).collect()}
        hits += len(exact & approx)
        tot += len(exact)
    assert hits / tot >= 0.9


def test_ann_topk_many_matches_solo(spark, ivf_ann, lsh_ann):
    """Batched ANN (one union-pruned read, one job) must equal solo
    topk per query for both index kinds."""
    edf, idx, _ = ivf_ann
    _, lidx = lsh_ann
    qs = {}
    for qi in (0, 17, 123):
        qs[f"q{qi}"] = [float(x) for x in
                        edf.where(F.col("vec_id") == qi)
                        .first()["embedding"]]
    def run(index, tag, queries):
        sc = spark.sparkContext
        sc.setJobGroup(tag, tag)
        out = index.topk_many(queries, k=10)
        jobs = sc.statusTracker().getJobIdsForGroup(tag)
        sc.setJobGroup(None, None)
        return out, len(jobs)

    for index in (idx, lidx):
        one_q = {"q0": qs["q0"]}
        _, j1 = run(index, f"ann-many1-{index.kind}", one_q)
        got, j3 = run(index, f"ann-many3-{index.kind}", qs)
        # job count independent of the query-set size (the whole set
        # answers from ONE union-pruned read)
        assert j3 == j1, (index.kind, j1, j3)
        for qid, q in qs.items():
            want = index.topk(q, k=10).collect()
            assert got[qid]["vec_id"].tolist() == \
                [r["vec_id"] for r in want], (index.kind, qid)
            assert got[qid]["cos_r"].to_numpy() == pytest.approx(
                [r["cos_r"] for r in want], abs=1e-9), (index.kind, qid)
    assert idx.topk_many({}, k=5) == {}


def test_ann_append_matches_scan_over_union(spark, tmp_path_factory):
    """Incremental ANN: build on the first half, append the second —
    queries must equal the scan-path ivf_topk over the FULL corpus with
    the index's (first-half-sampled) centroids, and the appended root
    must keep its partition pruning."""
    _, edf = _rand_emb(spark, n=240, dim=16, seed=31)
    first = edf.where(F.col("vec_id") < 120)
    second = edf.where(F.col("vec_id") >= 120)
    root = str(tmp_path_factory.mktemp("ann_append"))
    meta = build_ann(spark, first, root, kind="ivf", n_centroids=6)
    from datapipe.similarity import build_ann_append
    build_ann_append(spark, second, root)
    idx = AnnIndex(spark, root)
    for qi in (3, 150):
        q = [float(x) for x in
             edf.where(F.col("vec_id") == qi).first()["embedding"]]
        want = ivf_topk(edf, q, k=10, centroids=meta["centroids"],
                        nprobe=3).collect()
        got = idx.topk(q, k=10, nprobe=3).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], qi
        loc = idx.topk_local(q, k=10, nprobe=3)
        assert loc["vec_id"].tolist() == [r["vec_id"] for r in got]
    plan = idx._pruned([1.0] * 16, 3, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan
    # LSH kind appends too
    lroot = str(tmp_path_factory.mktemp("ann_append_lsh"))
    build_ann(spark, first, lroot, kind="lsh", n_planes=10,
              bucket_partitions=16)
    build_ann_append(spark, second, lroot)
    lidx = AnnIndex(spark, lroot)
    q = [float(x) for x in
         edf.where(F.col("vec_id") == 200).first()["embedding"]]
    want = lsh_topk(edf, q, k=10,
                    planes=hyperplanes(16, n_planes=10, seed=42),
                    max_hamming=2).collect()
    got = lidx.topk(q, k=10, max_hamming=2).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ann_zero_vector_deterministic_and_refresh(spark,
                                                   tmp_path_factory):
    """Code-review r4b: (a) a zero-norm corpus vector must rank
    DETERMINISTICALLY (guarded cosine = 0) and identically across
    topk / topk_local / topk_many — not through NaN, whose sort
    placement differs between Spark (first under desc) and pandas
    (last); (b) a handle created before build_ann_append must see the
    appended vectors after refresh()."""
    from datapipe.similarity import build_ann_append
    _, edf = _rand_emb(spark, n=60, dim=8, seed=41)
    zero = spark.createDataFrame([(999, [0.0] * 8)],
                                 "vec_id long, embedding array<float>")
    root = str(tmp_path_factory.mktemp("ann_zero"))
    build_ann(spark, edf.unionByName(zero), root, kind="ivf",
              n_centroids=4)
    idx = AnnIndex(spark, root)
    q = [float(x) for x in
         edf.where(F.col("vec_id") == 7).first()["embedding"]]
    got = idx.topk(q, k=61, nprobe=4).collect()
    loc = idx.topk_local(q, k=61, nprobe=4)
    many = idx.topk_many({"q": q}, k=61, nprobe=4)["q"]
    assert loc["vec_id"].tolist() == [r["vec_id"] for r in got]
    assert many["vec_id"].tolist() == [r["vec_id"] for r in got]
    zrow = [r for r in got if r["vec_id"] == 999]
    if zrow:                      # zero vector inside a probed cell
        assert zrow[0]["cos_r"] == 0.0

    # (b) append visibility: stale Spark listing until refresh()
    before = AnnIndex(spark, root)
    before.topk(q, k=5, nprobe=4).collect()     # materialize listing
    extra = spark.createDataFrame(
        [(1000 + i, [float(x) for x in
                     np.random.default_rng(50 + i).standard_normal(8)])
         for i in range(20)],
        "vec_id long, embedding array<float>")
    build_ann_append(spark, extra, root)
    stale_ids = {r["vec_id"] for r in
                 before.topk(q, k=100, nprobe=4).collect()}
    before.refresh()
    fresh_ids = {r["vec_id"] for r in
                 before.topk(q, k=100, nprobe=4).collect()}
    assert fresh_ids >= stale_ids
    assert any(v >= 1000 for v in fresh_ids - stale_ids) or \
        not any(v >= 1000 for v in fresh_ids)   # appended cells probed?
    # topk_local (fresh pyarrow dataset per call) always sees the union
    loc_ids = set(before.topk_local(q, k=100, nprobe=4)["vec_id"])
    assert loc_ids == fresh_ids
