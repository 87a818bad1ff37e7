"""Multi-index build in one job set (VERDICT r02 #6 — the reference's
ShardConfig per-index shard counts, ShardConfig.java:50-56, with the
indexName|routingHash shuffle key, BaseESMapper.java:13-14): N indices
off one input pass, each rank-identical to a solo build, with a Spark
job count independent of the index count."""
import numpy as np
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index, build_many
from sparkfts.fixtures import make_transcripts

QUERIES = [("alpha query index", "or"), ("shard merge", "and"),
           ("checkpoint resume committed", "or")]


def _with_index(pdf, n_indices=2):
    return pdf.assign(index=pdf["conv_id"].map(
        lambda c: f"idx_{sum(map(ord, c)) % n_indices}"))


@pytest.fixture(scope="module")
def many_built(spark, tmp_path_factory):
    pdf = _with_index(make_transcripts(30, seed=91))
    out = str(tmp_path_factory.mktemp("many"))
    configs = {"idx_0": BuildConfig(num_shards=3, partitions=4),
               "idx_1": BuildConfig(num_shards=5, partitions=4)}
    sums = build_many(spark, spark.createDataFrame(pdf), out, configs,
                      index_col="index")
    return pdf, out, configs, sums


def test_build_many_rank_identical_to_solo(spark, many_built,
                                           tmp_path_factory):
    pdf, out, configs, sums = many_built
    for nm, cfg in configs.items():
        rows = pdf[pdf["index"] == nm].drop(columns=["index"])
        solo_root = str(tmp_path_factory.mktemp(f"solo_{nm}"))
        ssum = build_index(spark, spark.createDataFrame(rows), solo_root,
                           order_cols=["conv_id", "turn_idx"], cfg=cfg)
        assert sums[nm]["n_docs"] == ssum["n_docs"]
        assert sums[nm]["docs_per_shard"] == ssum["docs_per_shard"]
        many = FTSIndex(spark, f"{out}/{nm}")
        solo = FTSIndex(spark, solo_root)
        assert (many.N, many.avgdl, many.num_shards) \
            == (solo.N, solo.avgdl, solo.num_shards)
        # identical docid assignment → identical doc store keys
        md = (many._docstore.select("docid", "conv_id", "turn_idx")
              .toPandas().sort_values("docid").reset_index(drop=True))
        sd = (solo._docstore.select("docid", "conv_id", "turn_idx")
              .toPandas().sort_values("docid").reset_index(drop=True))
        assert md.equals(sd), nm
        for q, mode in QUERIES:
            got = many.topk_pandas(q, k=10, mode=mode)
            want = solo.topk_pandas(q, k=10, mode=mode)
            assert got["docid"].tolist() == want["docid"].tolist(), (nm, q)
            assert got["score"].to_numpy() == pytest.approx(
                want["score"].to_numpy(), abs=1e-12), (nm, q)


def test_build_many_per_index_shard_counts(spark, many_built):
    pdf, out, configs, sums = many_built
    for nm, cfg in configs.items():
        idx = FTSIndex(spark, f"{out}/{nm}")
        assert idx.num_shards == cfg.num_shards
        shards = {int(r["shard"]) for r in
                  idx._docstore.select("shard").distinct().collect()}
        assert shards <= set(range(cfg.num_shards))
        # manifest covers every shard (placeholders for empty ones)
        import pyarrow.dataset as ds
        man = ds.dataset(f"{out}/{nm}/manifest",
                         format="parquet").to_table().to_pylist()
        assert {r["shard"] for r in man} == set(range(cfg.num_shards))


def test_build_many_job_count_independent_of_index_count(
        spark, tmp_path_factory):
    """The ShardConfig contract at scale: a nightly job over N indices
    must not pay N× the fixed per-job floor — job count for 2 vs 4
    indices must be equal."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run(n_idx, tag):
        pdf = _with_index(make_transcripts(24, seed=17), n_indices=n_idx)
        out = str(tmp_path_factory.mktemp(f"jobs_{tag}"))
        configs = {f"idx_{i}": BuildConfig(num_shards=2 + i, partitions=4)
                   for i in range(n_idx)}
        sc.setJobGroup(tag, f"build_many {n_idx}")
        build_many(spark, spark.createDataFrame(pdf), out, configs,
                   index_col="index")
        jobs = tracker.getJobIdsForGroup(tag)
        sc.setJobGroup(None, None)
        return len(jobs)

    j2 = run(2, "bm-2idx")
    j4 = run(4, "bm-4idx")
    assert j2 == j4, (j2, j4)


def test_build_many_rejects_unconfigured_index(spark, tmp_path_factory):
    pdf = _with_index(make_transcripts(6, seed=3), n_indices=3)
    out = str(tmp_path_factory.mktemp("many_bad"))
    with pytest.raises(AssertionError, match="unconfigured"):
        build_many(spark, spark.createDataFrame(pdf), out,
                   {"idx_0": BuildConfig(num_shards=2, partitions=2)},
                   index_col="index")


def test_build_many_empty_index_is_readable(spark, tmp_path_factory):
    """A configured index with zero rows must still materialize a
    readable root (the reference's post-processor creates EMPTY indices
    for every configured name, IndexingPostProcessor.java:86-94):
    placeholder manifest rows for all shards, n=0 stats, empty query
    results — not a crash."""
    pdf = make_transcripts(8, seed=23).assign(index="only")
    out = str(tmp_path_factory.mktemp("many_empty"))
    sums = build_many(
        spark, spark.createDataFrame(pdf), out,
        {"only": BuildConfig(num_shards=2, partitions=2),
         "ghost": BuildConfig(num_shards=3, partitions=2)},
        index_col="index")
    assert sums["ghost"]["n_docs"] == 0
    ghost = FTSIndex(spark, f"{out}/ghost")
    assert ghost.N == 0
    assert ghost.topk_pandas("alpha", k=5).empty
    assert ghost.topk_local("alpha", k=5).empty
    import pyarrow.dataset as ds
    man = ds.dataset(f"{out}/ghost/manifest",
                     format="parquet").to_table().to_pylist()
    assert {r["shard"] for r in man} == {0, 1, 2}
    assert all(r["n_postings"] == 0 for r in man)
    # the non-empty sibling is unaffected
    only = FTSIndex(spark, f"{out}/only")
    assert only.N == len(pdf)
    assert not only.topk_pandas("alpha", k=5).empty


def test_build_many_rerun_overwrites_and_cleans_staging(
        spark, tmp_path_factory):
    """Code-review r3 #1: a rebuild (or crash retry) into the same
    out_base must OVERWRITE the roots, not raise ENOTEMPTY, and no
    _staging-* dir may survive either run."""
    import os
    pdf = _with_index(make_transcripts(10, seed=41))
    out = str(tmp_path_factory.mktemp("many_rerun"))
    cfgs = {"idx_0": BuildConfig(num_shards=2, partitions=2),
            "idx_1": BuildConfig(num_shards=2, partitions=2)}
    build_many(spark, spark.createDataFrame(pdf), out, cfgs,
               index_col="index")
    first = FTSIndex(spark, f"{out}/idx_0").topk_pandas("alpha", k=5)
    build_many(spark, spark.createDataFrame(pdf), out, cfgs,
               index_col="index")                       # must not raise
    again = FTSIndex(spark, f"{out}/idx_0").topk_pandas("alpha", k=5)
    assert again["docid"].tolist() == first["docid"].tolist()
    assert not [d for d in os.listdir(out) if d.startswith("_staging")]


def test_build_many_failure_cleans_staging(spark, tmp_path_factory):
    """Any failure must not leak partial staging writes under out_base."""
    import os
    pdf = _with_index(make_transcripts(4, seed=42), n_indices=3)
    out = str(tmp_path_factory.mktemp("many_fail"))
    with pytest.raises(Exception):
        build_many(spark, spark.createDataFrame(pdf), out,
                   {"idx_0": BuildConfig(num_shards=2, partitions=2),
                    "idx_1": BuildConfig(num_shards=2, partitions=2),
                    # idx_2 present in data but unconfigured → assert
                    }, index_col="index")
    assert not os.path.isdir(out) or \
        not [d for d in os.listdir(out) if d.startswith("_staging")]
