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


# ------------------------------------------------------------------ #
# Round 4: routing + fields in build_many, and (index, shard) resume #
# ------------------------------------------------------------------ #

def _heterogeneous_input(n=36, seed=61):
    from sparkfts.fixtures import make_transcripts
    pdf = _with_index(make_transcripts(n, seed=seed), n_indices=3)
    pdf = pdf.rename(columns={"index": "ix"})
    pdf["ix"] = pdf["ix"].map({"idx_0": "plain", "idx_1": "routed",
                               "idx_2": "mf"})
    pdf["org"] = pdf["conv_id"].map(lambda c: f"o{sum(map(ord, c)) % 3}")
    pdf["lang"] = pdf["conv_id"].map(
        lambda c: ["en", "de", "fr"][sum(map(ord, c)) % 3])
    return pdf


def _hetero_configs():
    from sparkfts.analyzer import TokenizerConfig
    return {
        "plain": BuildConfig(num_shards=3, partitions=4),
        "routed": BuildConfig(num_shards=4, partitions=4,
                              routing_col="org", shards_per_org=2),
        "mf": BuildConfig(num_shards=2, partitions=4,
                          fields={"text": TokenizerConfig(),
                                  "lang": TokenizerConfig()}),
    }


@pytest.fixture(scope="module")
def hetero_built(spark, tmp_path_factory):
    pdf = _heterogeneous_input()
    out = str(tmp_path_factory.mktemp("many_hetero"))
    sums = build_many(spark, spark.createDataFrame(pdf), out,
                      _hetero_configs(), index_col="ix")
    return pdf, out, sums


def test_build_many_routed_and_multifield(spark, hetero_built,
                                          tmp_path_factory):
    """VERDICT r3 next #3: one build_many call covering a plain, a
    tenant-routed and a multi-field index — each rank-identical to its
    solo build_index, including the org-scoped and field-scoped query
    surfaces."""
    pdf, out, sums = hetero_built
    configs = _hetero_configs()
    for nm, cfg in configs.items():
        rows = pdf[pdf["ix"] == nm].drop(columns=["ix"])
        solo_root = str(tmp_path_factory.mktemp(f"hsolo_{nm}"))
        ssum = build_index(spark, spark.createDataFrame(rows), solo_root,
                           order_cols=["conv_id", "turn_idx"], cfg=cfg)
        assert sums[nm]["n_docs"] == ssum["n_docs"], nm
        assert sums[nm]["docs_per_shard"] == ssum["docs_per_shard"], nm
        assert sums[nm]["docid_span"] == ssum["docid_span"], nm
        many = FTSIndex(spark, f"{out}/{nm}")
        solo = FTSIndex(spark, solo_root)
        assert (many.N, many.avgdl, many.num_shards, many.routing_col,
                many.fields) == (solo.N, solo.avgdl, solo.num_shards,
                                 solo.routing_col, solo.fields), nm
        md = (many._docstore.select("docid", "conv_id", "turn_idx")
              .toPandas().sort_values("docid").reset_index(drop=True))
        sd = (solo._docstore.select("docid", "conv_id", "turn_idx")
              .toPandas().sort_values("docid").reset_index(drop=True))
        assert md.equals(sd), nm

        def queries(idx):
            if cfg.fields:
                return [idx.topk_pandas("alpha query index", k=10,
                                        field="text"),
                        idx.topk_pandas("en de", k=10, mode="or",
                                        field="lang")]
            if cfg.routing_col:
                return [idx.topk_pandas("alpha query index", k=10),
                        idx.topk_pandas("alpha query index", k=10,
                                        org="o1"),
                        idx.topk_pandas("shard merge", k=10, mode="and",
                                        org="o2")]
            return [idx.topk_pandas(q, k=10, mode=m) for q, m in QUERIES]

        for got, want in zip(queries(many), queries(solo)):
            assert got["docid"].tolist() == want["docid"].tolist(), nm
            assert got["score"].to_numpy() == pytest.approx(
                want["score"].to_numpy(), abs=1e-12), nm
    # routed index has org_ranges (contiguous-tenant fast path active)
    import os
    assert os.path.isdir(f"{out}/routed/org_ranges")


def test_build_many_hetero_job_count_invariant(spark, tmp_path_factory):
    """Adding a multi-field index to a nightly must not add Spark jobs
    (routing adds a fixed 2-job org_ranges derivation per ROUTED index,
    so the invariance is checked at equal routed counts)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    from sparkfts.analyzer import TokenizerConfig

    def run(n_plain, tag):
        pdf = _heterogeneous_input(n=24, seed=62)
        pdf.loc[pdf["ix"] == "routed", "ix"] = "plain"   # no routed
        configs = {"plain": BuildConfig(num_shards=3, partitions=4),
                   "mf": BuildConfig(num_shards=2, partitions=4,
                                     fields={"text": TokenizerConfig()})}
        for i in range(n_plain):
            configs[f"extra{i}"] = BuildConfig(num_shards=2,
                                               partitions=4)
        if n_plain:   # every configured index gets rows (an EMPTY index
            # costs fixed placeholder writes by design, so the
            # invariance claim is per-data-bearing index)
            plain_rows = pdf.index[pdf["ix"] == "plain"]
            for j, ridx in enumerate(plain_rows):
                if j % (n_plain + 1):
                    pdf.loc[ridx, "ix"] = f"extra{j % (n_plain + 1) - 1}"
        out = str(tmp_path_factory.mktemp(f"hjobs_{tag}"))
        sc.setJobGroup(tag, tag)
        build_many(spark, spark.createDataFrame(pdf), out, configs,
                   index_col="ix")
        jobs = tracker.getJobIdsForGroup(tag)
        sc.setJobGroup(None, None)
        return len(jobs)

    assert run(0, "bmh-0") == run(3, "bmh-3")


def test_build_many_kill_resume_converges(spark, tmp_path_factory):
    """VERDICT r3 next #4: a killed nightly resumes at (index, shard)
    granularity and converges to the clean-build state — same docids,
    same stats, same query results, manifest covering every shard."""
    pdf = _heterogeneous_input(n=30, seed=63)
    configs = _hetero_configs()
    sdf = spark.createDataFrame(pdf)

    clean_out = str(tmp_path_factory.mktemp("many_clean"))
    build_many(spark, sdf, clean_out, configs, index_col="ix")

    out = str(tmp_path_factory.mktemp("many_killed"))
    # "killed" run: only a subset of global shards got built+committed
    # (plain shards 0-1 of 3, routed shards 0-2 of 4, mf shard 0 of 2;
    # gshard layout is alphabetical: mf=[0,2), plain=[2,5), routed=[5,9))
    build_many(spark, sdf, out, configs, index_col="ix",
               _only_gshards=[0, 2, 3, 5, 6, 7])
    # partial state is visible but incomplete
    import pyarrow.dataset as ds
    man = ds.dataset(f"{out}/plain/manifest",
                     format="parquet").to_table().to_pylist()
    assert {r["shard"] for r in man} == {0, 1}

    sums = build_many(spark, sdf, out, configs, index_col="ix",
                      resume=True)
    for nm, cfg in configs.items():
        res = FTSIndex(spark, f"{out}/{nm}")
        ref = FTSIndex(spark, f"{clean_out}/{nm}")
        assert (res.N, res.avgdl, res.docs_per_shard, res.docid_span) \
            == (ref.N, ref.avgdl, ref.docs_per_shard, ref.docid_span), nm
        rd = (res._docstore.select("docid", "conv_id", "turn_idx")
              .toPandas().sort_values("docid").reset_index(drop=True))
        cd = (ref._docstore.select("docid", "conv_id", "turn_idx")
              .toPandas().sort_values("docid").reset_index(drop=True))
        assert rd.equals(cd), nm
        man = ds.dataset(f"{out}/{nm}/manifest",
                         format="parquet").to_table().to_pylist()
        assert {r["shard"] for r in man} == set(range(cfg.num_shards))
        kw = {"field": "text"} if cfg.fields else {}
        got = res.topk_pandas("alpha query index", k=10, **kw)
        want = ref.topk_pandas("alpha query index", k=10, **kw)
        assert got["docid"].tolist() == want["docid"].tolist(), nm
        assert got["score"].to_numpy() == pytest.approx(
            want["score"].to_numpy(), abs=1e-12), nm
        if cfg.routing_col:
            go = res.topk_pandas("alpha query", k=10, org="o0")
            wo = ref.topk_pandas("alpha query", k=10, org="o0")
            assert go["docid"].tolist() == wo["docid"].tolist()
    # resume with nothing to do is a no-op that leaves roots valid
    sums2 = build_many(spark, sdf, out, configs, index_col="ix",
                       resume=True)
    assert all(s["built_shards"] == [] for s in sums2.values())
    assert FTSIndex(spark, f"{out}/plain").N == sums["plain"]["n_docs"]


def test_build_many_zero_token_index_stays_readable(spark,
                                                    tmp_path_factory):
    """Code-review r4 #3: an index whose docs all tokenize to ZERO terms
    has docstore rows but no posting rows — the root must still get
    schema-bearing postings/term_stats dirs (readable, empty results),
    not a missing-path crash."""
    import pandas as pd
    pdf = make_transcripts(8, seed=44).assign(index="words")
    punct = pd.DataFrame({
        "conv_id": [f"p{i}" for i in range(4)],
        "turn_idx": [0] * 4,
        "role": ["user"] * 4,
        "ts": [0] * 4,
        "text": ["!!! ???", "...", "—–", "¡¿"],
        "index": ["punct"] * 4,
    })
    pdf = pd.concat([pdf, punct[pdf.columns.intersection(punct.columns)]],
                    ignore_index=True)
    out = str(tmp_path_factory.mktemp("many_punct"))
    sums = build_many(
        spark, spark.createDataFrame(pdf[["conv_id", "turn_idx", "text",
                                          "index"]]), out,
        {"words": BuildConfig(num_shards=2, partitions=2),
         "punct": BuildConfig(num_shards=2, partitions=2)},
        index_col="index")
    assert sums["punct"]["n_docs"] == 4
    idx = FTSIndex(spark, f"{out}/punct")
    assert idx.N == 4
    assert idx.topk_pandas("alpha", k=5).empty
    assert idx.topk_local("alpha", k=5).empty
    assert len(idx.fetch_docs_local([0, 1])) == 2   # docstore is real
    # sibling with real text unaffected
    assert not FTSIndex(spark, f"{out}/words").topk_pandas(
        "alpha", k=5).empty
