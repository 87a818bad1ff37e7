"""Checkpoint-resume at shard granularity (SURVEY.md §5 plan #4, mirroring
the reference's manifest merge + missing-shard repair,
IndexingPostProcessor.java:57-108): a partial (killed) build followed by
resume must converge to exactly the same index as a clean full build."""
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.fixtures import make_transcripts

CFG = BuildConfig(num_shards=4, partitions=4)


def _postings_content(spark, root):
    pdf = (spark.read.parquet(root + "/postings")
           .select("shard", "term", "chunk", "df", "cf", "blob")
           .toPandas())
    pdf["blob"] = pdf["blob"].map(bytes)
    return (pdf.sort_values(["shard", "term", "chunk"])
               .reset_index(drop=True).astype({"shard": "int64"}))


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(make_transcripts(30, seed=42))


def test_partial_then_resume_equals_clean_build(spark, sdf, tmp_path_factory):
    clean = str(tmp_path_factory.mktemp("clean"))
    partial = str(tmp_path_factory.mktemp("partial"))
    build_index(spark, sdf, clean, order_cols=["conv_id", "turn_idx"], cfg=CFG)

    # simulated kill: only shards 0 and 2 get built + committed
    build_index(spark, sdf, partial, order_cols=["conv_id", "turn_idx"],
                cfg=CFG, _only_shards=[0, 2])
    man = spark.read.parquet(partial + "/manifest").toPandas()
    assert sorted(man["shard"]) == [0, 2]

    # resume rebuilds exactly the gap
    summary = build_index(spark, sdf, partial,
                          order_cols=["conv_id", "turn_idx"],
                          cfg=CFG, resume=True)
    assert summary["built_shards"] == [1, 3]

    pd.testing.assert_frame_equal(_postings_content(spark, clean),
                                  _postings_content(spark, partial))
    # manifest complete: every shard committed exactly once
    man = spark.read.parquet(partial + "/manifest").toPandas()
    assert sorted(man["shard"].tolist()) == [0, 1, 2, 3]
    assert (man["status"] == "committed").all()
    # derived stats identical (read_stats picks the latest seq row)
    from sparkfts import storage
    sc = storage.read_stats(clean)
    sp = storage.read_stats(partial)
    assert sc["n"] == sp["n"]
    assert sc["avgdl"] == pytest.approx(sp["avgdl"])


def test_resume_on_complete_index_is_noop(spark, sdf, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("full"))
    build_index(spark, sdf, root, order_cols=["conv_id", "turn_idx"], cfg=CFG)
    before = _postings_content(spark, root)
    summary = build_index(spark, sdf, root,
                          order_cols=["conv_id", "turn_idx"],
                          cfg=CFG, resume=True)
    assert summary["built_shards"] == []
    pd.testing.assert_frame_equal(before, _postings_content(spark, root))


def test_empty_shard_placeholder(spark, tmp_path_factory):
    """Fewer docs than shards → trailing shards are empty but still get
    committed manifest rows (the empty-placeholder analog,
    IndexingPostProcessor.java:80-108)."""
    root = str(tmp_path_factory.mktemp("tiny"))
    pdf = make_transcripts(1, seed=7).head(3)
    sdf = spark.createDataFrame(pdf)
    build_index(spark, sdf, root, order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=6, partitions=2))
    man = spark.read.parquet(root + "/manifest").toPandas()
    assert sorted(man["shard"].tolist()) == list(range(6))
    assert (man[man["n_terms"] == 0]["n_postings"] == 0).all()
    idx = FTSIndex(spark, root)
    got = idx.topk_pandas(pdf["text"].iloc[0].split()[0], k=5)
    assert len(got) >= 1


def test_crash_between_data_write_and_manifest_commit(spark, sdf,
                                                      tmp_path_factory):
    """ADVICE r01 (high): a build killed AFTER writing a shard's
    docstore/postings but BEFORE its manifest commit must not duplicate
    that shard's rows on resume. Simulated by building shards [0,1] and
    then rolling the manifest back to only shard 0 — resume must rebuild
    shard 1 via dynamic partition OVERWRITE, converging to the clean
    index (no doubled docstore rows, no doubled BM25 contributions)."""
    import os
    import pyarrow.parquet as pq
    from sparkfts import storage

    clean = str(tmp_path_factory.mktemp("clean2"))
    crash = str(tmp_path_factory.mktemp("crash"))
    build_index(spark, sdf, clean, order_cols=["conv_id", "turn_idx"],
                cfg=CFG)
    build_index(spark, sdf, crash, order_cols=["conv_id", "turn_idx"],
                cfg=CFG, _only_shards=[0, 1])
    # roll the manifest back: keep only shard 0's committed row
    mdir = crash + "/manifest"
    tbl = None
    for fn in os.listdir(mdir):
        if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
            t = pq.read_table(os.path.join(mdir, fn))
            tbl = t if tbl is None else None
            os.remove(os.path.join(mdir, fn))
    rows = [r for r in tbl.to_pylist() if r["shard"] == 0]
    storage.append_manifest_rows(crash, rows, rows[0]["build_id"])
    assert storage.committed_shards(spark, crash) == {0}

    summary = build_index(spark, sdf, crash,
                          order_cols=["conv_id", "turn_idx"],
                          cfg=CFG, resume=True)
    assert summary["built_shards"] == [1, 2, 3]
    pd.testing.assert_frame_equal(_postings_content(spark, clean),
                                  _postings_content(spark, crash))
    dc = spark.read.parquet(clean + "/docstore")
    dp = spark.read.parquet(crash + "/docstore")
    assert dc.count() == dp.count()
    assert dp.select("docid").distinct().count() == dp.count()


def test_grouped_fastpath_falls_back_above_conv_bound(spark,
                                                      tmp_path_factory):
    """VERDICT r01 #5: the grouped docid path must not collect unbounded
    conversations to the driver — above grouped_max_convs it falls back
    to the distributed rank path and produces the identical index."""
    from sparkfts.build import assign_docids_grouped
    pdf = make_transcripts(12, seed=3)
    sdf2 = spark.createDataFrame(pdf)
    assert assign_docids_grouped(sdf2, "conv_id", "turn_idx",
                                 max_convs=5) is None
    ra = str(tmp_path_factory.mktemp("ra"))
    rb = str(tmp_path_factory.mktemp("rb"))
    build_index(spark, sdf2, ra, order_cols=["conv_id", "turn_idx"],
                cfg=CFG)
    build_index(spark, sdf2, rb, order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=4, partitions=4,
                                grouped_max_convs=5))
    pd.testing.assert_frame_equal(_postings_content(spark, ra),
                                  _postings_content(spark, rb))


def test_duplicate_turn_idx_fails_loudly(spark, tmp_path_factory):
    """ADVICE r01 (medium): per-conv turn_idx like [0,2,2,3] passes the
    min/max/count density check but is not a permutation — duplicate
    docids must be caught (an exact countDistinct precheck costs a 2x
    expand of the sizes agg, so the guard lives in the shard kernel and
    fails the build loudly instead of silently merging postings)."""
    import pandas as pd_
    pdf = pd_.DataFrame({
        "conv_id": ["c1"] * 4, "turn_idx": [0, 2, 2, 3],
        "role": ["user"] * 4, "text": ["a b", "c d", "e f", "g h"],
        "tool": [""] * 4,
        "ts": pd_.to_datetime(["2026-01-01"] * 4)})
    sdf2 = spark.createDataFrame(pdf)
    root = str(tmp_path_factory.mktemp("dupturn"))
    with pytest.raises(Exception, match="duplicate docids"):
        build_index(spark, sdf2, root, order_cols=["conv_id", "turn_idx"],
                    cfg=BuildConfig(num_shards=2, partitions=2))
