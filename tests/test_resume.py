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
    # derived stats identical
    sc = spark.read.parquet(clean + "/stats").toPandas()
    sp = spark.read.parquet(partial + "/stats").toPandas()
    assert sc["n"].iloc[0] == sp["n"].iloc[0]
    assert sc["avgdl"].iloc[0] == pytest.approx(sp["avgdl"].iloc[0])


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
