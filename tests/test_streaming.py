"""Incremental (streaming) indexing: foreachBatch delta mini-indexes +
CombinedIndex union-global BM25, rank-identical to a brute-force oracle
over the concatenated corpus — the 'query hits both the nightly rebuild
and the realtime index' semantics of the reference's lambda architecture
(README.md:3-13)."""
import numpy as np
import pytest

from sparkfts import BuildConfig, build_index
from sparkfts.fixtures import make_transcripts
from sparkfts.oracle import BM25Oracle
from sparkfts.streaming import (CombinedIndex, make_batch_indexer,
                                read_delta_log, start_stream_index)

CFG = BuildConfig(num_shards=2, partitions=2)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("base_idx"))
    base_pdf = make_transcripts(12, seed=42)
    b1 = make_transcripts(4, seed=101)
    b2 = make_transcripts(3, seed=202)
    build_index(spark, spark.createDataFrame(base_pdf), root,
                order_cols=["conv_id", "turn_idx"], cfg=CFG)
    idxer = make_batch_indexer(root, cfg=CFG)
    idxer(spark.createDataFrame(b1), batch_id=0)
    idxer(spark.createDataFrame(b2), batch_id=1)

    union = (
        list(base_pdf.sort_values(["conv_id", "turn_idx"])["text"])
        + list(b1.sort_values(["conv_id", "turn_idx"])["text"])
        + list(b2.sort_values(["conv_id", "turn_idx"])["text"]))
    import pandas as pd
    oracle = BM25Oracle(np.arange(len(union), dtype=np.int64),
                        pd.Series(union))
    return root, oracle


def test_delta_log_and_offsets(spark, setup):
    root, _ = setup
    log = read_delta_log(root)
    assert [e["batch_id"] for e in log] == [0, 1]
    assert log[1]["docid_offset"] == log[0]["docid_offset"] + log[0]["n_docs"]


def test_batch_indexer_idempotent(spark, setup):
    root, _ = setup
    idxer = make_batch_indexer(root, cfg=CFG)
    before = read_delta_log(root)
    idxer(spark.createDataFrame(make_transcripts(4, seed=101)), batch_id=0)
    assert read_delta_log(root) == before  # retry skipped


@pytest.mark.parametrize("q,mode", [
    ("alpha query index", "or"),
    ("shard merge", "and"),
    ("checkpoint resume committed", "and"),
    ("alpha", "or"),
])
def test_combined_topk_matches_union_oracle(spark, setup, q, mode):
    root, oracle = setup
    ci = CombinedIndex(spark, root)
    assert ci.N == oracle.N
    got = ci.topk(q, k=10, mode=mode)
    want = oracle.topk(q, k=10, mode=mode)
    assert got["docid"].tolist() == want["docid"].tolist(), (q, mode)
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-9)


def test_streaming_api_end_to_end(spark, setup, tmp_path_factory):
    """Drive the actual writeStream path with a file source."""
    root, _ = setup
    srcdir = str(tmp_path_factory.mktemp("stream_src"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    pdf = make_transcripts(3, seed=303)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(srcdir)
    stream = (spark.readStream.schema(
        spark.read.parquet(srcdir).schema).parquet(srcdir))
    n_before = len(read_delta_log(root))
    q = start_stream_index(stream, root, ckpt, cfg=CFG, trigger_once=True)
    q.awaitTermination(120)
    log = read_delta_log(root)
    assert len(log) == n_before + 1
    assert log[-1]["n_docs"] == len(pdf)
    ci = CombinedIndex(spark, root)
    assert ci.N == sum(s.N for s in ci.subs)
