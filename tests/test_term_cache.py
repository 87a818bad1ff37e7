"""Serving-path term-row LRU (VERDICT r3 next #8): repeated queries on
one FTSIndex handle skip the dictionary parquet read; results stay
bit-identical, including under eviction and overlapping term sets."""
import time

import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.fixtures import make_transcripts


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cache_idx"))
    pdf = make_transcripts(40, seed=81)
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=4, partitions=4))
    return root


def test_repeated_query_hits_cache_and_is_faster(spark, built):
    idx = FTSIndex(spark, built)
    q = "alpha query index checkpoint"
    cold_t0 = time.perf_counter()
    cold = idx.topk_local(q, k=10)
    cold_dt = time.perf_counter() - cold_t0
    warm_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        warm = idx.topk_local(q, k=10)
        warm_dt = min(warm_dt, time.perf_counter() - t0)
    assert warm["docid"].tolist() == cold["docid"].tolist()
    assert warm["score"].to_numpy() == pytest.approx(
        cold["score"].to_numpy(), abs=0.0)
    assert warm_dt * 5 <= cold_dt, (cold_dt, warm_dt)


def test_cache_parity_overlap_eviction_and_negative(spark, built):
    """Interleaved overlapping queries, an absent term (negative cache
    entry), and a cap-forced eviction must all stay rank-identical to a
    fresh cacheless handle."""
    idx = FTSIndex(spark, built)
    idx.TERM_CACHE_CAP = 3   # force eviction churn
    queries = [("alpha query", "or"), ("query index nightly", "or"),
               ("alpha nonexistentterm", "or"), ("shard merge", "and"),
               ("alpha query", "or"), ("query index nightly", "and")]
    for i, (q, mode) in enumerate(queries):
        fresh = FTSIndex(spark, built)
        got = idx.topk_local(q, k=10, mode=mode)
        want = fresh.topk_local(q, k=10, mode=mode)
        assert got["docid"].tolist() == want["docid"].tolist(), (i, q)
        assert got["score"].to_numpy() == pytest.approx(
            want["score"].to_numpy(), abs=0.0), (i, q)
    assert len(idx._term_cache) <= 3


def test_cache_serves_match_and_phrase_surfaces(spark, built):
    """All *_local surfaces share _local_term_rows — spot-check the
    boolean-match and search paths against a fresh handle."""
    idx = FTSIndex(spark, built)
    idx.topk_local("alpha query index", k=10)    # warm some entries
    fresh = FTSIndex(spark, built)
    g = idx.search_local("alpha query index", k=5)
    w = fresh.search_local("alpha query index", k=5)
    assert g["docid"].tolist() == w["docid"].tolist()


def test_query_wider_than_cache_cap(spark, built):
    """Code-review r4 #1/#2: a query with more unique terms than
    TERM_CACHE_CAP must not evict its own entries mid-call (KeyError),
    drop terms from the returned rows, or poison the decoded cache with
    false term-absent entries."""
    idx = FTSIndex(spark, built)
    idx.TERM_CACHE_CAP = 2
    fresh = FTSIndex(spark, built)
    wide = "alpha query index nightly shard merge checkpoint resume"
    got = idx.topk_local(wide, k=10)                 # 8 uniques > cap 2
    want = fresh.topk_local(wide, k=10)
    assert got["docid"].tolist() == want["docid"].tolist()
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=0.0)
    # cache shrank back after the call (overshoot was temporary)
    assert len(idx._dec_cache) <= 8
    # no poisoned negative entries: a narrow follow-up query still
    # sees the terms the wide query should have cached or evicted
    g2 = idx.topk_local("alpha query", k=10)
    w2 = fresh.topk_local("alpha query", k=10)
    assert g2["docid"].tolist() == w2["docid"].tolist()
    # org-path raw-frame read with the same tiny cap (AND semantics
    # depend on every term's rows being present)
    m = idx.match_docids(wide, "or").toPandas()
    wm = fresh.match_docids(wide, "or").toPandas()
    assert m["docid"].tolist() == wm["docid"].tolist()


def test_byte_cap_evicts(spark, built):
    """The bytes cap binds independently of the entry cap."""
    idx = FTSIndex(spark, built)
    idx.TERM_CACHE_BYTES = 1   # everything over budget
    idx.topk_local("alpha query index", k=5)
    idx.topk_local("shard merge", k=5)
    # later call's terms survive (protected), earlier ones evicted
    assert set(idx._dec_cache) <= {"shard", "merge"}
    fresh = FTSIndex(spark, built)
    got = idx.topk_local("alpha query index", k=5)
    want = fresh.topk_local("alpha query index", k=5)
    assert got["docid"].tolist() == want["docid"].tolist()
