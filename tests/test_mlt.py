"""more_like_this (the ES MLT query, 1.x interestingness ranking).

Contract under test (public ES DSL; the reference's restored cluster
serves MLT via BaseESReducer.java:154 delegation):
- mlt_terms(docid): terms of the source doc with tf >= min_term_freq
  and df >= min_doc_freq, ranked by tf·idf (BM25 idf), top
  max_query_terms by (weight desc, term asc) — deterministic.
- more_like_this(docid): the OR ranking of those terms (raw_terms
  path — global stats, WAND, msm compose) with the source doc
  excluded exactly (k+1 then drop).
- Distributed == local == CombinedIndex (union-global dfs).
"""
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import tokenize_text
from sparkfts.query import _bm25_idf
from sparkfts.fixtures import make_transcripts

SEED = 7613


@pytest.fixture(scope="module")
def corpus():
    return make_transcripts(30, seed=SEED)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    root = str(tmp_path_factory.mktemp("mlt_idx"))
    build_index(spark, spark.createDataFrame(corpus), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=3, partitions=3))
    return FTSIndex(spark, root)


@pytest.fixture(scope="module")
def store(idx):
    return idx._docstore.toPandas()


def _expected_terms(idx, store, docid, mqt=25, mtf=1, mdf=2):
    text = store.loc[store["docid"] == docid, "text"].iloc[0]
    tf = Counter(tokenize_text(text, idx.tokenizer))
    toks = store["text"].map(
        lambda t: set(tokenize_text(t, idx.tokenizer)))
    dfs = Counter(t for s in toks for t in s)
    scored = sorted(
        (-c * _bm25_idf(float(len(store)), float(dfs[t])), t)
        for t, c in tf.items() if c >= mtf and dfs[t] >= mdf)
    return [t for _, t in scored[:mqt]]


@pytest.fixture(scope="module")
def src_doc(store):
    # a mid-length doc so selection is non-trivial
    lens = store["text"].str.len()
    return int(store.loc[lens.sort_values().index[len(store) // 2],
                         "docid"])


def test_mlt_terms_match_recompute(idx, store, src_doc):
    got = idx.mlt_terms(src_doc, max_query_terms=10, min_doc_freq=2)
    want = _expected_terms(idx, store, src_doc, mqt=10)
    assert got == want
    assert 0 < len(got) <= 10


def test_mlt_min_doc_freq_and_cap(idx, store, src_doc):
    loose = idx.mlt_terms(src_doc, max_query_terms=1000,
                          min_doc_freq=1)
    tight = idx.mlt_terms(src_doc, max_query_terms=1000,
                          min_doc_freq=8)
    assert set(tight) <= set(loose)
    capped = idx.mlt_terms(src_doc, max_query_terms=3)
    assert len(capped) == 3
    assert capped == idx.mlt_terms(src_doc, max_query_terms=1000,
                                   min_doc_freq=2)[:3]


def test_more_like_this_is_raw_terms_or_minus_source(idx, src_doc):
    terms = idx.mlt_terms(src_doc, max_query_terms=10)
    full = (idx.topk("", k=10 ** 9, mode="or", method="exact",
                     raw_terms=terms).toPandas())
    want = (full[full["docid"] != src_doc].head(8)
            .reset_index(drop=True))
    got = idx.more_like_this(src_doc, k=8, max_query_terms=10)
    assert got["docid"].tolist() == want["docid"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], atol=1e-9)
    assert src_doc not in set(got["docid"])
    loc = idx.more_like_this(src_doc, k=8, max_query_terms=10,
                             local=True)
    assert loc["docid"].tolist() == want["docid"].tolist()


def test_more_like_this_composes(idx, store, src_doc):
    terms = idx.mlt_terms(src_doc, max_query_terms=10)
    full = (idx.topk("", k=10 ** 9, mode="or", method="exact",
                     raw_terms=terms, min_should_match=2).toPandas())
    keep = set(store.loc[store["role"] == "user", "docid"])
    want = (full[(full["docid"] != src_doc)
                 & full["docid"].isin(keep)].head(6)
            .reset_index(drop=True))
    got = idx.more_like_this(src_doc, k=6, max_query_terms=10,
                             min_should_match=2,
                             filter="role = 'user'")
    assert got["docid"].tolist() == want["docid"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], atol=1e-9)


def test_mlt_errors(idx):
    with pytest.raises(ValueError, match="not found"):
        idx.mlt_terms(10 ** 12)
    with pytest.raises(ValueError, match="local"):
        idx.more_like_this(0, filter="role = 'user'", local=True)


@pytest.mark.slow
def test_combined_mlt(spark, tmp_path_factory):
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2)
    root = str(tmp_path_factory.mktemp("mlt_comb"))
    build_index(spark,
                spark.createDataFrame(make_transcripts(12, seed=SEED)),
                root, order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(make_transcripts(4, seed=SEED + 1)),
            batch_id=0)
    ci = CombinedIndex(spark, root)
    store = pd.concat([s._docstore.toPandas() for s in ci.subs],
                      ignore_index=True)
    src = int(store["docid"].iloc[len(store) // 2])
    # recompute selection with union-global dfs
    text = store.loc[store["docid"] == src, "text"].iloc[0]
    tf = Counter(tokenize_text(text, ci.tokenizer))
    toks = store["text"].map(
        lambda t: set(tokenize_text(t, ci.tokenizer)))
    dfs = Counter(t for s in toks for t in s)
    want_terms = [t for _, t in sorted(
        (-c * _bm25_idf(float(len(store)), float(dfs[t])), t)
        for t, c in tf.items() if dfs[t] >= 2)][:10]
    got_terms = ci.mlt_terms(src, max_query_terms=10)
    assert got_terms == want_terms
    full = ci.topk("", k=10 ** 9, mode="or", method="exact",
                   raw_terms=got_terms)
    want = (full[full["docid"] != src].head(6)
            .reset_index(drop=True))
    got = ci.more_like_this(src, k=6, max_query_terms=10)
    assert got["docid"].tolist() == want["docid"].tolist()
    loc = ci.more_like_this(src, k=6, max_query_terms=10, local=True)
    assert loc["docid"].tolist() == want["docid"].tolist()
