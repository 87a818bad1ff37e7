"""Histogram + date_histogram aggregations (the ES histogram /
date_histogram bucket aggs under a bool query).

Contract under test (public ES DSL; reference serves aggregations via
the restored cluster, BaseESReducer.java:154 delegation):
- facet_histogram: bucket = floor(on / interval) · interval over
  matching docs; (bucket, doc_count) key-ASC (the ES histogram
  order); min_doc_count=0 (ES default) emits EMPTY buckets between
  the min and max occupied bucket; higher floors drop buckets.
- facet_date_histogram: calendar date_trunc buckets, same shape.
- NULL metric/timestamp values are uncounted.
- Composes with mode/filter/org; CombinedIndex twin is union-global
  and honors tombstones.
"""
import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import tokenize_text
from sparkfts.fixtures import make_transcripts

SEED = 7411


@pytest.fixture(scope="module")
def corpus():
    return make_transcripts(30, seed=SEED)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    root = str(tmp_path_factory.mktemp("hist_idx"))
    build_index(spark, spark.createDataFrame(corpus), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=3, partitions=3))
    return FTSIndex(spark, root)


@pytest.fixture(scope="module")
def store(idx):
    return idx._docstore.toPandas()


def _matching(idx, store, query, mode="and"):
    terms = set(tokenize_text(query, idx.tokenizer))
    toks = store["text"].map(
        lambda t: set(tokenize_text(t, idx.tokenizer)))
    if mode == "and":
        m = toks.map(lambda s: terms <= s)
    else:
        m = toks.map(lambda s: bool(s & terms))
    return store[m.values]


def _hist_expected(vals, interval, min_doc_count=0):
    idxs = np.floor(np.asarray(vals, dtype=float) / interval)
    idxs = idxs[~np.isnan(idxs)].astype(np.int64)
    cnt = pd.Series(idxs).value_counts().sort_index()
    if min_doc_count > 0:
        cnt = cnt[cnt >= min_doc_count]
    else:
        full = pd.RangeIndex(cnt.index.min(), cnt.index.max() + 1)
        cnt = cnt.reindex(full, fill_value=0)
    return pd.DataFrame({"bucket": cnt.index.to_numpy() * interval,
                         "doc_count": cnt.to_numpy()})


def test_histogram_matches_recount(idx, store):
    q = "alpha bravo"
    m = _matching(idx, store, q, "and")
    want = _hist_expected(m["turn_idx"], 5.0)
    got = idx.facet_histogram(q, on="turn_idx", interval=5,
                              mode="and").toPandas()
    pd.testing.assert_frame_equal(
        got.astype({"bucket": float, "doc_count": "int64"}),
        want.astype({"bucket": float, "doc_count": "int64"}))


def test_histogram_gap_fill_and_floor(idx, store):
    """A rare query leaves empty turn_idx buckets: min_doc_count=0
    emits them with 0; min_doc_count=1 drops them."""
    q = "embedded"
    m = _matching(idx, store, q, "or")
    want0 = _hist_expected(m["turn_idx"], 3.0, 0)
    got0 = idx.facet_histogram(q, on="turn_idx", interval=3,
                               mode="or").toPandas()
    pd.testing.assert_frame_equal(
        got0.astype({"bucket": float, "doc_count": "int64"}), want0)
    assert (got0["doc_count"] == 0).any()   # fixture sanity: gaps
    want1 = _hist_expected(m["turn_idx"], 3.0, 1)
    got1 = idx.facet_histogram(q, on="turn_idx", interval=3,
                               mode="or", min_doc_count=1).toPandas()
    pd.testing.assert_frame_equal(
        got1.astype({"bucket": float, "doc_count": "int64"}),
        want1.reset_index(drop=True))


def test_histogram_expression_negative_and_null(idx, store):
    """SQL-expression metric, negative buckets, NULLs uncounted."""
    q = "alpha"
    m = _matching(idx, store, q, "or")
    vals = m["turn_idx"].astype(float) - 10.0
    vals = vals.where(m["turn_idx"] != 0, np.nan)   # nullif(ti, 0)
    want = _hist_expected(vals.dropna(), 7.0)
    got = idx.facet_histogram(
        q, on="CAST(nullif(turn_idx, 0) AS DOUBLE) - 10.0",
        interval=7, mode="or").toPandas()
    pd.testing.assert_frame_equal(
        got.astype({"bucket": float, "doc_count": "int64"}), want)
    assert (got["bucket"] < 0).any()


def test_histogram_composes_with_filter(idx, store):
    q = "alpha bravo"
    m = _matching(idx, store, q, "and")
    m = m[m["role"] == "user"]
    want = _hist_expected(m["turn_idx"], 5.0)
    got = idx.facet_histogram(q, on="turn_idx", interval=5,
                              mode="and",
                              filter="role = 'user'").toPandas()
    pd.testing.assert_frame_equal(
        got.astype({"bucket": float, "doc_count": "int64"}), want)


def _dh_expected(ts, interval, min_doc_count=0):
    b = pd.Series(pd.to_datetime(ts)).dt.floor(
        {"day": "D", "hour": "h"}[interval]) \
        if interval in ("day", "hour") else None
    cnt = b.value_counts().sort_index()
    if min_doc_count > 0:
        cnt = cnt[cnt >= min_doc_count]
    else:
        step = {"day": "D", "hour": "h"}[interval]
        full = pd.date_range(cnt.index.min(), cnt.index.max(),
                             freq=step)
        cnt = cnt.reindex(full, fill_value=0)
    return pd.DataFrame({"bucket": cnt.index.to_numpy(),
                         "doc_count": cnt.to_numpy()})


@pytest.mark.parametrize("interval", ["hour", "day"])
def test_date_histogram_matches_recount(idx, store, interval):
    q = "alpha"
    m = _matching(idx, store, q, "or")
    want = _dh_expected(m["ts"], interval)
    got = idx.facet_date_histogram(q, on="ts", interval=interval,
                                   mode="or").toPandas()
    pd.testing.assert_frame_equal(
        got.astype({"doc_count": "int64"}), want)


def test_date_histogram_min_doc_count(idx, store):
    q = "embedded"
    m = _matching(idx, store, q, "or")
    want = _dh_expected(m["ts"], "hour", 1)
    got = idx.facet_date_histogram(q, on="ts", interval="hour",
                                   mode="or",
                                   min_doc_count=1).toPandas()
    pd.testing.assert_frame_equal(
        got.astype({"doc_count": "int64"}),
        want.reset_index(drop=True))
    # and the gap-filled twin really has empty hours for a rare term
    got0 = idx.facet_date_histogram(q, on="ts", interval="hour",
                                    mode="or").toPandas()
    assert (got0["doc_count"] == 0).any()


def test_histogram_errors(idx):
    with pytest.raises(ValueError, match="interval"):
        idx.facet_histogram("alpha", on="turn_idx", interval=0)
    with pytest.raises(ValueError, match="interval"):
        idx.facet_date_histogram("alpha", on="ts",
                                 interval="fortnight")


@pytest.mark.slow
def test_combined_histograms_with_tombstones(spark, tmp_path_factory):
    """CombinedIndex twins: union-global counts across base + delta,
    deleted docs leave every bucket."""
    import glob as _glob
    import os as _os
    from sparkfts.streaming import (CombinedIndex, make_batch_indexer,
                                    _tombstone_dir)
    cfg = BuildConfig(num_shards=2, partitions=2)
    root = str(tmp_path_factory.mktemp("hist_comb"))
    base = make_transcripts(12, seed=SEED)
    delta = make_transcripts(4, seed=SEED + 1)
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(delta), batch_id=0)
    ci = CombinedIndex(spark, root)
    try:
        store = pd.concat([s._docstore.toPandas() for s in ci.subs],
                          ignore_index=True)
        terms = {"alpha"}
        toks = store["text"].map(
            lambda t: set(tokenize_text(t, ci.tokenizer)))
        m = store[toks.map(lambda s: bool(s & terms)).values]
        victims = m["docid"].head(3).astype(int).tolist()
        ci.delete_docs(victims)
        m = m[~m["docid"].isin(victims)]
        want_h = _hist_expected(m["turn_idx"], 4.0)
        got_h = ci.facet_histogram("alpha", on="turn_idx", interval=4,
                                   mode="or").toPandas()
        pd.testing.assert_frame_equal(
            got_h.astype({"bucket": float, "doc_count": "int64"}),
            want_h)
        want_d = _dh_expected(m["ts"], "day")
        got_d = ci.facet_date_histogram("alpha", on="ts",
                                        interval="day",
                                        mode="or").toPandas()
        pd.testing.assert_frame_equal(
            got_d.astype({"doc_count": "int64"}), want_d)
    finally:
        for f in _glob.glob(_os.path.join(_tombstone_dir(ci.base_root),
                                          "*")):
            _os.remove(f)
