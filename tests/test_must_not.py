"""bool.must_not negative terms (the ES bool-query negation leg).

Contract under test (reference: the restored ES 1.x cluster serves
bool queries via BaseESReducer.java:154 delegation; must_not is
public Lucene BooleanClause.Occur.MUST_NOT semantics):
- topk(must_not=) equals the UNRESTRICTED ranking minus docs
  containing ANY negated term — pure exclusion, survivor scores
  unchanged (negative terms contribute nothing).
- Holds on every kernel branch: or/and, wand/exact, filter=, org=,
  after= cursors, min_should_match, local twins, CombinedIndex with
  tombstones (negation and deletes share the in-kernel excl array).
- Pure negation (no positive query) raises — that is a docstore
  predicate, not a dictionary query.
"""
import glob
import os

import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import tokenize_text
from sparkfts.fixtures import make_transcripts

SEED = 4242


@pytest.fixture(scope="module")
def corpus():
    return make_transcripts(40, seed=SEED)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    root = str(tmp_path_factory.mktemp("mn_idx"))
    build_index(spark, spark.createDataFrame(corpus), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=3, partitions=3))
    return FTSIndex(spark, root)


@pytest.fixture(scope="module")
def store(idx):
    return idx._docstore.toPandas()


def _docs_with_any(idx, store, neg_query):
    """Docids whose analyzed text contains ANY negated term —
    recomputed from the doc store, independent of the postings."""
    negs = set(tokenize_text(neg_query, idx.tokenizer))
    toks = store["text"].map(
        lambda t: set(tokenize_text(t, idx.tokenizer)))
    return set(store.loc[toks.map(lambda s: bool(s & negs)), "docid"])


def _expected(idx, store, query, neg_query, k, mode, **kw):
    """Unrestricted exact ranking minus neg-term docs, head(k)."""
    full = idx.topk_pandas(query, k=10 ** 9, mode=mode,
                           method="exact", **kw)
    bad = _docs_with_any(idx, store, neg_query)
    out = full[~full["docid"].isin(bad)].head(k)
    return out.reset_index(drop=True)


def _check(got, want, msg=""):
    assert got["docid"].tolist() == want["docid"].tolist(), msg
    np.testing.assert_allclose(got["score"], want["score"],
                               rtol=0, atol=1e-9, err_msg=msg)


QUERY = "alpha query index"
NEG = "batch"


@pytest.mark.parametrize("mode", ["or", "and"])
@pytest.mark.parametrize("method", ["wand", "exact"])
def test_topk_must_not_is_pure_exclusion(idx, store, mode, method):
    want = _expected(idx, store, QUERY, NEG, 8, mode)
    got = idx.topk_pandas(QUERY, k=8, mode=mode, method=method,
                          must_not=NEG)
    _check(got, want, f"{mode}/{method}")
    loc = idx.topk_local(QUERY, k=8, mode=mode, method=method,
                         must_not=NEG)
    _check(loc, want, f"local {mode}/{method}")


def test_must_not_multiple_terms_and_absent_term(idx, store):
    neg = "batch zzzznothere window"
    want = _expected(idx, store, QUERY, neg, 8, "or")
    _check(idx.topk_pandas(QUERY, k=8, must_not=neg), want)
    _check(idx.topk_local(QUERY, k=8, must_not=neg), want)


def test_must_not_composes_with_filter(idx, store):
    keep = set(store.loc[store["role"] == "user", "docid"])
    full = idx.topk_pandas(QUERY, k=10 ** 9, method="exact")
    bad = _docs_with_any(idx, store, NEG)
    want = (full[full["docid"].isin(keep - bad)].head(6)
            .reset_index(drop=True))
    got = idx.topk_pandas(QUERY, k=6, filter="role = 'user'",
                          must_not=NEG)
    _check(got, want)


def test_must_not_composes_with_cursor_and_msm(idx, store):
    want = _expected(idx, store, QUERY, NEG, 20, "or")
    p1 = idx.topk_pandas(QUERY, k=10, must_not=NEG)
    cur = (float(p1["score"].iloc[-1]), int(p1["docid"].iloc[-1]))
    p2 = idx.topk_pandas(QUERY, k=10, must_not=NEG, after=cur)
    _check(pd.concat([p1, p2], ignore_index=True), want, "paged")
    # min_should_match: exclusion applies after the hit-count floor
    full = idx.topk_pandas(QUERY, k=10 ** 9, method="exact",
                           min_should_match=2)
    bad = _docs_with_any(idx, store, NEG)
    want2 = (full[~full["docid"].isin(bad)].head(8)
             .reset_index(drop=True))
    got2 = idx.topk_pandas(QUERY, k=8, min_should_match=2,
                           must_not=NEG)
    _check(got2, want2, "msm")


def test_must_not_term_also_positive(idx, store):
    """A term in both query and must_not: its docs are excluded and it
    contributes no score — survivors rank by the remaining terms."""
    q, neg = "alpha batch", "batch"
    bad = _docs_with_any(idx, store, neg)
    full = idx.topk_pandas("alpha", k=10 ** 9, method="exact")
    want = (full[~full["docid"].isin(bad)].head(8)
            .reset_index(drop=True))
    got = idx.topk_pandas(q, k=8, must_not=neg)
    # same docids and same scores as scoring 'alpha' alone: 'batch'
    # can only match excluded docs, so it never contributes
    _check(got, want)


def test_must_not_errors(idx):
    with pytest.raises(ValueError, match="positive query"):
        idx.topk_pandas("", k=5, must_not="batch")
    with pytest.raises(ValueError, match="zero terms"):
        idx.topk_pandas(QUERY, k=5, must_not="...")
    with pytest.raises(ValueError, match="positive query"):
        idx.topk_local("", k=5, must_not="batch")


def test_search_surfaces_forward(idx, store):
    want = _expected(idx, store, QUERY, NEG, 5, "or")
    s = idx.search(QUERY, k=5, must_not=NEG).toPandas()
    _check(s[["docid", "score"]], want)
    sl = idx.search_local(QUERY, k=5, must_not=NEG)
    _check(sl[["docid", "score"]], want)


@pytest.fixture(scope="module")
def routed(spark, tmp_path_factory, corpus):
    root = str(tmp_path_factory.mktemp("mn_routed"))
    pdf = corpus.assign(
        org=corpus["conv_id"].map(lambda c: f"o{sum(map(ord, c)) % 4}"))
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=4, partitions=4,
                                routing_col="org", shards_per_org=2))
    return FTSIndex(spark, root)


def test_must_not_composes_with_org(routed, corpus):
    store = routed._docstore.toPandas()
    org = store["org"].mode().iloc[0]
    keep = set(store.loc[store["org"] == org, "docid"])
    bad = _docs_with_any(routed, store, NEG)
    full = routed.topk_pandas(QUERY, k=10 ** 9, method="exact")
    want = (full[full["docid"].isin(keep - bad)].head(6)
            .reset_index(drop=True))
    got = routed.topk_pandas(QUERY, k=6, org=org, must_not=NEG)
    _check(got, want, "routed dist")
    loc = routed.topk_local(QUERY, k=6, org=org, must_not=NEG)
    _check(loc, want, "routed local")


def test_combined_must_not_with_tombstones(spark, tmp_path_factory):
    """Negation and deletes share the in-kernel excl array — both
    apply, per-group output stays ≤ k."""
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2)
    root = str(tmp_path_factory.mktemp("mn_comb"))
    base = make_transcripts(16, seed=SEED)
    delta = make_transcripts(5, seed=SEED + 1)
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(delta), batch_id=0)
    ci = CombinedIndex(spark, root)
    try:
        store = pd.concat([s._docstore.toPandas() for s in ci.subs])
        bad = _docs_with_any(ci.subs[0], store, NEG)
        full = ci.topk(QUERY, k=10 ** 9, method="exact")
        victims = [int(d) for d in full["docid"].head(2)]
        ci.delete_docs(victims)
        dead = bad | set(victims)
        want = (full[~full["docid"].isin(dead)].head(6)
                .reset_index(drop=True))
        got = ci.topk(QUERY, k=6, must_not=NEG)
        _check(got, want, "combined dist")
        loc = ci.topk_local(QUERY, k=6, must_not=NEG)
        _check(loc, want, "combined local")
        sl = ci.search_local(QUERY, k=6, must_not=NEG)
        _check(sl[["docid", "score"]], want, "combined search_local")
    finally:
        from sparkfts.streaming import _tombstone_dir
        for f in glob.glob(os.path.join(_tombstone_dir(ci.base_root),
                                        "*")):
            os.remove(f)
