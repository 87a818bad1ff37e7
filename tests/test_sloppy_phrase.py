"""Sloppy phrase queries (the ES match_phrase ``slop`` / Lucene
SloppyPhraseQuery window).

Contract under test (public Lucene semantics; the reference's
restored cluster serves match_phrase via BaseESReducer.java:154):
- phrase_topk(slop=s) matches a doc iff one position can be chosen
  per phrase slot with max(pos_i − i) − min(pos_i − i) ≤ s (distinct
  positions); slop=0 is exact adjacency, a transposition costs 2.
- Scoring keeps the engine's phrase contract: BM25 over the phrase's
  distinct terms, global stats — sloppiness changes MEMBERSHIP only.
- Distributed == local == CombinedIndex (with tombstones); org and
  filter compose; repeated phrase terms with slop > 0 raise.
"""
from itertools import product

import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import tokenize_text
from sparkfts.fixtures import make_transcripts

SEED = 7523


@pytest.fixture(scope="module")
def corpus():
    return make_transcripts(35, seed=SEED)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    root = str(tmp_path_factory.mktemp("slop_idx"))
    build_index(spark, spark.createDataFrame(corpus), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=3, partitions=3))
    return FTSIndex(spark, root)


@pytest.fixture(scope="module")
def store(idx):
    return idx._docstore.toPandas()


def _doc_matches(tokens: list[str], phrase: list[str],
                 slop: int) -> bool:
    pos = {t: [i for i, x in enumerate(tokens) if x == t]
           for t in set(phrase)}
    if any(not pos[t] for t in phrase):
        return False
    for choice in product(*[pos[t] for t in phrase]):
        if len(set(choice)) != len(choice):
            continue
        sh = [p - i for i, p in enumerate(choice)]
        if max(sh) - min(sh) <= slop:
            return True
    return False


def _expected(idx, store, query: str, slop: int, k: int):
    """Brute oracle: positional scan of every doc + the engine's
    phrase score (BM25 over the phrase's distinct terms == the AND
    exact ranking restricted to sloppy matches)."""
    phrase = tokenize_text(query, idx.tokenizer)
    toks = store["text"].map(
        lambda t: tokenize_text(t, idx.tokenizer))
    hit = {int(d) for d, tl in zip(store["docid"], toks)
           if _doc_matches(tl, phrase, slop)}
    scored = idx.topk_pandas(" ".join(sorted(set(phrase))),
                             k=10 ** 9, mode="and", method="exact")
    return (scored[scored["docid"].isin(hit)].head(k)
            .reset_index(drop=True)), hit


def _check(got, want, msg=""):
    assert got["docid"].tolist() == want["docid"].tolist(), msg
    np.testing.assert_allclose(got["score"], want["score"],
                               rtol=0, atol=1e-9, err_msg=msg)


def test_slop0_equals_exact_phrase(idx):
    q = "nightly index snapshot"
    exact = idx.phrase_topk_local(q, k=20)
    got = idx.phrase_topk_local(q, k=20, slop=0)
    _check(got, exact)
    dist = idx.phrase_topk(q, k=20, slop=0).toPandas()
    _check(dist, exact)


@pytest.mark.parametrize("q,slop", [
    ("rebuild nightly", 1),       # one inserted token ('the')
    ("rebuild nightly", 2),
    ("please the index", 3),      # two gaps across the shared phrase
    ("alpha bravo", 1),           # hot Zipf pair — many candidates
])
def test_sloppy_matches_brute_oracle(idx, store, q, slop):
    want, hit = _expected(idx, store, q, slop, 15)
    assert hit                       # fixture sanity: non-trivial
    got = idx.phrase_topk(q, k=15, slop=slop).toPandas()
    _check(got, want, f"dist {q}/{slop}")
    loc = idx.phrase_topk_local(q, k=15, slop=slop)
    _check(loc, want, f"local {q}/{slop}")


def test_slop_widens_membership_monotonically(idx, store):
    q = "rebuild nightly"
    sets = []
    for s in (0, 1, 3):
        _, hit = _expected(idx, store, q, s, 10)
        got = idx.phrase_topk_local(q, k=10 ** 9, slop=s)
        assert set(got["docid"]) == hit
        sets.append(hit)
    assert sets[0] <= sets[1] <= sets[2]
    assert sets[0] < sets[1]         # 'rebuild the nightly' gap


def test_transposition_costs_two(idx, store):
    """'index nightly' against docs containing 'nightly index': no
    match at slop 1, match at slop 2 (Lucene's accounting)."""
    q = "index nightly"
    _, hit1 = _expected(idx, store, q, 1, 10)
    _, hit2 = _expected(idx, store, q, 2, 10)
    got1 = set(idx.phrase_topk_local(q, k=10 ** 9, slop=1)["docid"])
    got2 = set(idx.phrase_topk_local(q, k=10 ** 9, slop=2)["docid"])
    assert got1 == hit1 and got2 == hit2
    assert hit2 - hit1               # transposed-only docs exist


def test_slop_composes_with_filter_and_errors(idx, store):
    q, slop = "rebuild nightly", 2
    want, _ = _expected(idx, store, q, slop, 10)
    keep = set(store.loc[store["role"] == "user", "docid"])
    want = (want[want["docid"].isin(keep)]
            .reset_index(drop=True))
    got = idx.phrase_topk(q, k=10, slop=slop,
                          filter="role = 'user'").toPandas()
    _check(got, want)
    with pytest.raises(ValueError, match="slop"):
        idx.phrase_topk_local(q, slop=-1)
    with pytest.raises(ValueError, match="repeated"):
        idx.phrase_topk_local("alpha alpha", slop=1)
    # slop=0 keeps repeats legal (exact adjacency)
    idx.phrase_topk_local("alpha alpha", slop=0)


@pytest.mark.slow
def test_combined_sloppy_with_tombstones(spark, tmp_path_factory):
    import glob as _glob
    import os as _os
    from sparkfts.streaming import (CombinedIndex, make_batch_indexer,
                                    _tombstone_dir)
    cfg = BuildConfig(num_shards=2, partitions=2)
    root = str(tmp_path_factory.mktemp("slop_comb"))
    build_index(spark,
                spark.createDataFrame(make_transcripts(14, seed=SEED)),
                root, order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(make_transcripts(5, seed=SEED + 1)),
            batch_id=0)
    ci = CombinedIndex(spark, root)
    try:
        q, slop = "rebuild nightly", 2
        store = pd.concat([s._docstore.toPandas() for s in ci.subs],
                          ignore_index=True)
        phrase = tokenize_text(q, ci.tokenizer)
        toks = store["text"].map(
            lambda t: tokenize_text(t, ci.tokenizer))
        hit = {int(d) for d, tl in zip(store["docid"], toks)
               if _doc_matches(tl, phrase, slop)}
        assert hit
        victims = sorted(hit)[:2]
        ci.delete_docs(victims)
        hit -= set(victims)
        scored = ci.topk(" ".join(sorted(set(phrase))), k=10 ** 9,
                         mode="and", method="exact")
        want = (scored[scored["docid"].isin(hit)].head(10)
                .reset_index(drop=True))
        got = ci.phrase_topk(q, k=10, slop=slop)
        _check(got, want, "combined dist")
        loc = ci.phrase_topk_local(q, k=10, slop=slop)
        _check(loc, want, "combined local")
    finally:
        for f in _glob.glob(_os.path.join(_tombstone_dir(ci.base_root),
                                          "*")):
            _os.remove(f)
