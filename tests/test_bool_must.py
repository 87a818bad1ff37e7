"""Lucene bool must+should queries (the ES bool query's must leg
composed with scored should terms).

Contract under test (reference: the restored ES 1.x cluster serves
bool queries via BaseESReducer.java:154 delegation; must+should is
public Lucene BooleanClause.Occur.MUST/SHOULD semantics):
- topk(query, must=) keeps only docs matching ALL must terms; scores
  sum over EVERY matched term (must and should alike, stats global),
  so results equal the unrestricted OR ranking over the union of
  terms filtered to the must-conjunction's doc set.
- min_should_match counts SHOULD matches only (the ES
  minimum_should_match-with-must contract).
- A term in both must and query is required and scored once.
- With no distinct should terms the bool degenerates to mode='and'.
- Holds on every kernel branch: wand (conjunction-driven
  _score_bool_pruned) == exact (req_mask aggregation), distributed ==
  local, filter=, org= (range + candidate paths), after= cursors,
  must_not composition, CombinedIndex base+delta with tombstones.
"""
import glob
import os

import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import tokenize_text
from sparkfts.fixtures import make_transcripts

SEED = 7207


@pytest.fixture(scope="module")
def corpus():
    return make_transcripts(40, seed=SEED)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    root = str(tmp_path_factory.mktemp("must_idx"))
    build_index(spark, spark.createDataFrame(corpus), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=3, partitions=3))
    return FTSIndex(spark, root)


@pytest.fixture(scope="module")
def store(idx):
    return idx._docstore.toPandas()


@pytest.fixture(scope="module")
def toksets(idx, store):
    return store.assign(
        toks=store["text"].map(
            lambda t: set(tokenize_text(t, idx.tokenizer))))


def _docs_with_all(toksets, must_query, tokenizer):
    req = set(tokenize_text(must_query, tokenizer))
    return set(toksets.loc[
        toksets["toks"].map(lambda s: req <= s), "docid"])


def _expected(idx, toksets, should_q, must_q, k, msm=None,
              restrict=None):
    """Brute oracle: exhaustive OR ranking over the UNION of should +
    must terms, filtered to docs containing all must terms (and, with
    msm, at least msm distinct should-only terms), head(k)."""
    sh = set(tokenize_text(should_q, idx.tokenizer))
    req = set(tokenize_text(must_q, idx.tokenizer))
    union_q = " ".join(sorted(sh | req))
    full = idx.topk_pandas(union_q, k=10 ** 9, mode="or",
                           method="exact")
    keep = _docs_with_all(toksets, must_q, idx.tokenizer)
    if msm is not None:
        only_sh = sh - req
        ok = set(toksets.loc[
            toksets["toks"].map(lambda s: len(s & only_sh) >= msm),
            "docid"])
        keep &= ok
    if restrict is not None:
        keep &= restrict
    return (full[full["docid"].isin(keep)].head(k)
            .reset_index(drop=True))


def _check(got, want, msg=""):
    assert got["docid"].tolist() == want["docid"].tolist(), msg
    np.testing.assert_allclose(got["score"], want["score"],
                               rtol=0, atol=1e-9, err_msg=msg)


SHOULD = "query index"
MUST = "alpha"


@pytest.mark.parametrize("method", ["wand", "exact"])
def test_topk_must_basic(idx, toksets, method):
    want = _expected(idx, toksets, SHOULD, MUST, 8)
    got = idx.topk_pandas(SHOULD, k=8, mode="or", method=method,
                          must=MUST)
    _check(got, want, f"dist/{method}")
    loc = idx.topk_local(SHOULD, k=8, mode="or", method=method,
                         must=MUST)
    _check(loc, want, f"local/{method}")


def test_must_multi_term(idx, toksets):
    must = "alpha golf"
    want = _expected(idx, toksets, SHOULD, must, 8)
    assert not want.empty           # fixture sanity: conjunction hits
    _check(idx.topk_pandas(SHOULD, k=8, must=must), want)
    _check(idx.topk_local(SHOULD, k=8, must=must), want)


def test_must_scores_include_must_terms(idx, toksets):
    """The must terms CONTRIBUTE score (Occur.MUST is scored in
    Lucene): every hit matches the must term, so its bool score
    strictly exceeds its should-only score."""
    got = idx.topk_pandas(SHOULD, k=8, must=MUST)
    only_should = (idx.topk_pandas(SHOULD, k=10 ** 9, mode="or",
                                   method="exact")
                   .set_index("docid")["score"])
    for d, s in zip(got["docid"], got["score"]):
        assert s > only_should.get(d, 0.0) + 1e-12


def test_must_msm_counts_shoulds_only(idx, toksets):
    want = _expected(idx, toksets, SHOULD, MUST, 8, msm=2)
    got = idx.topk_pandas(SHOULD, k=8, must=MUST, min_should_match=2)
    _check(got, want, "dist msm")
    loc = idx.topk_local(SHOULD, k=8, must=MUST, min_should_match=2)
    _check(loc, want, "local msm")


def test_must_cursor_pages(idx, toksets):
    want = _expected(idx, toksets, SHOULD, MUST, 20)
    p1 = idx.topk_pandas(SHOULD, k=10, must=MUST)
    cur = (float(p1["score"].iloc[-1]), int(p1["docid"].iloc[-1]))
    p2 = idx.topk_pandas(SHOULD, k=10, must=MUST, after=cur)
    _check(pd.concat([p1, p2], ignore_index=True), want, "paged dist")
    l2 = idx.topk_local(SHOULD, k=10, must=MUST, after=cur)
    _check(l2, want.iloc[len(p1):].reset_index(drop=True),
           "paged local")


def test_must_composes_with_filter(idx, store, toksets):
    keep = set(store.loc[store["role"] == "user", "docid"])
    want = _expected(idx, toksets, SHOULD, MUST, 6, restrict=keep)
    got = idx.topk_pandas(SHOULD, k=6, filter="role = 'user'",
                          must=MUST)
    _check(got, want)


def test_must_composes_with_must_not(idx, toksets):
    neg = "batch"
    bad = set(toksets.loc[
        toksets["toks"].map(lambda s: "batch" in s), "docid"])
    keep = set(toksets["docid"]) - bad
    want = _expected(idx, toksets, SHOULD, MUST, 8, restrict=keep)
    got = idx.topk_pandas(SHOULD, k=8, must=MUST, must_not=neg)
    _check(got, want, "dist")
    loc = idx.topk_local(SHOULD, k=8, must=MUST, must_not=neg)
    _check(loc, want, "local")


def test_must_term_also_should_scored_once(idx, toksets):
    """'alpha' in both must and query: required, scored once —
    identical to must alone with the other shoulds."""
    want = idx.topk_pandas(SHOULD, k=8, must=MUST)
    got = idx.topk_pandas(f"{MUST} {SHOULD}", k=8, must=MUST)
    _check(got, want)


def test_must_degenerates_to_and(idx):
    """All query terms ⊆ must terms → plain conjunction."""
    want = idx.topk_pandas("alpha query", k=8, mode="and",
                           method="exact")
    got = idx.topk_pandas("", k=8, mode="or", must="alpha query")
    _check(got, want, "dist")
    loc = idx.topk_local("", k=8, mode="or", must="alpha query")
    _check(loc, want, "local")


def test_must_errors(idx):
    with pytest.raises(ValueError, match="zero terms"):
        idx.topk_pandas(SHOULD, k=5, must="...")
    with pytest.raises(ValueError, match="mode='or'"):
        idx.topk_pandas(SHOULD, k=5, mode="and", must=MUST)
    with pytest.raises(ValueError, match="should terms"):
        idx.topk_pandas("", k=5, must=MUST, min_should_match=1)
    with pytest.raises(ValueError, match="mode='or'"):
        idx.topk_local(SHOULD, k=5, mode="and", must=MUST)


def test_search_surfaces_forward(idx, toksets):
    want = _expected(idx, toksets, SHOULD, MUST, 5)
    s = idx.search(SHOULD, k=5, must=MUST).toPandas()
    _check(s[["docid", "score"]], want)
    sl = idx.search_local(SHOULD, k=5, must=MUST)
    _check(sl[["docid", "score"]], want)


@pytest.fixture(scope="module")
def routed(spark, tmp_path_factory, corpus):
    root = str(tmp_path_factory.mktemp("must_routed"))
    pdf = corpus.assign(
        org=corpus["conv_id"].map(lambda c: f"o{sum(map(ord, c)) % 4}"))
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=4, partitions=4,
                                routing_col="org", shards_per_org=2))
    return FTSIndex(spark, root)


@pytest.mark.slow
def test_must_composes_with_org(routed, corpus):
    store = routed._docstore.toPandas()
    toksets = store.assign(
        toks=store["text"].map(
            lambda t: set(tokenize_text(t, routed.tokenizer))))
    org = store["org"].mode().iloc[0]
    keep = set(store.loc[store["org"] == org, "docid"])
    want = _expected(routed, toksets, SHOULD, MUST, 6, restrict=keep)
    got = routed.topk_pandas(SHOULD, k=6, org=org, must=MUST)
    _check(got, want, "routed dist")
    loc = routed.topk_local(SHOULD, k=6, org=org, must=MUST)
    _check(loc, want, "routed local")


@pytest.mark.slow
def test_combined_must_with_tombstones(spark, tmp_path_factory):
    """must rides base+delta generations; deletes (in-kernel excl)
    and the required-set qualification both apply."""
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2)
    root = str(tmp_path_factory.mktemp("must_comb"))
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
        toks = store.assign(
            toks=store["text"].map(
                lambda t: set(tokenize_text(t, ci.tokenizer))))
        req = set(tokenize_text(MUST, ci.tokenizer))
        keep = set(toks.loc[toks["toks"].map(lambda s: req <= s),
                            "docid"])
        union_q = " ".join(sorted(
            set(tokenize_text(SHOULD, ci.tokenizer)) | req))
        full = ci.topk(union_q, k=10 ** 9, mode="or", method="exact")
        victims = [int(d) for d in
                   full[full["docid"].isin(keep)]["docid"].head(2)]
        ci.delete_docs(victims)
        keep -= set(victims)
        want = (full[full["docid"].isin(keep)].head(6)
                .reset_index(drop=True))
        got = ci.topk(SHOULD, k=6, must=MUST)
        _check(got, want, "combined dist")
        loc = ci.topk_local(SHOULD, k=6, must=MUST)
        _check(loc, want, "combined local")
        sl = ci.search_local(SHOULD, k=6, must=MUST)
        _check(sl[["docid", "score"]], want, "combined search_local")
    finally:
        from sparkfts.streaming import _tombstone_dir
        for f in glob.glob(os.path.join(_tombstone_dir(ci.base_root),
                                        "*")):
            os.remove(f)


def test_topk_many_batch_must(idx):
    """Batch-global must: each topk_many result equals the per-query
    topk(must=) call, including a degenerate all-must query."""
    queries = {"a": (SHOULD, "or"), "b": ("golf hotel", "or"),
               "c": (MUST, "or")}     # c degenerates to pure AND
    many = idx.topk_many(queries, k=6, must=MUST)
    for qid, (q, m) in queries.items():
        want = idx.topk_pandas(q, k=6, mode=m, must=MUST)
        assert many[qid]["docid"].tolist() == \
            want["docid"].tolist(), qid
        np.testing.assert_allclose(many[qid]["score"], want["score"],
                                   atol=1e-9)
    with pytest.raises(ValueError, match="mode='or'"):
        idx.topk_many({"x": (SHOULD, "and")}, k=5, must=MUST)


@pytest.mark.slow
def test_combined_topk_many_batch_must(spark, tmp_path_factory):
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2)
    root = str(tmp_path_factory.mktemp("must_many"))
    build_index(spark,
                spark.createDataFrame(make_transcripts(12, seed=SEED)),
                root, order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(make_transcripts(4, seed=SEED + 1)),
            batch_id=0)
    ci = CombinedIndex(spark, root)
    queries = {"a": (SHOULD, "or"), "b": ("golf hotel", "or")}
    many = ci.topk_many(queries, k=6, must=MUST)
    for qid, (q, m) in queries.items():
        want = ci.topk(q, k=6, mode=m, must=MUST)
        assert many[qid]["docid"].tolist() == \
            want["docid"].tolist(), qid
        np.testing.assert_allclose(many[qid]["score"], want["score"],
                                   atol=1e-9)
