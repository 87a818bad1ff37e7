"""match_phrase_prefix — the ES autocomplete-phrase analog (public
Lucene MultiPhraseQuery semantics).

Contract under test:
- a doc matches when the query's fixed tokens occur consecutively and
  SOME dictionary expansion of the trailing prefix occupies the next
  position; score = BM25 over the distinct participating terms (the
  fixed terms + every expansion completing >= 1 occurrence in the
  doc) — phrase_topk's documented scoring contract extended to the
  expanded last slot. Pinned against an independent token-sequence
  brute recompute.
- single-token query (pure prefix) == pattern_topk scoring_boolean
  with the same cap (every present expansion "completes" a phrase).
- max_expansions caps deterministically (df DESC, term ASC).
- local twin rank-identical to the distributed path; CombinedIndex
  (base + delta) matches the brute recompute over the union and
  excludes tombstones in-kernel.
"""
import glob
import os

import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import DEFAULT, tokenize_text
from sparkfts.fixtures import make_transcripts
from sparkfts.oracle import BM25Oracle

SEED = 71


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_transcripts(30, seed=SEED)
    root = str(tmp_path_factory.mktemp("pp"))
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=3, partitions=3))
    pdf = (pdf.sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    return FTSIndex(spark, root), pdf


def _weight(o: BM25Oracle, docid: int, term: str) -> float:
    sub = o.tf[(o.tf["term"] == term) & (o.tf["docid"] == docid)]
    if sub.empty:
        return 0.0
    tfv = float(sub["tf"].iloc[0])
    dl = float(o.dl[docid])
    return o.idf(term) * tfv * (o.k1 + 1) / (
        tfv + o.k1 * (1 - o.b + o.b * dl / o.avgdl))


def brute_pp(ids, texts, query, k, allowed=None):
    """Independent token-sequence recompute: scan every doc's token
    list for fixed-seq + prefix completions; score the distinct
    participating terms. ``allowed`` restricts completions to the
    engine's (capped) expansion set."""
    o = BM25Oracle(ids, texts.reset_index(drop=True))
    toks_q = tokenize_text(query, DEFAULT)
    fixed, pre = toks_q[:-1], toks_q[-1]
    L = len(toks_q)
    rows = []
    for docid, text in zip(ids, texts):
        ts = tokenize_text(text, DEFAULT)
        matched = set()
        for i in range(len(ts) - L + 1):
            if (list(ts[i:i + L - 1]) == list(fixed)
                    and ts[i + L - 1].startswith(pre)
                    and (allowed is None or ts[i + L - 1] in allowed)):
                matched.add(ts[i + L - 1])
        if not matched:
            continue
        terms = set(fixed) | matched
        rows.append((int(docid),
                     sum(_weight(o, int(docid), t)
                         for t in sorted(terms))))
    out = (pd.DataFrame(rows, columns=["docid", "score"])
           .astype({"docid": "int64", "score": "float64"}))
    return (out.sort_values(["score", "docid"],
                            ascending=[False, True])
            .head(k).reset_index(drop=True))


def _check(got, want, msg=""):
    assert got["docid"].tolist() == want["docid"].tolist(), msg
    np.testing.assert_allclose(got["score"], want["score"],
                               rtol=0, atol=1e-9, err_msg=msg)


@pytest.mark.parametrize("q", ["alpha qu", "batch window s", "sc"])
def test_phrase_prefix_matches_bruteforce(built, q):
    idx, pdf = built
    ids = np.arange(len(pdf), dtype=np.int64)
    exps = set(t for t in idx.expand_terms(
        tokenize_text(q, DEFAULT)[-1], "prefix"))
    want = brute_pp(ids, pdf["text"], q, 10, allowed=exps)
    got = idx.phrase_prefix_topk(q, k=10).toPandas()
    _check(got, want, "dist " + q)
    loc = idx.phrase_prefix_topk_local(q, k=10)
    _check(loc, want, "local " + q)


def test_single_token_equals_pattern_scoring_boolean(built):
    idx, _ = built
    pp = idx.phrase_prefix_topk_local("sc", k=10)
    pt = idx.pattern_topk_local("sc", "prefix", k=10,
                                rewrite="scoring_boolean")
    _check(pp, pt)


def test_max_expansions_cap(built):
    idx, pdf = built
    exps1 = idx.expand_terms("s", "prefix", max_expansions=1)
    assert len(exps1) == 1
    ids = np.arange(len(pdf), dtype=np.int64)
    want = brute_pp(ids, pdf["text"], "alpha s", 10,
                    allowed=set(exps1))
    got = idx.phrase_prefix_topk_local("alpha s", k=10,
                                       max_expansions=1)
    _check(got, want)


def test_no_expansion_or_empty_query_is_empty(built):
    idx, _ = built
    assert idx.phrase_prefix_topk_local("alpha zzzzqx", k=5).empty
    assert idx.phrase_prefix_topk_local("...", k=5).empty
    assert idx.phrase_prefix_topk("alpha zzzzqx", k=5).count() == 0


def test_combined_matches_brute_and_tombstones(spark,
                                               tmp_path_factory):
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2)
    base = make_transcripts(14, seed=SEED)
    delta = make_transcripts(6, seed=SEED + 1)
    root = str(tmp_path_factory.mktemp("pp_comb"))
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(delta), batch_id=0)
    ci = CombinedIndex(spark, root)
    store = (pd.concat([s._docstore.toPandas() for s in ci.subs])
             .sort_values("docid").reset_index(drop=True))
    q = "alpha qu"
    try:
        exps = set(ci.expand_terms("qu", "prefix"))
        deep = brute_pp(store["docid"].to_numpy(np.int64),
                        store["text"], q, 50, allowed=exps)
        want = deep.head(10).reset_index(drop=True)
        got = ci.phrase_prefix_topk(q, k=10)
        _check(got, want, "combined dist")
        loc = ci.phrase_prefix_topk_local(q, k=10)
        _check(loc, want, "combined local")
        if len(deep) >= 11:
            victims = [int(want["docid"].iloc[0])]
            ci.delete_docs(victims)
            got2 = ci.phrase_prefix_topk_local(q, k=10)
            want2 = (deep[~deep["docid"].isin(victims)]
                     .head(10).reset_index(drop=True))
            _check(got2, want2, "tombstones")
    finally:
        from sparkfts.streaming import _tombstone_dir
        for f in glob.glob(os.path.join(_tombstone_dir(ci.base_root),
                                        "*")):
            os.remove(f)
