"""multi_match — scored multi-field queries (the ES multi_match
analog; public Lucene DisjunctionMaxQuery / bool-sum semantics).

Contract under test:
- best_fields: per doc, max over fields of (boost × field BM25 score)
  + tie_breaker × the others; most_fields: the plain boosted sum.
  Per-field scores use the FIELD's own stats (df, N, avgdl) — pinned
  against independent per-field BM25Oracle recomputes.
- best_fields(tie_breaker=1, equal boosts) == most_fields.
- most_fields over ONE field == topk(field=) (same stats, same sum).
- local twin rank-identical to the distributed path; CombinedIndex
  (base + delta) equals a monolithic rebuild of the union; tombstones
  leave the combined ranking in-kernel.
- mode='and' keeps a field's contribution only when the doc matches
  ALL the query's terms in that field.
"""
import glob
import os

import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import TokenizerConfig
from sparkfts.fixtures import make_transcripts
from sparkfts.oracle import BM25Oracle

SEED = 31


def _with_meta(pdf):
    return pdf.assign(meta=(pdf["role"] + " " + pdf["tool"].fillna("")))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = _with_meta(make_transcripts(25, seed=SEED))
    root = str(tmp_path_factory.mktemp("mm"))
    cfg = BuildConfig(num_shards=4, partitions=4,
                      fields={"text": TokenizerConfig(),
                              "meta": TokenizerConfig()})
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return FTSIndex(spark, root), pdf


def _brute_mm(pdf, query, boosts, qtype, tie_breaker, mode, k,
              ids=None):
    """Independent per-field BM25 recompute + per-doc combine."""
    if ids is None:
        ids = np.arange(len(pdf), dtype=np.int64)
    per_field = {}
    for f, w in boosts.items():
        oracle = BM25Oracle(ids, pdf[f].reset_index(drop=True))
        full = oracle.topk(query, k=10 ** 9, mode=mode)
        if full.empty:
            continue
        per_field[f] = dict(zip(full["docid"],
                                w * full["score"].to_numpy()))
    union = sorted(set().union(*per_field.values())) if per_field else []
    rows = []
    for d in union:
        vals = [per_field[f].get(d, 0.0) for f in sorted(per_field)]
        if qtype == "most_fields":
            s = float(np.sum(vals))
        else:
            mx = max(vals)
            s = mx + tie_breaker * (sum(vals) - mx)
        rows.append((d, s))
    out = (pd.DataFrame(rows, columns=["docid", "score"])
           .astype({"docid": "int64", "score": "float64"}))
    return (out.sort_values(["score", "docid"],
                            ascending=[False, True])
            .head(k).reset_index(drop=True))


def _check(got, want, msg=""):
    assert got["docid"].tolist() == want["docid"].tolist(), msg
    np.testing.assert_allclose(got["score"], want["score"],
                               rtol=0, atol=1e-9, err_msg=msg)


BOOSTS = {"text": 1.0, "meta": 2.0}
Q = "assistant search alpha"


@pytest.mark.parametrize("qtype,tb", [("best_fields", 0.0),
                                      ("best_fields", 0.3),
                                      ("most_fields", 0.0)])
def test_multi_match_matches_bruteforce(built, qtype, tb):
    idx, pdf = built
    want = _brute_mm(pdf, Q, BOOSTS, qtype, tb, "or", 10)
    got = idx.multi_match(Q, fields=BOOSTS, k=10, qtype=qtype,
                          tie_breaker=tb).toPandas()
    _check(got, want, f"dist {qtype}/{tb}")
    loc = idx.multi_match_local(Q, fields=BOOSTS, k=10, qtype=qtype,
                                tie_breaker=tb)
    _check(loc, want, f"local {qtype}/{tb}")


def test_mode_and_requires_all_terms_per_field(built):
    idx, pdf = built
    for q in ["alpha query", "tool search"]:
        want = _brute_mm(pdf, q, BOOSTS, "best_fields", 0.2, "and", 10)
        got = idx.multi_match(q, fields=BOOSTS, k=10, mode="and",
                              tie_breaker=0.2).toPandas()
        _check(got, want, q)
        loc = idx.multi_match_local(q, fields=BOOSTS, k=10,
                                    mode="and", tie_breaker=0.2)
        _check(loc, want, "local " + q)


def test_tiebreaker_one_equals_most_fields(built):
    idx, _ = built
    eq = {"text": 1.0, "meta": 1.0}
    best = idx.multi_match_local(Q, fields=eq, k=15,
                                 qtype="best_fields", tie_breaker=1.0)
    most = idx.multi_match_local(Q, fields=eq, k=15,
                                 qtype="most_fields")
    _check(best, most)


def test_single_field_equals_topk_field(built):
    idx, _ = built
    mm = idx.multi_match_local("alpha query", fields=["text"], k=10,
                               qtype="most_fields")
    tk = idx.topk_local("alpha query", k=10, field="text")
    _check(mm, tk)


def test_default_fields_and_pagination(built):
    idx, pdf = built
    full = idx.multi_match_local(Q, k=20, tie_breaker=0.5)
    p1 = idx.multi_match_local(Q, k=10, tie_breaker=0.5)
    cur = (float(p1["score"].iloc[-1]), int(p1["docid"].iloc[-1]))
    p2 = idx.multi_match(Q, k=10, tie_breaker=0.5, after=cur).toPandas()
    _check(pd.concat([p1, p2], ignore_index=True).head(len(full)), full)


def test_boost_scales_field_contribution(built):
    idx, pdf = built
    # meta-only query: doubling the meta boost doubles every score
    q = "assistant"
    s1 = idx.multi_match_local(q, fields={"meta": 1.0}, k=10)
    s2 = idx.multi_match_local(q, fields={"meta": 2.0}, k=10)
    assert s1["docid"].tolist() == s2["docid"].tolist()
    np.testing.assert_allclose(2.0 * s1["score"], s2["score"],
                               rtol=0, atol=1e-9)


def test_multi_match_errors(built, spark, tmp_path_factory):
    idx, _ = built
    with pytest.raises(ValueError, match="best_fields"):
        idx.multi_match(Q, qtype="cross_fields")
    with pytest.raises(ValueError, match="tie_breaker"):
        idx.multi_match(Q, tie_breaker=1.5)
    with pytest.raises(ValueError, match="unknown fields"):
        idx.multi_match(Q, fields={"nope": 1.0})
    pdf = make_transcripts(5, seed=7)
    root = str(tmp_path_factory.mktemp("mm_classic"))
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=2, partitions=2))
    with pytest.raises(ValueError, match="multi-field"):
        FTSIndex(spark, root).multi_match(Q)


def test_combined_equals_monolithic_and_tombstones(spark,
                                                   tmp_path_factory):
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2,
                      fields={"text": TokenizerConfig(),
                              "meta": TokenizerConfig()})
    base = _with_meta(make_transcripts(14, seed=SEED))
    delta = _with_meta(make_transcripts(6, seed=SEED + 1))
    root = str(tmp_path_factory.mktemp("mm_comb"))
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(delta), batch_id=0)
    ci = CombinedIndex(spark, root)
    store = (pd.concat([s._docstore.toPandas() for s in ci.subs])
             .sort_values("docid").reset_index(drop=True))
    try:
        want = _brute_mm(store, Q, BOOSTS, "best_fields", 0.4, "or",
                         10, ids=store["docid"].to_numpy(np.int64))
        got = ci.multi_match(Q, fields=BOOSTS, k=10, tie_breaker=0.4)
        _check(got, want, "combined dist vs union brute oracle")
        loc = ci.multi_match_local(Q, fields=BOOSTS, k=10,
                                   tie_breaker=0.4)
        _check(loc, want, "combined local vs union brute oracle")
        victims = [int(d) for d in want["docid"].head(2)]
        ci.delete_docs(victims)
        got2 = ci.multi_match_local(Q, fields=BOOSTS, k=8,
                                    tie_breaker=0.4)
        want2 = (want[~want["docid"].isin(victims)].head(8)
                 .reset_index(drop=True))
        _check(got2, want2, "tombstones excluded in-kernel")
    finally:
        from sparkfts.streaming import _tombstone_dir
        for f in glob.glob(os.path.join(_tombstone_dir(ci.base_root),
                                        "*")):
            os.remove(f)
