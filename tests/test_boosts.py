"""Query-time per-term boosting (the Lucene TermQuery boost / ES
``"term"^2`` clause weight).

Contract under test (reference: the restored ES 1.x cluster serves
boosted bool clauses via BaseESReducer.java:154 delegation; boost
semantics are public Lucene — a clause's score contribution scales
linearly by its boost):
- topk(boosts={t: w}) scores each doc as Σ w_t · contrib_t — the
  per-term contributions are exactly the single-term exact scores,
  so the brute oracle is a weighted sum of one-term rankings.
- WAND pruning stays exact under boosting (bounds scale with the
  same idf factor), local == distributed == CombinedIndex.
- min_should_match / must / must_not semantics are unchanged by
  boosts (boosts change scores, never membership).
- Unknown terms, non-positive/NaN weights, multi-token keys raise.
"""
import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.fixtures import make_transcripts

SEED = 7311


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("boost_idx"))
    build_index(spark,
                spark.createDataFrame(make_transcripts(35, seed=SEED)),
                root, order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=3, partitions=3))
    return FTSIndex(spark, root)


def _brute(idx, weights: dict[str, float], k: int,
           mode: str = "or", msm: int | None = None):
    """Weighted sum of single-term exact rankings — independent of
    every multi-term kernel path."""
    per = {t: idx.topk_pandas(t, k=10 ** 9, method="exact")
           .set_index("docid")["score"] for t in weights}
    alld = sorted(set().union(*[set(s.index) for s in per.values()]))
    rows = []
    for d in alld:
        hit = [t for t in weights if d in per[t].index]
        if mode == "and" and len(hit) != len(weights):
            continue
        if msm is not None and len(hit) < msm:
            continue
        rows.append((d, sum(weights[t] * per[t][d] for t in hit)))
    out = pd.DataFrame(rows, columns=["docid", "score"]).astype(
        {"docid": "int64", "score": "float64"})
    return (out.sort_values(["score", "docid"],
                            ascending=[False, True])
            .head(k).reset_index(drop=True))


def _check(got, want, msg=""):
    assert got["docid"].tolist() == want["docid"].tolist(), msg
    np.testing.assert_allclose(got["score"], want["score"],
                               rtol=0, atol=1e-9, err_msg=msg)


W = {"alpha": 2.0, "window": 0.5, "query": 1.0}
Q = "alpha window query"
# AND needs a frequently co-occurring trio (fixture shared phrases)
W_AND = {"alpha": 2.0, "bravo": 0.5, "charlie": 1.3}
Q_AND = "alpha bravo charlie"


@pytest.mark.parametrize("method", ["wand", "exact"])
@pytest.mark.parametrize("mode", ["or", "and"])
def test_boosted_topk_matches_weighted_sum(idx, mode, method):
    weights, q = (W_AND, Q_AND) if mode == "and" else (W, Q)
    want = _brute(idx, weights, 8, mode=mode)
    assert not want.empty
    got = idx.topk_pandas(q, k=8, mode=mode, method=method,
                          boosts=weights)
    _check(got, want, f"{mode}/{method}")
    loc = idx.topk_local(q, k=8, mode=mode, method=method,
                         boosts=weights)
    _check(loc, want, f"local {mode}/{method}")


def test_boost_subset_and_identity(idx):
    """Boosting a subset leaves other terms at weight 1; boost=1.0
    is a no-op."""
    want = _brute(idx, {"alpha": 3.0, "window": 1.0}, 8)
    got = idx.topk_pandas("alpha window", k=8, boosts={"alpha": 3.0})
    _check(got, want)
    base = idx.topk_pandas("alpha window", k=8)
    noop = idx.topk_pandas("alpha window", k=8,
                           boosts={"alpha": 1.0, "window": 1.0})
    _check(noop, base)


def test_boost_changes_ranking_not_membership_msm(idx):
    want = _brute(idx, W, 8, msm=2)
    got = idx.topk_pandas(Q, k=8, boosts=W, min_should_match=2)
    _check(got, want)
    # membership equals the unboosted msm result's membership
    base = idx.topk_pandas(Q, k=10 ** 9, min_should_match=2,
                           method="exact")
    full = idx.topk_pandas(Q, k=10 ** 9, min_should_match=2,
                           method="exact", boosts=W)
    assert set(full["docid"]) == set(base["docid"])


def test_boost_composes_with_must(idx):
    """Boosting the must term scales its contribution; membership is
    the must conjunction either way."""
    plain = idx.topk_pandas("window query", k=10 ** 9, must="alpha",
                            method="exact")
    boosted = idx.topk_pandas("window query", k=10 ** 9, must="alpha",
                              method="exact", boosts={"alpha": 2.0})
    assert set(boosted["docid"]) == set(plain["docid"])
    alpha = (idx.topk_pandas("alpha", k=10 ** 9, method="exact")
             .set_index("docid")["score"])
    ps = plain.set_index("docid")["score"]
    bs = boosted.set_index("docid")["score"]
    for d in ps.index:
        np.testing.assert_allclose(bs[d], ps[d] + alpha[d], atol=1e-9)
    # pruned path parity
    _check(idx.topk_pandas("window query", k=8, must="alpha",
                           boosts={"alpha": 2.0}),
           boosted.head(8).reset_index(drop=True))


def test_boost_cursor_pages_exact(idx):
    want = _brute(idx, W, 20)
    p1 = idx.topk_pandas(Q, k=10, boosts=W)
    cur = (float(p1["score"].iloc[-1]), int(p1["docid"].iloc[-1]))
    p2 = idx.topk_pandas(Q, k=10, boosts=W, after=cur)
    _check(pd.concat([p1, p2], ignore_index=True), want)


def test_boost_errors(idx):
    with pytest.raises(ValueError, match="not a query term"):
        idx.topk_pandas(Q, k=5, boosts={"zebra": 2.0})
    with pytest.raises(ValueError, match="positive"):
        idx.topk_pandas(Q, k=5, boosts={"alpha": 0.0})
    with pytest.raises(ValueError, match="positive"):
        idx.topk_pandas(Q, k=5, boosts={"alpha": -1.0})
    with pytest.raises(ValueError, match="exactly one term"):
        idx.topk_pandas(Q, k=5, boosts={"alpha window": 2.0})
    with pytest.raises(ValueError, match="not a query term"):
        idx.topk_local(Q, k=5, boosts={"zebra": 2.0})


@pytest.mark.slow
def test_combined_boosts(spark, tmp_path_factory):
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2)
    root = str(tmp_path_factory.mktemp("boost_comb"))
    build_index(spark,
                spark.createDataFrame(make_transcripts(14, seed=SEED)),
                root, order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(make_transcripts(4, seed=SEED + 1)),
            batch_id=0)
    ci = CombinedIndex(spark, root)
    w = {"alpha": 2.5, "window": 1.0}
    per = {t: ci.topk(t, k=10 ** 9, method="exact")
           .set_index("docid")["score"] for t in w}
    alld = sorted(set(per["alpha"].index) | set(per["window"].index))
    rows = [(d, sum(w[t] * per[t][d] for t in w if d in per[t].index))
            for d in alld]
    want = (pd.DataFrame(rows, columns=["docid", "score"])
            .sort_values(["score", "docid"], ascending=[False, True])
            .head(8).reset_index(drop=True))
    _check(ci.topk("alpha window", k=8, boosts=w), want, "dist")
    _check(ci.topk_local("alpha window", k=8, boosts=w), want, "local")
    sl = ci.search_local("alpha window", k=8, boosts=w)
    _check(sl[["docid", "score"]], want, "search_local")


def test_topk_many_batch_boosts(idx):
    """Batch-global boosts scale the SHARED idf map: each topk_many
    result equals the per-query topk(boosts=) restricted to the
    query's own boosted terms."""
    queries = {"a": ("alpha window", "or"),
               "b": ("alpha query", "and"),
               "c": ("window", "or")}
    many = idx.topk_many(queries, k=6, boosts={"alpha": 2.0,
                                               "window": 0.5})
    per_q_boosts = {"a": {"alpha": 2.0, "window": 0.5},
                    "b": {"alpha": 2.0}, "c": {"window": 0.5}}
    for qid, (q, m) in queries.items():
        want = idx.topk_pandas(q, k=6, mode=m,
                               boosts=per_q_boosts[qid])
        assert many[qid]["docid"].tolist() == \
            want["docid"].tolist(), qid
        np.testing.assert_allclose(many[qid]["score"], want["score"],
                                   atol=1e-9)
    with pytest.raises(ValueError, match="not a query term"):
        idx.topk_many(queries, k=5, boosts={"zebra": 2.0})
