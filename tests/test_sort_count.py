"""sorted_search / count / facet_cardinality — the ES sort clause,
_count API, and cardinality aggregation analogs (filter context, no
scoring).

Contract under test:
- sorted_search == boolean match ∩ org/filter, ordered by the sort
  expression (desc|asc, docid asc tiebreak), NULL sort keys omitted,
  top k — pinned against a pandas recompute.
- count == len(match set); count_local zero-job twin equal.
- facet_cardinality exact == pandas nunique over the match set;
  the approx (HLL) path lands within 3·rsd of exact.
- CombinedIndex twins equal the union recompute and exclude
  tombstones in-kernel.
"""
import glob
import os

import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import tokenize_text
from sparkfts.fixtures import make_transcripts

SEED = 55
Q = "alpha query"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_transcripts(30, seed=SEED)
    root = str(tmp_path_factory.mktemp("sc"))
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=3, partitions=3))
    idx = FTSIndex(spark, root)
    return idx, idx._docstore.toPandas()


def _match_set(idx, store, query, mode):
    terms = set(tokenize_text(query, idx.tokenizer))
    toks = store["text"].map(
        lambda t: set(tokenize_text(t, idx.tokenizer)))
    if mode == "and":
        m = toks.map(lambda s: terms <= s)
    else:
        m = toks.map(lambda s: bool(s & terms))
    return store[m]


@pytest.mark.parametrize("mode", ["and", "or"])
@pytest.mark.parametrize("descending", [True, False])
def test_sorted_search_matches_pandas(built, mode, descending):
    idx, store = built
    got = idx.sorted_search(Q, by="turn_idx", k=8, mode=mode,
                            descending=descending).toPandas()
    hit = _match_set(idx, store, Q, mode)
    want = (hit.assign(sort_val=hit["turn_idx"].astype(float))
            .sort_values(["sort_val", "docid"],
                         ascending=[not descending, True])
            .head(8)[["docid", "sort_val"]].reset_index(drop=True))
    assert got["docid"].tolist() == want["docid"].tolist(), \
        (mode, descending)
    np.testing.assert_allclose(got["sort_val"], want["sort_val"])


def test_sorted_search_expression_and_filter(built):
    idx, store = built
    got = idx.sorted_search(Q, by="turn_idx * 2 + 1", k=5,
                            filter="role = 'user'").toPandas()
    hit = _match_set(idx, store, Q, "and")
    hit = hit[hit["role"] == "user"]
    want = (hit.assign(sort_val=(hit["turn_idx"] * 2 + 1)
                       .astype(float))
            .sort_values(["sort_val", "docid"],
                         ascending=[False, True])
            .head(5)[["docid", "sort_val"]].reset_index(drop=True))
    assert got["docid"].tolist() == want["docid"].tolist()


def test_count_and_local_twin(built):
    idx, store = built
    for mode in ("and", "or"):
        want = len(_match_set(idx, store, Q, mode))
        assert idx.count(Q, mode=mode) == want
        assert idx.count_local(Q, mode=mode) == want
    flt = len(_match_set(idx, store, Q, "and")
              .query("role == 'user'"))
    assert idx.count(Q, filter="role = 'user'") == flt


def test_facet_cardinality_exact_and_approx(built):
    idx, store = built
    hit = _match_set(idx, store, Q, "and")
    want = int(hit["conv_id"].nunique())
    got = idx.facet_cardinality(Q, by="conv_id")
    assert got == want
    approx = idx.facet_cardinality(Q, by="conv_id", exact=False,
                                   rsd=0.05)
    assert abs(approx - want) <= max(2, 3 * 0.05 * want)
    # expression facet + filter compose
    got2 = idx.facet_cardinality(Q, by="CAST(turn_idx / 5 AS INT)",
                                 filter="role = 'user'")
    want2 = int((hit[hit["role"] == "user"]["turn_idx"] // 5)
                .nunique())
    assert got2 == want2


def test_combined_twins_and_tombstones(spark, tmp_path_factory):
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2)
    base = make_transcripts(14, seed=SEED)
    delta = make_transcripts(6, seed=SEED + 1)
    root = str(tmp_path_factory.mktemp("sc_comb"))
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(delta), batch_id=0)
    ci = CombinedIndex(spark, root)
    store = (pd.concat([s._docstore.toPandas() for s in ci.subs])
             .sort_values("docid").reset_index(drop=True))
    try:
        hit = _match_set(ci.subs[0], store, Q, "and")
        want = (hit.assign(sort_val=hit["turn_idx"].astype(float))
                .sort_values(["sort_val", "docid"],
                             ascending=[False, True]))
        got = ci.sorted_search(Q, by="turn_idx", k=6).toPandas()
        assert got["docid"].tolist() == \
            want.head(6)["docid"].tolist()
        assert ci.count(Q) == len(hit)
        assert ci.count_local(Q) == len(hit)
        assert ci.facet_cardinality(Q, by="conv_id") == \
            int(hit["conv_id"].nunique())
        victims = [int(d) for d in want.head(2)["docid"]]
        ci.delete_docs(victims)
        got2 = ci.sorted_search(Q, by="turn_idx", k=6).toPandas()
        want2 = want[~want["docid"].isin(victims)].head(6)
        assert got2["docid"].tolist() == want2["docid"].tolist()
        assert ci.count(Q) == len(hit) - len(victims)
        surv = hit[~hit["docid"].isin(victims)]
        assert ci.facet_cardinality(Q, by="conv_id") == \
            int(surv["conv_id"].nunique())
    finally:
        from sparkfts.streaming import _tombstone_dir
        for f in glob.glob(os.path.join(_tombstone_dir(ci.base_root),
                                        "*")):
            os.remove(f)
