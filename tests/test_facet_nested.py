"""Nested terms aggregation (ES terms agg with a terms sub-agg).

Contract under test (public ES DSL):
- facet_nested(by, sub): top-k outer buckets by doc_count (count
  desc, value asc), top-k_sub inner values inside each; outer
  doc_count counts every doc in the bucket INCLUDING docs whose
  inner value is NULL (the ES contract); inner buckets non-NULL
  only; an all-NULL-inner bucket emits one row with NULL sub_value.
- One facet pass (composite key); CombinedIndex union-global.
"""
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import tokenize_text
from sparkfts.fixtures import make_transcripts

SEED = 7907


@pytest.fixture(scope="module")
def corpus():
    return make_transcripts(25, seed=SEED)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    root = str(tmp_path_factory.mktemp("nest_idx"))
    build_index(spark, spark.createDataFrame(corpus), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=2, partitions=2))
    return FTSIndex(spark, root)


@pytest.fixture(scope="module")
def store(idx):
    return idx._docstore.toPandas()


def _matching(idx, store, query, mode="or"):
    terms = set(tokenize_text(query, idx.tokenizer))
    toks = store["text"].map(
        lambda t: set(tokenize_text(t, idx.tokenizer)))
    m = (toks.map(lambda s: terms <= s) if mode == "and"
         else toks.map(lambda s: bool(s & terms)))
    return store[m.values]


def _expected(m, by, sub, k, k_sub):
    m = m[m[by].notna()]
    rows = []
    grp = m.groupby(by, dropna=False)
    outer = sorted(((len(g), v) for v, g in grp),
                   key=lambda t: (-t[0], str(t[1])))[:k]
    for cnt, v in outer:
        g = m[m[by] == v]
        inner = g[g[sub].notna()].groupby(sub).size()
        inner = sorted(((c, s) for s, c in inner.items()),
                       key=lambda t: (-t[0], str(t[1])))[:k_sub]
        if not inner:
            rows.append((str(v), cnt, None, 0))
        for c, s in inner:
            rows.append((str(v), cnt, str(s), c))
    return rows


def test_nested_matches_recount(idx, store):
    q = "alpha"
    m = _matching(idx, store, q)
    want = _expected(m, "role", "tool", 10, 10)
    got = idx.facet_nested(q, by="role", sub="tool", mode="or",
                           k=10, k_sub=10).toPandas()
    got_rows = [(r.value, int(r.doc_count),
                 None if pd.isna(r.sub_value) else r.sub_value,
                 int(r.sub_count))
                for r in got.itertuples()]
    assert got_rows == want
    # the ES contract: outer counts include docs with NULL inner
    # ('user'/'assistant'/'system' docs have tool = NULL)
    user_cnt = int((m["role"] == "user").sum())
    assert any(v == "user" and c == user_cnt for v, c, _, _ in want)
    # and those buckets emit the single NULL-inner row
    assert any(v == "user" and s is None and sc == 0
               for v, c, s, sc in got_rows)


def test_nested_caps_and_order(idx, store):
    q = "alpha"
    m = _matching(idx, store, q)
    # recompute inner over the expression
    m2 = m.assign(**{"turn_idx % 3": m["turn_idx"] % 3})
    want = _expected(m2, "role", "turn_idx % 3", 2, 2)
    got = idx.facet_nested(q, by="role", sub="turn_idx % 3",
                           mode="or", k=2, k_sub=2).toPandas()
    got_rows = [(r.value, int(r.doc_count),
                 None if pd.isna(r.sub_value) else r.sub_value,
                 int(r.sub_count))
                for r in got.itertuples()]
    assert got_rows == want
    # 2 outer buckets, <= 2 inner each
    assert got["value"].nunique() == 2
    assert got.groupby("value").size().max() <= 2


def test_nested_composes_with_filter(idx, store):
    q = "alpha"
    m = _matching(idx, store, q)
    m = m[m["turn_idx"] >= 3]
    want = _expected(m, "role", "tool", 10, 10)
    got = idx.facet_nested(q, by="role", sub="tool", mode="or",
                           filter="turn_idx >= 3").toPandas()
    got_rows = [(r.value, int(r.doc_count),
                 None if pd.isna(r.sub_value) else r.sub_value,
                 int(r.sub_count))
                for r in got.itertuples()]
    assert got_rows == want


@pytest.mark.slow
def test_combined_nested(spark, tmp_path_factory):
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2)
    root = str(tmp_path_factory.mktemp("nest_comb"))
    base = make_transcripts(10, seed=SEED)
    delta = make_transcripts(5, seed=SEED + 1)
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(delta), batch_id=0)
    ci = CombinedIndex(spark, root)
    store = pd.concat([s._docstore.toPandas() for s in ci.subs],
                      ignore_index=True)
    toks = store["text"].map(
        lambda t: set(tokenize_text(t, ci.tokenizer)))
    m = store[toks.map(lambda s: "alpha" in s).values]
    want = _expected(m, "role", "tool", 10, 10)
    got = ci.facet_nested("alpha", by="role", sub="tool",
                          mode="or").toPandas()
    got_rows = [(r.value, int(r.doc_count),
                 None if pd.isna(r.sub_value) else r.sub_value,
                 int(r.sub_count))
                for r in got.itertuples()]
    assert got_rows == want


@pytest.mark.slow
def test_cli_nested(idx, capsys, monkeypatch, spark):
    import json
    from sparkfts.cli import main
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rc = main(["--master", "local[2]", "agg", "--index", idx.root,
               "--q", "alpha", "--what", "nested", "--by", "role",
               "--sub-by", "tool", "--k", "3", "--k-hits", "2",
               "--mode", "or"])
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(l) for l in out if l.startswith("{")]
    want = idx.facet_nested("alpha", by="role", sub="tool", k=3,
                            k_sub=2, mode="or").collect()
    assert rc == 0
    assert [(r["value"], r["sub_value"], r["sub_count"])
            for r in rows] == \
        [(r["value"], r["sub_value"], r["sub_count"]) for r in want]
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["--master", "local[2]", "agg", "--index", idx.root,
              "--q", "alpha", "--what", "nested", "--by", "role"])
