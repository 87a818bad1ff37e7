"""Term suggester (the ES did-you-mean surface).

Contract under test (public ES term-suggester semantics):
- suggest(text): per analyzed token, dictionary terms within
  max_edits Levenshtein edits sharing the first prefix_length chars,
  ranked (distance asc, df desc, suggestion asc), capped at size;
  the input term itself is never suggested.
- suggest_mode='missing' (ES default) skips tokens already in the
  dictionary; 'always' suggests for every token.
- CombinedIndex sums candidate dfs across generations.
The test oracle is an independent pure-python edit-distance DP over
the corpus vocabulary.
"""
from collections import Counter

import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import tokenize_text
from sparkfts.fixtures import make_transcripts

SEED = 7717


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def corpus():
    return make_transcripts(25, seed=SEED)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    root = str(tmp_path_factory.mktemp("sug_idx"))
    build_index(spark, spark.createDataFrame(corpus), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=2, partitions=2))
    return FTSIndex(spark, root)


@pytest.fixture(scope="module")
def dfs(idx, corpus):
    toks = corpus["text"].map(
        lambda t: set(tokenize_text(t, idx.tokenizer)))
    return Counter(t for s in toks for t in s)


def _expected(dfs, token, size=5, max_edits=2, prefix_length=1,
              min_doc_freq=1):
    ranked = sorted(
        (_lev(token, t), -df, t) for t, df in dfs.items()
        if t != token and df >= min_doc_freq
        and t[:prefix_length] == token[:prefix_length]
        and _lev(token, t) <= max_edits)
    return [(t, d, float(-ndf)) for d, ndf, t in ranked[:size]]


def test_suggest_matches_brute(idx, dfs):
    got = idx.suggest("alhpa", size=5)       # transposed 'alpha'
    want = _expected(dfs, "alhpa")
    assert [tuple(r) for r in
            got[["suggestion", "distance", "df"]].itertuples(
                index=False)] == want
    assert want and want[0][0] == "alpha"


def test_suggest_mode_and_order(idx, dfs):
    # 'alpha' is in the dictionary: missing-mode skips it
    assert idx.suggest("alpha").empty
    alw = idx.suggest("alpha", suggest_mode="always", size=4)
    want = _expected(dfs, "alpha", size=4)
    assert [tuple(r) for r in
            alw[["suggestion", "distance", "df"]].itertuples(
                index=False)] == want
    assert "alpha" not in set(alw["suggestion"])
    # ranked distance asc then df desc
    assert list(alw["distance"]) == sorted(alw["distance"])


def test_suggest_multi_token_and_filters(idx, dfs):
    got = idx.suggest("alhpa bravp", size=3)
    assert set(got["token"]) == {"alhpa", "bravp"}
    for tok in ("alhpa", "bravp"):
        sub = got[got["token"] == tok]
        want = _expected(dfs, tok, size=3)
        assert [tuple(r) for r in
                sub[["suggestion", "distance", "df"]].itertuples(
                    index=False)] == want
    # prefix_length=2 prunes candidates not sharing 2 chars
    p2 = idx.suggest("alhpa", size=10, prefix_length=2)
    assert all(s[:2] == "al" for s in p2["suggestion"])
    # min_doc_freq floor
    hi = idx.suggest("alhpa", size=50, min_doc_freq=50)
    assert all(df >= 50 for df in hi["df"])
    with pytest.raises(ValueError, match="suggest_mode"):
        idx.suggest("alhpa", suggest_mode="popular")


@pytest.mark.slow
def test_combined_suggest_sums_dfs(spark, tmp_path_factory):
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2)
    root = str(tmp_path_factory.mktemp("sug_comb"))
    base = make_transcripts(10, seed=SEED)
    delta = make_transcripts(6, seed=SEED + 1)
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    indexer = make_batch_indexer(root, cfg=cfg,
                                 order_cols=["conv_id", "turn_idx"])
    indexer(spark.createDataFrame(delta), batch_id=0)
    ci = CombinedIndex(spark, root)
    both = pd.concat([base, delta], ignore_index=True)
    toks = both["text"].map(
        lambda t: set(tokenize_text(t, ci.tokenizer)))
    dfs = Counter(t for s in toks for t in s)
    got = ci.suggest("alhpa", size=5)
    want = _expected(dfs, "alhpa")
    assert [tuple(r) for r in
            got[["suggestion", "distance", "df"]].itertuples(
                index=False)] == want


@pytest.mark.slow
def test_cli_suggest(idx, capsys, monkeypatch, spark):
    import json
    from sparkfts.cli import main
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rc = main(["--master", "local[2]", "suggest", "--index", idx.root,
               "--q", "alhpa", "--size", "3"])
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(l) for l in out if l.startswith("{")]
    assert rc == 0 and rows
    want = idx.suggest("alhpa", size=3)
    assert [r["suggestion"] for r in rows] == \
        want["suggestion"].tolist()
