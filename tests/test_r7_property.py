"""Randomized property checks for the round-7 kernels: sloppy phrase
(windowed start-key vote) and bool must+should (pruned conjunction +
required mask) against independent brute references on seeded-random
corpora — random vocab with heavy repetition so window edge cases
(adjacent duplicate occurrences, multi-occurrence slots, transposed
orders) occur organically."""
from itertools import product

import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import tokenize_text

VOCAB = [f"w{i}" for i in range(12)]    # tiny vocab → dense repeats


def _corpus(rng, n_docs):
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(1, 30))
        ids = (rng.zipf(1.4, size=n) - 1) % len(VOCAB)
        rows.append((f"c{i:04d}", 0, "user",
                     " ".join(VOCAB[j] for j in ids), None, None))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                       "text", "tool", "ts"])


def _sloppy_match(tokens, phrase, slop):
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


@pytest.mark.slow
@pytest.mark.parametrize("seed", [101, 211])
def test_sloppy_phrase_matches_brute_on_random_corpus(
        spark, tmp_path_factory, seed):
    rng = np.random.default_rng(seed)
    pdf = _corpus(rng, 40)
    root = str(tmp_path_factory.mktemp(f"sp_{seed}"))
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=2, partitions=2))
    idx = FTSIndex(spark, root)
    store = idx._docstore.toPandas()
    toks = store["text"].map(
        lambda t: tokenize_text(t, idx.tokenizer))
    checked = 0
    for _ in range(10):
        L = int(rng.integers(2, 4))
        phrase = list(rng.choice(VOCAB[:6], size=L, replace=False))
        slop = int(rng.integers(0, 4))
        want = {int(d) for d, tl in zip(store["docid"], toks)
                if _sloppy_match(tl, phrase, slop)}
        got = set(idx.phrase_topk_local(" ".join(phrase), k=10 ** 9,
                                        slop=slop)["docid"])
        assert got == want, (seed, phrase, slop)
        checked += len(want)
    assert checked > 0                       # fixture sanity


@pytest.mark.slow
@pytest.mark.parametrize("seed", [307, 401])
def test_bool_must_matches_brute_on_random_corpus(
        spark, tmp_path_factory, seed):
    rng = np.random.default_rng(seed)
    pdf = _corpus(rng, 40)
    root = str(tmp_path_factory.mktemp(f"bm_{seed}"))
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=2, partitions=2))
    idx = FTSIndex(spark, root)
    store = idx._docstore.toPandas()
    toksets = store["text"].map(
        lambda t: set(tokenize_text(t, idx.tokenizer)))
    nonempty = 0
    for _ in range(8):
        n_m = int(rng.integers(1, 3))
        n_s = int(rng.integers(1, 3))
        picks = list(rng.choice(VOCAB, size=n_m + n_s, replace=False))
        musts, shoulds = picks[:n_m], picks[n_m:]
        union_q = " ".join(sorted(set(picks)))
        full = idx.topk_pandas(union_q, k=10 ** 9, mode="or",
                               method="exact")
        keep = {int(d) for d, s in zip(store["docid"], toksets)
                if set(musts) <= s}
        want = (full[full["docid"].isin(keep)].head(7)
                .reset_index(drop=True))
        for method in ("wand", "exact"):
            got = idx.topk_pandas(" ".join(shoulds), k=7, mode="or",
                                  method=method, must=" ".join(musts))
            assert got["docid"].tolist() == want["docid"].tolist(), \
                (seed, musts, shoulds, method)
            np.testing.assert_allclose(got["score"], want["score"],
                                       atol=1e-9)
        loc = idx.topk_local(" ".join(shoulds), k=7, mode="or",
                             must=" ".join(musts))
        assert loc["docid"].tolist() == want["docid"].tolist()
        nonempty += len(want)
    assert nonempty > 0
