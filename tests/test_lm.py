"""N-gram LM perplexity quality filter (datapipe.lm, the CCNet
analog): trained counts, additive-smoothed bigram scoring, and the
keep decision all equal an independent pure-Python recompute."""
import math

import numpy as np
import pandas as pd
import pytest

from datapipe.lm import UNK, lm_quality, lm_score, train_ngram_lm

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the rat"),
    (2, "dogs chase cats and cats chase rats"),
    (3, "xqzt"),                      # single token: no perplexity
    (4, ""),                          # empty: no tokens at all
    (5, "the the the the"),           # degenerate repetition
    (6, "on the mat sat a cat, ON THE MAT!"),   # case/punct folding
]


def _tok(t):
    import re
    return [w for w in re.split("[^a-z0-9]+", t.lower())
            if w and len(w) <= 64]


def _ref_model(texts, vocab_size, alpha):
    from collections import Counter
    uni = Counter()
    for t in texts:
        uni.update(_tok(t))
    top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = [t for t, _ in top[:vocab_size]]
    vset = set(vocab)
    c1 = {t: c for t, c in uni.items() if t in vset}
    c1[UNK] = sum(uni.values()) - sum(c1.values())
    c2 = Counter()
    for t in texts:
        m = [w if w in vset else UNK for w in _tok(t)]
        c2.update(zip(m, m[1:]))
    return vset, c1, dict(c2), alpha


def _ref_score(text, ref):
    vset, c1, c2, alpha = ref
    vp = len(vset) + 1
    m = [w if w in vset else UNK for w in _tok(text)]
    lp = sum(math.log((c2.get((u, w), 0) + alpha)
                      / (c1[u] + alpha * vp))
             for u, w in zip(m, m[1:]))
    n = len(m)
    ppl = math.exp(-lp / (n - 1)) if n >= 2 else None
    return n, lp, ppl


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_train_matches_reference_counts(docs_df):
    model = train_ngram_lm(docs_df, vocab_size=5, alpha=0.5)
    vset, c1, c2, _ = _ref_model([t for _, t in DOCS], 5, 0.5)
    assert set(model["vocab"]) == vset
    assert model["c1"] == c1
    assert model["c2"] == c2
    # unk absorbed the out-of-vocab mass
    assert model["c1"][UNK] > 0


def test_score_matches_reference(docs_df):
    model = train_ngram_lm(docs_df, vocab_size=5, alpha=0.5)
    ref = _ref_model([t for _, t in DOCS], 5, 0.5)
    got = (lm_score(docs_df, model).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    for row in got.itertuples():
        n, lp, ppl = _ref_score(DOCS[row.doc_id][1], ref)
        assert row.n_tokens == n, row
        assert abs(row.logprob - lp) < 1e-9, row
        if ppl is None:
            assert pd.isna(row.perplexity), row
        else:
            assert abs(row.perplexity - ppl) < 1e-9, row


def test_quality_keep_decision(docs_df):
    model = train_ngram_lm(docs_df, vocab_size=5, alpha=0.5)
    got = (lm_quality(docs_df, model, max_ppl=12.0).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    ref = _ref_model([t for _, t in DOCS], 5, 0.5)
    for row in got.itertuples():
        _, _, ppl = _ref_score(DOCS[row.doc_id][1], ref)
        assert row.keep == (ppl is not None and ppl <= 12.0), row
    # fluent repeats of in-vocab bigrams score better than junk
    assert bool(got.loc[got.doc_id == 5, "keep"].iloc[0]) is True
    assert pd.isna(got.loc[got.doc_id == 3, "perplexity"].iloc[0])


def test_min_bigram_count_prunes_to_smoothing_floor(docs_df):
    full = train_ngram_lm(docs_df, vocab_size=5, alpha=0.5)
    pruned = train_ngram_lm(docs_df, vocab_size=5, alpha=0.5,
                            min_bigram_count=2)
    assert set(pruned["c2"]) == {k for k, c in full["c2"].items()
                                 if c >= 2}
    # pruned bigrams fall back to the smoothing floor — scores change
    # only for docs that used a pruned bigram, and only downward
    a = lm_score(docs_df, full).toPandas().set_index("doc_id")
    b = lm_score(docs_df, pruned).toPandas().set_index("doc_id")
    assert (b["logprob"] <= a["logprob"] + 1e-12).all()
