"""Analyzer golden cases + fixture determinism + oracle sanity (no Spark)."""
import numpy as np
import pandas as pd

from sparkfts.analyzer import TokenizerConfig, tokenize_series, tokenize_text
from sparkfts.fixtures import make_transcripts
from sparkfts.oracle import BM25Oracle


def test_tokenizer_golden():
    assert tokenize_text("Hello, World! 42") == ["hello", "world", "42"]
    assert tokenize_text("  a--b__c  ") == ["a", "b", "c"]  # _ is non-alnum here
    assert tokenize_text("") == []
    assert tokenize_text("...!!!") == []
    assert tokenize_text("MiXeD CaSe") == ["mixed", "case"]


def test_tokenizer_series_vectorized_matches_single():
    texts = pd.Series(["Alpha beta", "", None, "x,y;z", "Héllo wörld"])
    out = tokenize_series(texts)
    assert out.iloc[0] == ["alpha", "beta"]
    assert out.iloc[1] == [] and out.iloc[2] == []
    assert out.iloc[3] == ["x", "y", "z"]
    # default ASCII-alnum split treats accented chars as delimiters
    assert out.iloc[4] == ["h", "llo", "w", "rld"]


def test_tokenizer_unicode_mode():
    cfg = TokenizerConfig(pattern=r"\w+", split=False)
    assert tokenize_text("Héllo wörld", cfg) == ["héllo", "wörld"]


def test_fixture_deterministic_and_shaped():
    a = make_transcripts(20, seed=42)
    b = make_transcripts(20, seed=42)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["conv_id", "turn_idx", "role", "text",
                               "tool", "ts"]
    assert a["turn_idx"].dtype == np.int32
    # multi-turn: (conv_id, turn_idx) unique, contiguous from 0
    g = a.groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.size()).all()
    # zipfian head exists: some term df is much larger than median
    toks = tokenize_series(a["text"]).explode().dropna()
    vc = toks.value_counts()
    assert vc.iloc[0] > 20 * vc.median()


def test_oracle_basic_ranking():
    docs = pd.Series(["apple banana", "apple apple apple", "banana cherry",
                      "apple banana cherry dates eggs figs grapes"])
    o = BM25Oracle(np.arange(4), docs)
    top = o.topk("apple", k=4)
    # doc 1 (tf=3, short) must outrank doc 0 (tf=1) and doc 3 (tf=1, long)
    assert top["docid"].iloc[0] == 1
    assert set(top["docid"]) == {0, 1, 3}
    both = o.topk("apple banana", k=4, mode="and")
    assert set(both["docid"]) == {0, 3}
    empty = o.topk("zzz-not-present", k=4)
    assert len(empty) == 0
    # absent term in AND → empty
    assert len(o.topk("apple zzzz", k=4, mode="and")) == 0


def test_oracle_tie_break_by_docid():
    docs = pd.Series(["same text here", "same text here", "other words x"])
    o = BM25Oracle(np.array([7, 3, 5]), docs)
    top = o.topk("same", k=2)
    assert top["docid"].tolist() == [3, 7]  # equal scores → docid asc
