"""Positions + phrase queries: codec roundtrip property and end-to-end
phrase matching vs a naive token-scan oracle."""
import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index, codec
from sparkfts.analyzer import tokenize_series
from sparkfts.fixtures import make_transcripts


def test_positions_roundtrip_blocks():
    rng = np.random.default_rng(11)
    n = 1000  # spans multiple blocks
    docids = np.cumsum(rng.integers(1, 50, n)).astype(np.int64)
    tfs = rng.integers(1, 8, n).astype(np.int64)
    dls = rng.integers(10, 300, n).astype(np.int64)
    pos = np.concatenate([
        np.sort(rng.choice(1000, size=t, replace=False)) for t in tfs
    ]).astype(np.int64)
    enc = codec.encode_postings(docids, tfs, dls, positions=pos)
    d, t, l, p = codec.decode_postings(enc["blob"], enc["block_off"],
                                       enc["block_n"], with_positions=True)
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(p, pos)


@pytest.fixture(scope="module")
def phrase_setup(spark, tmp_path_factory):
    pdf = make_transcripts(30, seed=42)
    root = str(tmp_path_factory.mktemp("phrase_idx"))
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=4, partitions=4))
    corpus = (pdf.sort_values(["conv_id", "turn_idx"])
              .reset_index(drop=True))
    toks = tokenize_series(corpus["text"]).tolist()
    return FTSIndex(spark, root), toks


def naive_phrase_docs(toks, phrase):
    want = phrase.split()
    m = len(want)
    return sorted(
        i for i, ts in enumerate(toks)
        if any(ts[j:j + m] == want for j in range(len(ts) - m + 1)))


@pytest.mark.parametrize("phrase", [
    "rebuild the nightly index snapshot",
    "nightly index",
    "block max wand",
    "alpha",                      # single-term phrase = term query
    "zzz absent phrase",          # no match
    "index nightly",              # reversed → fewer/no matches
])
def test_phrase_matches_naive_scan(phrase_setup, phrase):
    idx, toks = phrase_setup
    got = sorted(r["docid"] for r in
                 idx.phrase_topk(phrase, k=100000).collect())
    assert got == naive_phrase_docs(toks, phrase), phrase


def test_phrase_ranking_is_bm25_with_docid_ties(phrase_setup):
    idx, toks = phrase_setup
    rows = idx.phrase_topk("nightly index", k=10).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # phrase docs are a subset of the AND match set
    and_docs = {r["docid"] for r in
                idx.match_docids("nightly index", "and").collect()}
    assert {r["docid"] for r in rows} <= and_docs
