"""Randomized end-to-end property check (SURVEY §5 #2, strengthened):
on seeded-random corpora — random vocab, Zipf-ish repetition, empty and
punctuation-only docs — EVERY query surface (wand / exact, or / and,
distributed / local) must be rank-identical to the brute-force BM25
oracle for random queries that mix present, absent, and duplicate
terms. One build per seed; many queries amortize it."""
import numpy as np
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.oracle import BM25Oracle

VOCAB = ([f"w{i}" for i in range(25)]
         + ["the", "and", "alpha", "beta", "gamma"])


def _random_corpus(rng, n_docs):
    rows = []
    for i in range(n_docs):
        roll = rng.random()
        if roll < 0.05:
            text = ""                      # empty doc
        elif roll < 0.10:
            text = "!!! ... ???"           # punctuation-only
        else:
            n = int(rng.integers(1, 40))
            # Zipf-ish: low vocab ids drawn more often
            ids = (rng.zipf(1.3, size=n) - 1) % len(VOCAB)
            text = " ".join(VOCAB[j] for j in ids)
        rows.append((f"c{i // 3:04d}", i % 3, "user", text, None, None))
    import pandas as pd
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                       "text", "tool", "ts"])


def _random_queries(rng, n_q):
    out = []
    for _ in range(n_q):
        n = int(rng.integers(1, 5))
        terms = list(rng.choice(VOCAB + ["zzznothere"], size=n))
        if rng.random() < 0.3 and terms:
            terms.append(terms[0])         # duplicate query term
        out.append(" ".join(terms))
    return out


@pytest.mark.parametrize("seed", [11, 37, 59])
def test_all_surfaces_match_oracle_on_random_corpus(
        spark, tmp_path_factory, seed):
    rng = np.random.default_rng(seed)
    pdf = _random_corpus(rng, n_docs=45)
    root = str(tmp_path_factory.mktemp(f"prop_{seed}"))
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=3, partitions=3))
    idx = FTSIndex(spark, root)
    srt = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle = BM25Oracle(np.arange(len(srt), dtype=np.int64), srt["text"])
    assert idx.N == oracle.N and idx.avgdl == pytest.approx(oracle.avgdl)

    queries = {f"q{i}_{mode}": (q, mode)
               for i, q in enumerate(_random_queries(rng, 12))
               for mode in ("or", "and")}
    # distributed surfaces via the batched path: 2 Spark jobs total
    # (and topk_many itself gets oracle coverage for free)
    got_w = idx.topk_many(queries, k=7, method="wand")
    got_e = idx.topk_many(queries, k=7, method="exact")
    for qid, (q, mode) in queries.items():
        want = oracle.topk(q, k=7, mode=mode)
        got_l = idx.topk_local(q, k=7, mode=mode)
        for name, got in [("wand", got_w[qid]), ("exact", got_e[qid]),
                          ("local", got_l)]:
            assert got["docid"].tolist() == want["docid"].tolist(), \
                (seed, q, mode, name)
            assert got["score"].to_numpy() == pytest.approx(
                want["score"].to_numpy(), abs=1e-9), (seed, q, mode, name)
