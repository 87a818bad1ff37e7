"""N-gram language-model quality filtering — the CCNet-style
perplexity filter (Wenzek et al. 2020, public method): train a small
LM on (a sample of) the corpus, score every document's perplexity
under it, keep the low-perplexity (fluent) tail. Here the LM is an
interpolation-free additive-smoothed BIGRAM model, chosen so both the
training counts and the scoring formula are exactly expressible in
ANSI SQL — the whole pipeline (train + score) has a value-checkable
DuckDB oracle, stronger than a recount pin.

Definitions (shared with the oracle):

- tokens: lower, split on [^a-z0-9]+, drop empty and >64-char tokens,
  positions over the FILTERED sequence.
- vocab: top ``vocab_size`` tokens by (count DESC, token ASC); every
  other token maps to ``<unk>`` BEFORE any counting, so c1(<unk>) =
  total - sum(vocab counts).
- bigram counts c2(u, w) over adjacent mapped tokens within each doc.
- P(w | u) = (c2(u, w) + a) / (c1(u) + a * (V + 1)), a = ``alpha``,
  V+1 = vocab size including <unk> (additive smoothing; unseen
  bigrams cost a / (c1(u) + a(V+1))).
- per-doc: logprob = sum over transitions i=2..n of ln P;
  perplexity = exp(-logprob / (n-1)); docs with < 2 tokens score
  logprob 0 and NULL perplexity.

Scale shape: training is ONE tokenize pass feeding two aggregations
(unigram groupBy; bigram pairs emitted by an Arrow-batched mapInPandas
— no per-doc window/shuffle — then groupBy). The model collects to the
driver bounded by vocab_size and ``min_bigram_count`` (raise it at
corpus scale: dropped bigrams just fall back to the smoothing floor)
and broadcasts into the vectorized scorer (pandas .map over the
batch's concatenated pair keys + np.add.reduceat segment sums — no
per-row Python)."""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

UNK = "<unk>"
TOKEN_SPLIT = "[^a-z0-9]+"


def _tok_lists(texts: pd.Series) -> list[list[str]]:
    import re
    rx = re.compile(TOKEN_SPLIT)
    out = []
    for t in texts.fillna(""):
        out.append([w for w in rx.split(t.lower())
                    if w and len(w) <= 64])
    return out


def _toks_df(df: DataFrame, text_col: str) -> DataFrame:
    toks = F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                    lambda t: (t != "") & (F.length(t) <= 64))
    return df.select("doc_id", toks.alias("toks"))


def train_ngram_lm(df: DataFrame, text_col: str = "text",
                   vocab_size: int = 1000, alpha: float = 0.5,
                   min_bigram_count: int = 1) -> dict:
    """One distributed gram-count pass over the corpus → a broadcastable
    model dict {vocab, alpha, c1, c2}. Deterministic: vocab ties break
    on token ASC; counts are exact integers."""
    toks = _toks_df(df, text_col)
    uni = (toks.select(F.explode("toks").alias("term"))
           .groupBy("term").agg(F.count("*").alias("c")))
    total = uni.agg(F.sum("c")).collect()[0][0] or 0
    top = (uni.orderBy(F.desc("c"), F.asc("term"))
           .limit(int(vocab_size)).collect())
    vocab = {r["term"]: int(r["c"]) for r in top}
    c1 = dict(vocab)
    c1[UNK] = int(total) - sum(vocab.values())
    vset = set(vocab)

    def pairs_pd(it):
        for pdf in it:
            us, ws = [], []
            for tl in _tok_lists(pdf[text_col]):
                m = [w if w in vset else UNK for w in tl]
                us.extend(m[:-1])
                ws.extend(m[1:])
            yield pd.DataFrame({"u": us, "w": ws})

    c2_rows = (df.select(text_col)
               .mapInPandas(pairs_pd, schema="u string, w string")
               .groupBy("u", "w").agg(F.count("*").alias("c"))
               .where(F.col("c") >= int(min_bigram_count))
               .collect())
    c2 = {(r["u"], r["w"]): int(r["c"]) for r in c2_rows}
    return {"vocab": sorted(vset), "alpha": float(alpha),
            "c1": c1, "c2": c2}


def lm_score(df: DataFrame, model: dict,
             text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, logprob, perplexity) under the model —
    Arrow-batched vectorized scoring (broadcast model; pandas .map
    lookups + reduceat segment sums)."""
    alpha = float(model["alpha"])
    vp = len(model["vocab"]) + 1
    vset = frozenset(model["vocab"])
    c1 = dict(model["c1"])
    c2 = {f"{u}\x00{w}": c for (u, w), c in model["c2"].items()}
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((vset, c1, c2))

    def score_pd(it):
        vset_, c1_, c2_ = bc.value
        for pdf in it:
            tls = _tok_lists(pdf[text_col])
            ns, segs, keys, us = [], [], [], []
            for tl in tls:
                m = [w if w in vset_ else UNK for w in tl]
                ns.append(len(m))
                segs.append(max(0, len(m) - 1))
                keys.extend(f"{u}\x00{w}" for u, w in zip(m, m[1:]))
                us.extend(m[:-1])
            kc = pd.Series(keys, dtype=object).map(c2_).fillna(0.0) \
                .to_numpy(np.float64)
            uc = pd.Series(us, dtype=object).map(c1_) \
                .to_numpy(np.float64)
            lp_all = np.log((kc + alpha) / (uc + alpha * vp))
            offs = np.zeros(len(tls) + 1, dtype=np.int64)
            np.cumsum(np.asarray(segs, dtype=np.int64), out=offs[1:])
            lp = np.add.reduceat(
                np.concatenate([lp_all, [0.0]]), offs[:-1]
            ) if len(tls) else np.empty(0)
            lp = np.where(np.asarray(segs) == 0, 0.0, lp)
            ntr = np.maximum(np.asarray(segs, dtype=np.float64), 1.0)
            ppl = np.where(np.asarray(segs) == 0, np.nan,
                           np.exp(-lp / ntr))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "n_tokens": np.asarray(ns, dtype=np.int64),
                "logprob": lp,
                "perplexity": ppl})

    out = df.select("doc_id", text_col).mapInPandas(
        score_pd, schema="doc_id long, n_tokens long, logprob double, "
                         "perplexity double")
    # NaN → NULL (docs with < 2 tokens have no perplexity)
    return out.withColumn(
        "perplexity", F.when(F.isnan("perplexity"),
                             F.lit(None)).otherwise(F.col("perplexity")))


def lm_quality(df: DataFrame, model: dict, max_ppl: float,
               text_col: str = "text") -> DataFrame:
    """lm_score + the CCNet keep decision: keep docs whose perplexity
    is defined and <= max_ppl. Returns (doc_id, n_tokens, logprob,
    perplexity, keep)."""
    s = lm_score(df, model, text_col)
    return s.withColumn(
        "keep", (F.col("perplexity").isNotNull()
                 & (F.col("perplexity") <= float(max_ppl))))
