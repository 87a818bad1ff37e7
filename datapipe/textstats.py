"""Text analysis operators: token counting, quality scoring, language
ID, fingerprinting. All pure Spark built-ins (JVM-side, codegen'd) with
exact ANSI-SQL equivalents; the rolling-hash winnowing fingerprint is
the one numpy/pandas-UDF member (positional semantics don't map to SQL).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

STOPWORDS = ["a", "the", "and", "or", "of", "to", "in", "is", "it", "on"]

# tiny deterministic per-language marker lists (public stopwords)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de0", "shi4", "le0", "zai4", "he2"],  # pinyin-ish placeholders
}


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars_seen): whitespace/punct token count via
    the shared analyzer split — JVM regexp, no UDF."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    return df.select("doc_id",
                     F.size(toks).cast("long").alias("n_tokens"),
                     F.length(text_col).cast("long").alias("n_chars"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: token count, mean token length,
    punctuation ratio, stopword ratio, and a composite score in [0,1].
    score = 0.4·len_ok + 0.3·(1 - punct_ratio) + 0.3·(1 - stop_ratio)
    with len_ok = min(n_tokens, 50)/50."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    n_tok = F.size(toks)
    n_alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)),
                                        "[^a-z0-9]", ""))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    len_ok = F.least(n_tok.cast("double"), F.lit(50.0)) / 50.0
    punct_ratio = punct / F.greatest(F.length(text_col), F.lit(1)).cast("double")
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1)).cast("double")
    return df.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(n_alnum / F.greatest(n_tok, F.lit(1)), 6).alias("mean_tok_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(0.4 * len_ok + 0.3 * (1 - punct_ratio)
                + 0.3 * (1 - stop_ratio), 6).alias("quality"))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language heuristic: score(lang) = count of that
    language's marker tokens; predict argmax (ties → 'en' first by the
    fixed language order en,de,es,fr,zh; all-zero → 'und')."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    scores = []
    for lang in ["en", "de", "es", "fr", "zh"]:
        arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append((lang, F.size(F.filter(
            toks, lambda t: F.array_contains(arr, t)))))
    best = F.greatest(*[F.struct(s.alias("s"),
                                 F.lit(-i).alias("negord"))
                        for i, (lang, s) in enumerate(scores)])
    langs = [lang for lang, _ in scores]
    pred = F.when(best.getField("s") == 0, F.lit("und"))
    arr = F.array(*[F.lit(x) for x in langs])
    pred = pred.otherwise(F.element_at(arr, -best.getField("negord") + 1))
    return df.select("doc_id", pred.alias("pred_lang"),
                     best.getField("s").cast("long").alias("marker_hits"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization-invariant document fingerprint: md5 of
    lowercase text with whitespace runs collapsed and trimmed."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select("doc_id",
                     F.md5(F.encode(norm, "UTF-8")).alias("fingerprint"))


WINNOW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("fp_hash", T.LongType()),
    T.StructField("fp_pos", T.IntegerType()),
])


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        kgram: int = 5, window: int = 4) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03): rolling polynomial hash
    over token k-grams, keep the min hash of each sliding window
    (rightmost on ties) → positional fingerprint set. Vectorized numpy
    inside mapInPandas — positional semantics, so no SQL oracle (the
    driver records a rows-only check); pytest covers the invariants."""
    B, M = np.int64(1_000_003), np.int64((1 << 61) - 1)

    def run(batches):
        for pdf in batches:
            out_id, out_h, out_p = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = [t for t in
                        pd.Series([text]).str.lower()
                          .str.split("[^a-z0-9]+", regex=True).iloc[0] if t]
                if len(toks) < kgram:
                    continue
                th = np.array([hash_token(t) for t in toks], dtype=np.int64)
                n = len(th) - kgram + 1
                kh = np.zeros(n, dtype=np.int64)
                for j in range(kgram):  # kgram is tiny (5): fixed loop
                    kh = (kh * B + th[j:j + n]) % M
                if n < window:
                    sel = np.array([int(np.argmin(kh))])
                else:
                    w = np.lib.stride_tricks.sliding_window_view(kh, window)
                    sel = np.unique(w.shape[1] - 1 - np.argmin(w[:, ::-1],
                                                               axis=1)
                                    + np.arange(w.shape[0]))
                out_id.extend([doc_id] * len(sel))
                out_h.extend(kh[sel].tolist())
                out_p.extend(sel.tolist())
            yield pd.DataFrame({"doc_id": out_id, "fp_hash": out_h,
                                "fp_pos": out_p})

    def hash_token(t: str) -> int:
        h = np.int64(5381)
        for ch in t.encode("utf-8"):
            h = (h * np.int64(33) + np.int64(ch)) % M
        return int(h)

    return df.select("doc_id", text_col).mapInPandas(run, WINNOW_SCHEMA)
