"""Text analysis operators: token counting, quality scoring, language
ID, fingerprinting, winnowing. All pure Spark built-ins (JVM-side,
codegen'd) with exact ANSI-SQL equivalents — including the winnowing
fingerprint, whose md5-based k-gram hashes are engine-portable.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

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


def bpe_token_estimate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic BPE-ish token-count estimate without a tokenizer
    model (the 'how many LLM tokens is this corpus' pipeline stat):
    split into GPT-2-style pieces — letter runs, digit runs, single
    non-alnum marks, whitespace dropped — then charge ceil(len/4)
    subwords per letter run (the ~4-chars/token rule of thumb) and 1 per
    digit/punct piece. Pure JVM built-ins with an exact SQL oracle.
    Returns (doc_id, n_pieces, n_bpe_est)."""
    pieces = F.expr(
        f"regexp_extract_all({text_col}, "
        "'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)")
    est = F.aggregate(
        pieces, F.lit(0).cast("long"),
        lambda acc, p: acc + F.when(
            p.rlike("^[a-zA-Z]"),
            F.ceil(F.length(p) / 4.0)).otherwise(F.lit(1)).cast("long"))
    return df.select("doc_id",
                     F.size(pieces).cast("long").alias("n_pieces"),
                     est.alias("n_bpe_est"))


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


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        kgram: int = 5, window: int = 4) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03): hash every token k-gram,
    keep the min hash of each sliding window of ``window`` k-grams
    (rightmost position on ties) → positional fingerprint set
    (doc_id, fp_hash, fp_pos).

    100% JVM built-ins — zero Python in the hot path (the r01 version
    ran a per-character Python rolling hash inside mapInPandas):
    - k-gram hash = first 15 hex chars of md5 of the space-joined tokens
      (fixed-width hex compares lexicographically == numerically, and
      md5 is engine-portable, so the whole operator has an exact ANSI-SQL
      oracle);
    - per-window rightmost-min via min(struct(h, -p)) over a
      rows-between(0, window-1) frame;
    - docs with fewer than ``window`` k-grams form a single window
      (rightmost-on-ties there too).
    One shuffle (window partition by doc_id); fan-out bounded by tokens
    per doc."""
    from pyspark.sql import Window as W
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    kgrams = F.when(
        F.size(toks) >= kgram,
        F.transform(F.sequence(F.lit(1), F.size(toks) - kgram + 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, kgram)))
    ).otherwise(F.array().cast("array<string>"))
    kg = (df.select("doc_id", F.posexplode(kgrams).alias("p", "kg"))
          .withColumn("h", F.substring(
              F.md5(F.encode(F.col("kg"), "UTF-8")), 1, 15))
          .withColumn("n", F.count("*").over(W.partitionBy("doc_id"))))
    frame = (W.partitionBy("doc_id").orderBy("p")
             .rowsBetween(0, window - 1))
    sel = F.min(F.struct(F.col("h"), (-F.col("p")).alias("np"))).over(frame)
    # materialize the window result BEFORE filtering to valid window
    # starts — filtering first would shrink the trailing frames (the
    # filter would be pushed below the window operator)
    kg = kg.withColumn("s", sel)
    return (kg.where((F.col("p") <= F.col("n") - window)
                     | ((F.col("n") < window) & (F.col("p") == 0)))
            .select("doc_id", F.col("s.h").alias("fp_hash"),
                    (-F.col("s.np")).cast("int").alias("fp_pos"))
            .distinct())


def _ngram_col(n: int):
    """Array<string> of word n-grams from the analyzer tokens of `toks`
    (guarded: size < n → empty array; the unguarded sequence(0, size-n)
    would flip to a DESCENDING sequence for short docs)."""
    joiner = " "
    parts = [f"element_at(toks, i + {j + 1})" for j in range(n)]
    return F.expr(
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(0, size(toks) - {n}), "
        f"i -> concat_ws('{joiner}', {', '.join(parts)})) "
        f"ELSE array() END")


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher / MassiveText
    quality-filter family, Rae et al. 2021 §A1.1), token-level:

      dup_token_frac  = 1 - distinct_tokens / n_tokens  (0 if empty)
      top2gram_frac   = count(mode 2-gram) / n_2grams   (0 if none)
      top3gram_frac   = count(mode 3-gram) / n_3grams   (0 if none)

    High values flag boilerplate/spam documents that a pretraining
    curation pass drops. One explode→two-level aggregation per n-gram
    order — shuffle keys are (doc_id, gram), so partial aggregation
    combines map-side and hot documents cannot skew a reducer beyond
    their own gram multiset. Exact SQL oracle (gate dp_repetition)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    base = df.select("doc_id", toks.alias("toks"))

    def top_frac(n: int, name: str) -> DataFrame:
        return (base.select("doc_id",
                            F.explode(_ngram_col(n)).alias("g"))
                .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
                .groupBy("doc_id")
                .agg((F.max("c") / F.sum("c")).alias(name)))

    tok_stats = base.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long")
         .alias("n_distinct_tokens"))
    out = (tok_stats
           .join(top_frac(2, "_t2"), "doc_id", "left")
           .join(top_frac(3, "_t3"), "doc_id", "left"))
    dup = F.when(F.col("n_tokens") > 0,
                 1.0 - F.col("n_distinct_tokens")
                 / F.col("n_tokens").cast("double")).otherwise(0.0)
    return out.select(
        "doc_id", "n_tokens", "n_distinct_tokens",
        F.round(dup, 6).alias("dup_token_frac"),
        F.round(F.coalesce(F.col("_t2"), F.lit(0.0)), 6)
         .alias("top2gram_frac"),
        F.round(F.coalesce(F.col("_t3"), F.lit(0.0)), 6)
         .alias("top3gram_frac"))
