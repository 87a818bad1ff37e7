"""Corpus curation operators for LLM training pipelines: benchmark
decontamination (n-gram overlap), PII redaction, and deterministic
hash-based (stratified) sampling.

All operators are pure Spark built-ins (JVM-side, codegen'd) built on
engine-portable primitives (md5, regexps shared by Java regex and RE2),
so each has an exact ANSI-SQL oracle.

Scale notes (100 TB):
- decontamination: benchmark n-gram sets are small (benchmarks are
  ~10^4-10^6 grams) → broadcast semi-join against the exploded corpus
  grams; one shuffle on the gram hash only if the benchmark outgrows
  the broadcast threshold (Spark picks via AQE).
- sampling: a pure map-side filter (hash threshold) — no shuffle, no
  RNG state, reproducible on any executor layout, composes with
  partition pruning.
- redaction: regexp_replace chains are whole-stage-codegen'd; no UDF.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Contamination n-gram size: 13 tokens is the de-facto standard from the
# GPT-3 appendix-C / PaLM data-contamination methodology (public papers).
DECONTAM_N = 13

# Redaction patterns, applied IN ORDER (emails contain digits, so email
# must run before the long-number rule). Each pattern is valid and
# equivalent in Java regex (Spark) and RE2 (DuckDB): no backrefs, no
# lookaround.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("longnum", r"\b\d{7,}\b", "<NUMBER>"),
]


def _grams(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct (doc_id, gram-hash) pairs: md5 of the space-joined
    n-token window over the shared analyzer split. Docs shorter than n
    tokens contribute no grams (nothing to match exactly)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - n + 1),
                    lambda i: F.md5(F.encode(
                        F.concat_ws(" ", F.slice(toks, i, n)), "UTF-8")))
    ).otherwise(F.array().cast("array<string>"))
    return (df.select("doc_id", F.explode(grams).alias("g"))
            .distinct())


def contamination(corpus: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", n: int = DECONTAM_N) -> DataFrame:
    """Benchmark-contamination report: for each corpus doc sharing at
    least one n-token gram with ANY benchmark doc, the count of distinct
    shared grams. Returns (doc_id, n_hits), contaminated docs only.

    The benchmark gram set is deduped before the join; Spark broadcasts
    it when small (the common case — benchmarks are tiny next to a
    training corpus)."""
    cg = _grams(corpus, text_col, n)
    bg = _grams(benchmark, text_col, n).select("g").distinct()
    return (cg.join(bg, "g")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hits")))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  text_col: str = "text",
                  n: int = DECONTAM_N) -> DataFrame:
    """Corpus with every contaminated doc removed (left-anti join on the
    contamination report) — the standard pre-training hygiene step."""
    bad = contamination(corpus, benchmark, text_col, n).select("doc_id")
    return corpus.join(bad, "doc_id", "left_anti")


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails / IPv4 addresses / long digit runs with typed
    placeholder tokens; count replacements per category. Returns
    (doc_id, text_redacted, n_email, n_ipv4, n_longnum). Patterns are
    applied in PII_PATTERNS order (counts are computed on the text as
    each pattern sees it, mirroring the sequential replace)."""
    out = df.select("doc_id", F.col(text_col).alias("_t0"))
    cols = []
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(f"_t{i}"), F.lit(pat),
                                        F.lit(0))).cast("long"))
        out = out.withColumn(f"_t{i + 1}",
                             F.regexp_replace(F.col(f"_t{i}"), pat, repl))
        cols.append(f"n_{name}")
    last = f"_t{len(PII_PATTERNS)}"
    return out.select("doc_id", F.col(last).alias("text_redacted"), *cols)


def _frac_hex(fraction: float) -> str:
    """fraction → 15-char hex cutoff: fixed-width hex compares
    lexicographically == numerically, so the keep test is a plain string
    comparison in ANY engine (no 64-bit unsigned anywhere)."""
    return format(min(max(int(fraction * (16 ** 15)), 0), 16 ** 15 - 1),
                  "015x")


def _key_hash(key_col: str, seed: int):
    return F.substring(F.md5(F.encode(F.concat(
        F.lit(f"{seed}:"), F.col(key_col).cast("string")), "UTF-8")),
        1, 15)


def hash_sample(df: DataFrame, fraction: float, seed: int = 42,
                key_col: str = "doc_id") -> DataFrame:
    """Deterministic sample: keep rows where the first 15 hex chars of
    md5('<seed>:'||key) — uniform over 16^15 — fall below the fraction
    cutoff. No RNG state, identical on any executor layout or engine
    (a property .sample() does NOT have), pure map-side filter that
    composes with partition pruning."""
    return df.where(_key_hash(key_col, seed) < F.lit(_frac_hex(fraction)))


def stratified_hash_sample(df: DataFrame, fractions: dict[str, float],
                           strata_col: str, seed: int = 42,
                           key_col: str = "doc_id") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downweight a dominant
    source): fractions maps stratum value → keep fraction; strata
    absent from the map are dropped. Same hash rule as hash_sample."""
    cut = F.element_at(
        F.create_map(*[x for k, v in fractions.items()
                       for x in (F.lit(k), F.lit(_frac_hex(v)))]),
        F.col(strata_col).cast("string"))
    return df.where(cut.isNotNull() & (_key_hash(key_col, seed) < cut))


def clean_corpus(df: DataFrame, text_col: str = "text",
                 span_min_len: int = 10,
                 min_tokens: int = 5) -> DataFrame:
    """End-to-end curation recipe composing the pipeline's own stages —
    the order real pretraining pipelines use:

    1. exact dedup (keep the min-doc_id survivor per content hash);
    2. ExactSubstr span cleaning over the SURVIVORS (duplicated-window
       counts are computed on the deduped corpus, so a phrase that was
       only duplicated because the whole doc was copied is not
       over-stripped);
    3. drop docs left with fewer than ``min_tokens`` kept tokens.

    Returns (doc_id, clean_text, kept_tokens). Every stage is a
    composition of the individually-gated operators, so the whole
    recipe keeps an exact SQL oracle."""
    from .dedup import dedup_corpus, strip_duplicate_spans
    survivors = dedup_corpus(df, text_col=text_col)
    stripped = strip_duplicate_spans(survivors, text_col=text_col,
                                     min_len=span_min_len)
    return (stripped.where(F.col("kept_tokens") >= int(min_tokens))
                    .select("doc_id", "clean_text", "kept_tokens"))
