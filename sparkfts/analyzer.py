"""Text analysis: tokenizer configuration + vectorized implementations.

The reference delegates analysis entirely to embedded Elasticsearch's
standard analyzer via the index-template hook (BaseESReducer.java:107-114;
README.md:7 — "changes to analyzers & tokenizers are rolled out ... every
night"). Our analog is a small config object ("the template") plus a
vectorized pandas implementation used identically at build time and query
time. No per-row Python: tokenization is pandas `str` ops over Series.

The default pattern lowercases and splits on runs of non-alphanumerics —
chosen so an ANSI-SQL oracle (DuckDB `string_split_regex(lower(text),
'[^a-z0-9]+')`) can reproduce it exactly for the correctness gate. A
Unicode word pattern is available via ``TokenizerConfig(pattern=r"\\w+",
split=False)``.
"""
from __future__ import annotations

from dataclasses import dataclass

import pandas as pd


@dataclass(frozen=True)
class TokenizerConfig:
    """Analyzer 'template' (the reference's getTemplate() analog)."""
    pattern: str = "[^a-z0-9]+"   # split pattern (or match pattern if split=False)
    split: bool = True            # True: pattern is a delimiter regex
    lowercase: bool = True
    min_len: int = 1
    max_len: int = 64


DEFAULT = TokenizerConfig()


def tokenize_series(texts: pd.Series, cfg: TokenizerConfig = DEFAULT) -> pd.Series:
    """Series[str] -> Series[list[str]], vectorized."""
    s = texts.fillna("").astype(str)
    if cfg.lowercase:
        s = s.str.lower()
    if cfg.split:
        toks = s.str.split(cfg.pattern, regex=True)
    else:
        toks = s.str.findall(cfg.pattern)
    # drop empties / length-filter without a per-row Python lambda:
    # explode -> filter -> regroup is done by callers that need flat tokens;
    # here we use a list comprehension only at the list level (cheap relative
    # to string work, and pandas has no vectorized list filter).
    lo, hi = cfg.min_len, cfg.max_len
    return toks.map(lambda ts: [t for t in ts if lo <= len(t) <= hi])


def tokenize_text(text: str, cfg: TokenizerConfig = DEFAULT) -> list[str]:
    """Single-string convenience (query side)."""
    return tokenize_series(pd.Series([text]), cfg).iloc[0]


def jvm_tokens(col, cfg: TokenizerConfig = DEFAULT):
    """Tokenizer as a pure Catalyst expression (whole-stage codegen, no
    Python worker in the hot path) when the config is JVM-expressible:
    lowercase + regex-delimiter split + length bounds. Returns a Column
    of array<string>, or None when the config needs the pandas path
    (e.g. match-mode Unicode patterns). Must stay semantically identical
    to tokenize_series — pinned by tests/test_analyzer.py."""
    if not cfg.split:
        return None
    from pyspark.sql import functions as F
    c = F.lower(col) if cfg.lowercase else col
    toks = F.split(c, cfg.pattern)
    lo, hi = cfg.min_len, cfg.max_len
    return F.filter(toks, lambda t: (F.length(t) >= lo) & (F.length(t) <= hi))
