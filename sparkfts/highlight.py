"""Highlighting / snippets — the ES highlighter analog.

The reference serves its snapshots through Elasticsearch, whose
highlighter re-analyzes the stored field and wraps matched terms in
<em> tags (plain highlighter semantics). Same here: the stored text is
re-tokenized WITH character offsets using the exact analyzer config the
index was built with, the best window of ``window`` consecutive tokens
is chosen (most distinct query terms, then most matches, then earliest
start — the standard fragment scorer shape), and matched tokens are
wrapped in pre/post tags. Everything runs on the top-k hits' fetched
rows (k documents — driver-trivial by design; the distributed part of
a highlighted search is the search, not the decoration).

Offset fidelity: token spans index the ORIGINAL text. For the default
ASCII analyzer, lowercasing is length-preserving, so spans computed on
``text.lower()`` are exact. For exotic configs where ``str.lower()``
changes the string length (e.g. 'İ' → 'i̇'), spans fall back to the
original text with per-token lowercasing — tokens sourced from
length-changing case folds may then differ from the indexed ones; a
display-path edge, documented here.
"""
from __future__ import annotations

import re

import pandas as pd

from .analyzer import DEFAULT, TokenizerConfig


def token_spans(text: str, cfg: TokenizerConfig = DEFAULT
                ) -> list[tuple[str, int, int]]:
    """(token, char_start, char_end) over the original text, matching
    tokenize_text's output token-for-token (pinned by tests)."""
    if text is None:
        return []
    text = str(text)
    low = text.lower() if cfg.lowercase else text
    if len(low) != len(text):
        low = text                       # offset-safety fallback
    spans: list[tuple[int, int]] = []
    if cfg.split:
        pos = 0
        for m in re.finditer(cfg.pattern, low):
            if m.start() > pos:
                spans.append((pos, m.start()))
            pos = m.end()
        if pos < len(low):
            spans.append((pos, len(low)))
    else:
        spans = [(m.start(), m.end())
                 for m in re.finditer(cfg.pattern, low)]
    out = []
    for s, e in spans:
        t = low[s:e]
        if cfg.lowercase and low is text:
            t = t.lower()
        if cfg.min_len <= len(t) <= cfg.max_len:
            out.append((t, s, e))
    return out


def best_window(spans: list[tuple[str, int, int]], qterms: set[str],
                window: int) -> tuple[int, int, list[int]]:
    """(first token idx, last token idx, matched token idxs inside) of
    the best ``window``-token fragment: maximize distinct query terms,
    then total matches, then earliest start. Windows are anchored at
    matched tokens (an unanchored window can never beat an anchored one
    under this ordering)."""
    matched = [i for i, (t, _, _) in enumerate(spans) if t in qterms]
    if not matched:
        return 0, -1, []
    best = None
    for a in matched:
        lo, hi = a, min(a + window, len(spans)) - 1
        inside = [i for i in matched if lo <= i <= hi]
        key = (len({spans[i][0] for i in inside}), len(inside), -lo)
        if best is None or key > best[0]:
            best = (key, lo, hi, inside)
    _, lo, hi, inside = best
    return lo, hi, inside


def make_fragment(text: str, spans: list[tuple[str, int, int]],
                  lo: int, hi: int, inside: list[int],
                  pre_tag: str, post_tag: str) -> str:
    """Original-text slice covering tokens [lo, hi], matched tokens
    wrapped in tags (right-to-left so offsets stay valid)."""
    if hi < lo:
        return ""
    start, end = spans[lo][1], spans[hi][2]
    frag = text[start:end]
    for i in sorted(inside, reverse=True):
        s, e = spans[i][1] - start, spans[i][2] - start
        frag = frag[:s] + pre_tag + frag[s:e] + post_tag + frag[e:]
    return frag


def highlight_hits(hits: pd.DataFrame, docs: pd.DataFrame,
                   qterms: set[str], cfg: TokenizerConfig,
                   col: str = "text", window: int = 12,
                   pre_tag: str = "<em>",
                   post_tag: str = "</em>") -> pd.DataFrame:
    """Join (docid, score) hits with fetched doc rows and decorate:
    returns (docid, score, fragment, n_matches) in hit order. Hits
    whose stored column shows no analyzable match (e.g. the match was
    in another field) get an empty fragment, never an error."""
    text_by_id = dict(zip(docs["docid"], docs[col]))
    frags, counts = [], []
    for d in hits["docid"]:
        text = text_by_id.get(d)
        spans = token_spans(text, cfg)
        lo, hi, inside = best_window(spans, qterms, window)
        frags.append(make_fragment(str(text) if text is not None
                                   else "", spans, lo, hi, inside,
                                   pre_tag, post_tag))
        counts.append(len(inside))
    out = hits.reset_index(drop=True).copy()
    out["fragment"] = frags
    out["n_matches"] = counts
    return out
