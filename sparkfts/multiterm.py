"""Multi-term query expansion: prefix / wildcard / fuzzy.

The ES 1.x query DSL the reference's restored cluster serves includes
``prefix``, ``wildcard`` and ``fuzzy`` term queries (delegated to
embedded Lucene via the indexing point ``BaseESReducer.java:154``;
query behavior is public Elasticsearch/Lucene semantics). Our
dictionary (the ``term_stats`` table, and the postings dictionary
itself) is term-sorted parquet, so expansion is a PUSHED RANGE SCAN:

- prefix ``pre``      → ``term >= 'pre' AND term < next('pre')``
  (row-group pruning on the sorted term column), every matching term.
- wildcard ``a*c?d``  → range scan on the LITERAL PREFIX before the
  first metacharacter + anchored-regex verify on the candidates
  (JVM ``rlike`` on the distributed path, compiled ``re`` locally).
- fuzzy (Damerau-free Levenshtein ≤ d) → pushed length-window filter
  (``|len(term) - len(q)| <= d``) + optional ``prefix_length`` range
  scan, then exact edit-distance verify (JVM ``levenshtein`` on the
  distributed path, a vectorized numpy Wagner-Fischer locally).
- regexp (ES ``regexp`` query; Lucene semantics: the pattern must
  match the WHOLE term, no anchors needed) → range scan on the
  pattern's literal prefix (the same extraction Lucene's RegexpQuery
  does on its automaton) + anchored full-match verify. Patterns use
  the common Python-``re`` / Java / RE2 dialect subset (alternation,
  classes, quantifiers) — not Lucene's own operator set.

Rewrite semantics (public Lucene MultiTermQuery rewrites):

- ``scoring_boolean``: the expansion becomes an OR of term queries,
  each keeping its OWN df-based idf — exactly the bool-SHOULD sum the
  existing OR kernels compute, so expanded queries ride every scoring
  surface unchanged (WAND, cursors, filters, tenants, tombstones).
- ``constant_score``: score 1.0 for any doc containing >= 1 matching
  term (the ES 1.x default for prefix/wildcard); top-k is the first k
  matching docids.

Determinism under the expansion cap: candidates order by
(df DESC, term ASC) before truncation to ``max_expansions`` — the
Lucene ``top_terms_N`` rewrite's selection rule — so a capped
expansion is a pure function of the index, never of scan order.
"""
from __future__ import annotations

import re

import numpy as np

# Lucene BooleanQuery.maxClauseCount analog — the default cap on how
# many terms a single multi-term query may expand to.
MAX_EXPANSIONS = 1024

_META = frozenset("*?")


def literal_prefix(pattern: str) -> str:
    """The longest literal prefix before the first wildcard
    metacharacter — the pushed range-scan key."""
    for i, c in enumerate(pattern):
        if c in _META:
            return pattern[:i]
    return pattern


def wildcard_regex(pattern: str) -> str:
    """Anchored regex for a ``*``/``?`` wildcard, valid in BOTH Python
    ``re`` and Java (Spark ``rlike``): alnum chars stay literal,
    everything else is backslash-escaped."""
    out = ["^"]
    for c in pattern:
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c.isalnum() and c.isascii():
            out.append(c)
        else:
            out.append("\\" + c)
    out.append("$")
    return "".join(out)


def wildcard_like(pattern: str) -> str:
    """ANSI-SQL LIKE equivalent (``*``→``%``, ``?``→``_``). Dictionary
    terms are analyzer output ([a-z0-9] runs), so no escape collisions
    are possible; raise loudly if the pattern itself carries LIKE
    metacharacters."""
    if "%" in pattern or "_" in pattern:
        raise ValueError("wildcard pattern must use * and ?, not %/_")
    return pattern.replace("*", "%").replace("?", "_")


def prefix_upper_bound(prefix: str) -> str | None:
    """Smallest string greater than every string with this prefix —
    the exclusive upper bound of the dictionary range scan. None means
    unbounded (empty prefix, or a prefix of all U+10FFFF)."""
    s = prefix
    while s:
        last = s[-1]
        if ord(last) < 0x10FFFF:
            return s[:-1] + chr(ord(last) + 1)
        s = s[:-1]
    return None


def levenshtein_batch(q: str, terms) -> np.ndarray:
    """Exact Levenshtein distances q→terms[i], vectorized across the
    term axis (numpy Wagner-Fischer: the two Python loops run over the
    QUERY length and the max TERM length — every per-term op is a
    numpy row op). Used by the local/serving fuzzy verify; the
    distributed path uses Spark's JVM ``levenshtein`` instead."""
    terms = np.asarray(terms, dtype=np.str_)
    n = len(terms)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    tl = np.char.str_len(terms).astype(np.int64)
    W = int(tl.max())
    m = len(q)
    if W == 0:
        return np.full(n, m, dtype=np.int64)
    mat = (terms.astype(f"U{W}").view(np.uint32).reshape(n, W))
    qcp = np.array([ord(c) for c in q], dtype=np.uint32)
    prev = np.broadcast_to(np.arange(W + 1, dtype=np.int64),
                           (n, W + 1)).copy()
    for i in range(1, m + 1):
        cur = np.empty((n, W + 1), dtype=np.int64)
        cur[:, 0] = i
        sub = (mat != qcp[i - 1]).astype(np.int64)
        for j in range(1, W + 1):
            cur[:, j] = np.minimum(
                np.minimum(cur[:, j - 1] + 1, prev[:, j] + 1),
                prev[:, j - 1] + sub[:, j - 1])
        prev = cur
    return prev[np.arange(n), tl]


_RX_META = frozenset(".?*+()[]{}|\\^$")


def regex_literal_prefix(pattern: str) -> str:
    """Longest literal prefix every match of ``pattern`` must start
    with — the pushed range-scan key (Lucene's RegexpQuery extracts
    the same common prefix from its automaton). Conservative: a wrong
    (too-long) prefix would silently drop matching terms from the
    range scan, so when in doubt return a shorter prefix ('' = full
    dictionary scan; the anchored verify still guarantees
    correctness). Rules:

    - any ``|`` in the pattern voids the prefix (deciding whether it
      is top-level needs a full parse; ``a(b|c)`` merely loses the
      'a' pushdown, it stays correct),
    - ``?``/``*``/``{`` quantify the previous char as OPTIONAL → drop
      it and stop; ``+`` keeps it (one-or-more) and stops,
    - any other metacharacter (``. ( [ \\ ^ $``...) stops the scan.
    """
    if "|" in pattern:
        return ""
    lit: list[str] = []
    for c in pattern:
        if c in "?*{":
            if lit:
                lit.pop()
            break
        if c == "+":
            break
        if c in _RX_META:
            break
        lit.append(c)
    return "".join(lit)


def escape_literal(s: str) -> str:
    """Regex-escape a literal (field prefix) portably across Python
    ``re``, Java, and RE2: alnum stays, everything else backslashed."""
    return "".join(c if (c.isalnum() and c.isascii()) else "\\" + c
                   for c in s)


def validate_kind(kind: str) -> None:
    if kind not in ("prefix", "wildcard", "fuzzy", "regexp"):
        raise ValueError(
            f"kind must be prefix|wildcard|fuzzy|regexp, got {kind!r}")


def pattern_bounds(pattern: str, kind: str, fuzziness: int = 2,
                   prefix_length: int = 0) -> tuple[str, str | None]:
    """(inclusive lower, exclusive upper) dictionary range for a
    pattern — the filter pushed to the term-sorted parquet scan.
    Patterns are lowercased to match analyzer output (ES does not
    analyze multi-term patterns; lowercasing is the standard
    normalization every practical deployment configures)."""
    p = pattern.lower()
    if kind == "prefix":
        lit = p
    elif kind == "wildcard":
        lit = literal_prefix(p)
    elif kind == "regexp":
        lit = regex_literal_prefix(p)
    else:
        lit = p[:max(0, int(prefix_length))]
    return lit, prefix_upper_bound(lit)


def select_expansions(cand_terms, cand_dfs, max_expansions: int,
                      prefix: str = "") -> list[str]:
    """Deterministic cap: order candidates by (df DESC, term ASC) —
    the Lucene top_terms_N selection — truncate, return term-ASC (the
    order every scoring kernel expects). ``prefix`` is the field
    prefix to re-attach."""
    pairs = sorted(zip(cand_terms, cand_dfs),
                   key=lambda td: (-td[1], td[0]))
    if max_expansions is not None and len(pairs) > max_expansions:
        pairs = pairs[:max_expansions]
    return sorted(prefix + t for t, _ in pairs)
