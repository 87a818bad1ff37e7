"""Brute-force BM25 oracle in pure pandas/numpy.

Ground truth for the engine's top-k (SURVEY.md §5 test plan #2): the
replacement for "restore the snapshot into a live ES cluster and compare
answers". Deliberately implemented from the BM25 *spec* (k1=1.2, b=0.75,
idf = ln(1 + (N-df+0.5)/(df+0.5)), tie-break by docID ascending) rather
than by sharing the engine's scoring kernel, so the rank-identical check
stays honest.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from .analyzer import DEFAULT, TokenizerConfig, tokenize_series, tokenize_text


class BM25Oracle:
    def __init__(self, docids: np.ndarray, texts: pd.Series,
                 cfg: TokenizerConfig = DEFAULT,
                 k1: float = 1.2, b: float = 0.75):
        self.k1, self.b, self.cfg = k1, b, cfg
        toks = tokenize_series(texts, cfg)
        flat = toks.explode()
        keep = flat.notna()
        self._pairs = pd.DataFrame({
            "docid": np.repeat(np.asarray(docids), toks.map(len)),
            "term": flat[keep].to_numpy(),
        })
        tf = (self._pairs.groupby(["term", "docid"], sort=True)
              .size().rename("tf").reset_index())
        self.tf = tf
        dl = toks.map(len).to_numpy(dtype=np.float64)
        self.dl = pd.Series(dl, index=np.asarray(docids))
        self.N = float(len(docids))
        self.avgdl = float(dl.mean()) if len(dl) else 0.0
        self.df = tf.groupby("term").size()

    def idf(self, term: str) -> float:
        d = float(self.df.get(term, 0))
        return float(np.log(1.0 + (self.N - d + 0.5) / (d + 0.5)))

    def expand(self, pattern: str, kind: str = "prefix",
               fuzziness: int = 2, prefix_length: int = 0) -> list[str]:
        """Brute-force dictionary expansion for multi-term queries —
        deliberately independent of the engine's range-scan expansion:
        a full vocabulary scan with startswith / fnmatch / a pure-DP
        Levenshtein."""
        import fnmatch
        import re
        from functools import lru_cache
        p = pattern.lower()
        vocab = sorted(self.df.index)
        if kind == "prefix":
            return [t for t in vocab if t.startswith(p)]
        if kind == "wildcard":
            return [t for t in vocab if fnmatch.fnmatchcase(t, p)]
        if kind == "regexp":
            rx = re.compile(p)
            return [t for t in vocab if rx.fullmatch(t)]

        def lev(a: str, b: str) -> int:
            @lru_cache(maxsize=None)
            def d(i: int, j: int) -> int:
                if i == 0:
                    return j
                if j == 0:
                    return i
                return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                           d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
            return d(len(a), len(b))
        pre = p[:max(0, int(prefix_length))]
        return [t for t in vocab
                if t.startswith(pre) and lev(p, t) <= int(fuzziness)]

    def topk(self, query: str, k: int = 10, mode: str = "or") -> pd.DataFrame:
        """Top-k (docid, score), score desc, ties by docid asc.

        mode='or': sum over matched terms; mode='and': doc must contain
        every distinct query term.
        """
        return self.topk_terms(sorted(set(tokenize_text(query, self.cfg))),
                               k, mode)

    def topk_terms(self, terms: list[str], k: int = 10,
                   mode: str = "or") -> pd.DataFrame:
        """topk over pre-analyzed terms (the multi-term-query oracle:
        score an explicit OR of expanded terms)."""
        if not terms:
            return pd.DataFrame({"docid": pd.Series(dtype=np.int64),
                                 "score": pd.Series(dtype=np.float64)})
        acc: dict[int, float] = {}
        hits: dict[int, int] = {}
        for t in terms:  # fixed ascending term order = fixed summation order
            sub = self.tf[self.tf["term"] == t]
            if sub.empty:
                continue
            docs = sub["docid"].to_numpy()
            tf = sub["tf"].to_numpy(dtype=np.float64)
            dl = self.dl.loc[docs].to_numpy()
            part = self.idf(t) * tf * (self.k1 + 1.0) / (
                tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
            for d, s in zip(docs.tolist(), part.tolist()):
                acc[d] = acc.get(d, 0.0) + s
                hits[d] = hits.get(d, 0) + 1
        if mode == "and":
            need = len(terms)
            acc = {d: s for d, s in acc.items() if hits[d] == need}
        out = pd.DataFrame({"docid": list(acc.keys()),
                            "score": list(acc.values())})
        out = out.sort_values(["score", "docid"],
                              ascending=[False, True]).head(k)
        return out.reset_index(drop=True)
