"""Distributed BPE tokenizer training + encoding.

Byte-pair-encoding (Sennrich et al. 2016; the GPT-2 tokenizer family)
trained the way production tokenizer trainers actually scale
(SentencePiece / HF tokenizers): the corpus-sized work — reducing
100 TB of text to a word-type histogram — is ONE distributed
groupBy; the merge-learning loop then runs on the driver over that
bounded histogram (vocabulary grows ~log corpus, Heaps' law:
~10^6-10^7 types at 10^12 tokens, and `max_word_types` caps it
deterministically below any driver budget). Encoding is distributed
again: an Arrow-batched pandas UDF with a per-word memo, so the
Python merge loop runs once per word TYPE per batch, not per token.

Nothing here is a port: the reference repo has no tokenizer training;
this is the training-data-pipeline operator a 100 TB corpus needs
(vocab fitting before tokenize-and-pack).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_TOKEN_SPLIT = "[^a-z0-9]+"


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) counts over analyzer tokens — the single corpus-wide
    pass of BPE training. Map-side partial aggregation; output rows are
    word TYPES (bounded by vocabulary, not corpus size)."""
    return (df.select(F.explode(
                F.filter(F.split(F.lower(F.coalesce(
                             F.col(text_col).cast("string"), F.lit(""))),
                         _TOKEN_SPLIT),
                         lambda t: t != "")).alias("word"))
            .groupBy("word").agg(F.count("*").alias("n")))


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out = []
    i, n = 0, len(sym)
    while i < n:
        if i < n - 1 and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_merges(hist: list[tuple[str, int]],
                 num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, count) histogram,
    with incremental pair-count maintenance: each merge touches only
    the words that CONTAIN the merged pair (an inverted pair→words
    index), not the whole vocabulary — the standard trainer design,
    O(affected words) per merge instead of O(V) rescans.

    Deterministic: best pair = max count, ties broken by the pair's
    lexicographic order (smallest wins) so every engine that replays
    this histogram learns the identical merge list. Best-pair selection
    is a lazy-deletion max-heap keyed (-count, pair) — heap order IS
    the (max count, lexicographically-smallest) rule — so a merge round
    costs O(affected words + popped-stale entries), never a full scan
    of the pair table."""
    import heapq
    words: list[list] = []          # [sym tuple, count]
    agg: dict[tuple, int] = {}
    for w, c in hist:
        sym = tuple(w)
        agg[sym] = agg.get(sym, 0) + int(c)
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set] = {}
    for sym, c in agg.items():
        wi = len(words)
        words.append([sym, c])
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def bump(p: tuple[str, str], delta: int) -> None:
        c = pair_counts.get(p, 0) + delta
        pair_counts[p] = c
        if delta > 0:               # stale smaller entries lazily skipped
            heapq.heappush(heap, (-c, p))

    merges: list[tuple[str, str]] = []
    while len(merges) < int(num_merges) and heap:
        negc, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if cur <= 0:
            continue
        if -negc != cur:            # stale entry: re-queue at true count
            heapq.heappush(heap, (-cur, best))
            continue
        merges.append(best)
        for wi in sorted(pair_words.get(best, ())):
            sym, c = words[wi]
            if best not in set(zip(sym, sym[1:])):
                continue            # stale index entry
            for p in zip(sym, sym[1:]):
                bump(p, -c)
            new_sym = _merge_word(sym, best)
            words[wi][0] = new_sym
            for p in zip(new_sym, new_sym[1:]):
                bump(p, c)
                pair_words.setdefault(p, set()).add(wi)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def train_bpe(df: DataFrame, num_merges: int = 200,
              text_col: str = "text",
              max_word_types: int = 1_000_000) -> list[tuple[str, str]]:
    """One distributed histogram pass + driver-side merge learning.
    ``max_word_types`` keeps the collected histogram bounded at any
    corpus size: deterministic top-K by (count desc, word asc) — an
    ORDER BY + LIMIT, no RNG, so retrains are reproducible."""
    hist_df = (word_histogram(df, text_col)
               .orderBy(F.desc("n"), F.asc("word"))
               .limit(int(max_word_types)))
    hist = [(r["word"], r["n"]) for r in hist_df.collect()]
    return learn_merges(hist, num_merges)


def _encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the merge list SEQUENTIALLY in learned order (the original
    subword-nmt semantics, one left-to-right non-overlapping pass per
    merge). Chosen over GPT-2's rank-priority loop because a sequential
    pass per merge is exactly one string `replace()` — so a fixed merge
    table has an exact ANSI-SQL oracle: chained replaces over a
    fully-delimited symbol form ('|a||b|' -> '|ab|'; both boundaries
    explicit, so a pattern can never match the PREFIX of a longer
    following symbol and consecutive matches share no delimiter)."""
    sym = tuple(word)
    for m in merges:
        if len(sym) < 2:
            break
        sym = _merge_word(sym, m)
    return list(sym)


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """(doc_id, bpe_tokens, n_bpe_tokens): distributed BPE encode via
    sequential merge application. Arrow-batched pandas UDF; the Python
    merge loop is memoized per word TYPE within each batch (GPT-2's
    lru_cache trick), so hot words cost a dict hit, and the merge
    table ships once per executor via closure capture."""
    from pyspark.sql.functions import pandas_udf

    mlist = [tuple(m) for m in merges]
    import re
    splitter = re.compile(_TOKEN_SPLIT)

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(t):
            out = []
            for w in splitter.split(str(t or "").lower()):
                if not w:
                    continue
                e = memo.get(w)
                if e is None:
                    e = _encode_word(w, mlist)
                    memo[w] = e
                out.extend(e)
            return out
        return texts.map(one)

    return (df.select("doc_id", enc(F.col(text_col)).alias("bpe_tokens"))
              .withColumn("n_bpe_tokens", F.size("bpe_tokens")))


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """Deterministic vocabulary for a merge list: the 36 analyzer base
    symbols ([a-z0-9], in that order) followed by each merge's product
    in learned order, DEDUPLICATED first-occurrence-wins. Two merges can
    yield the same product (('a','bc') and ('ab','c') both make 'abc');
    without the dedup bpe_encode_ids' string→id dict silently mapped
    both to the LAST id, leaving dead ids in the declared space
    (ADVICE r4). Token id = position in this list — a dense id space
    every downstream consumer (packing, embedding rows) keys on."""
    base = [chr(c) for c in range(ord("a"), ord("z") + 1)] + \
           [chr(c) for c in range(ord("0"), ord("9") + 1)]
    seen = set(base)
    out = list(base)
    for a, b in merges:
        s = a + b
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def save_merges(path: str, merges: list[tuple[str, str]]) -> None:
    """Persist a learned merge table as JSON (atomic rename) — the
    tokenizer artifact a nightly vocab-fit job hands to every
    downstream encode job."""
    import json
    import os
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": 1, "merges": [list(m) for m in merges]}, f)
    os.replace(tmp, path)


def load_merges(path: str) -> list[tuple[str, str]]:
    import json
    with open(path) as f:
        d = json.load(f)
    if d.get("version") != 1:
        raise ValueError(f"unsupported merges file version: {d.get('version')!r}")
    return [tuple(m) for m in d["merges"]]


def bpe_encode_ids(df: DataFrame, merges: list[tuple[str, str]],
                   text_col: str = "text",
                   unk_id: int = -1) -> DataFrame:
    """(doc_id, bpe_ids, n_bpe_tokens): like bpe_encode but emitting
    token IDS over the bpe_vocab(merges) id space — the form sequence
    packing and training actually consume. Symbols outside the vocab
    (impossible for analyzer output + a vocab from the same analyzer,
    but kept total) map to ``unk_id``."""
    from pyspark.sql.functions import pandas_udf

    mlist = [tuple(m) for m in merges]
    vid = {s: i for i, s in enumerate(bpe_vocab(mlist))}
    import re
    splitter = re.compile(_TOKEN_SPLIT)

    @pandas_udf("array<int>")
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[int]] = {}

        def one(t):
            out = []
            for w in splitter.split(str(t or "").lower()):
                if not w:
                    continue
                e = memo.get(w)
                if e is None:
                    e = [vid.get(s, unk_id)
                         for s in _encode_word(w, mlist)]
                    memo[w] = e
                out.extend(e)
            return out
        return texts.map(one)

    return (df.select("doc_id", enc(F.col(text_col)).alias("bpe_ids"))
              .withColumn("n_bpe_tokens", F.size("bpe_ids")))
