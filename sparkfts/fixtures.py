"""Deterministic synthetic transcripts fixture (FIXTURES.md §1).

Mirrors the reference's philosophy of hardcoded/seeded test corpora
(ElasticsearchRoutingStrategyV1Test.java:20-52 — "if a test is to fail I
want it to fail consistently") and its synthetic generator
(GenerateData.java:33-47, including the deliberate 2:1 tenant skew).

Shape pinned by BASELINE.json input_hint:
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp
One row = one conversation turn = one document. Text is drawn from a
~2,000-word Zipfian vocabulary (genuinely hot terms for skew paths), with
a small fraction of exact shared phrases so AND queries have non-trivial
intersections, plus punctuation/mixed case/Unicode to exercise the
analyzer. Fully deterministic under (seed, n_convs) and independent of
wall clock (no Date.now analog) or parallelism.
"""
from __future__ import annotations

import uuid

import numpy as np
import pandas as pd

EPOCH = np.datetime64("2026-01-01T00:00:00", "us")
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "bash", "python", "browser", "sql",
                  "calculator", "editor", "retrieval", "planner", "mailer"])

_STEMS = [
    "alpha", "bravo", "Charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "query", "index", "shard", "token", "merge",
    "batch", "spark", "stream", "naïve", "café", "Zürich", "data", "model",
    "agent",
]
SHARED_PHRASES = [
    "please rebuild the nightly index snapshot",
    "the embedded cluster failed to optimize",
    "routing hash spread across five shards",
    "block max wand pruned the postings",
    "checkpoint resume skipped committed partitions",
]


def vocabulary(size: int = 2000) -> np.ndarray:
    """Deterministic vocab: stem + numeric suffix; first 40 are raw stems
    (these become the hot head under the Zipf draw)."""
    words = list(_STEMS)
    i = 0
    while len(words) < size:
        words.append(f"{_STEMS[i % len(_STEMS)].lower()}{i}")
        i += 1
    return np.array(words[:size])


_GEN_ROWS_PER_CHUNK = 131_072   # tests shrink this to pin boundaries


def _gen_columns(n_convs: int, seed: int):
    """Shared vectorized generator: identical RNG draw sequence (hence
    identical values) to the original row-at-a-time implementation,
    with the text assembly done by pyarrow list-join / if_else kernels
    instead of ~n Python ``" ".join`` calls and a Python punctuation
    loop (the join loop dominated fixture generation past ~10^5 rows).
    Returns numpy/pyarrow columns; ``text``/``tool`` are pyarrow
    arrays."""
    import pyarrow as pa
    import pyarrow.compute as pc
    rng = np.random.default_rng(seed)
    vocab = vocabulary()
    # Zipfian rank probabilities over the vocab
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()

    conv_lens = rng.integers(1, 41, size=n_convs)
    total = int(conv_lens.sum())
    conv_idx = np.repeat(np.arange(n_convs), conv_lens)
    turn_idx = np.concatenate(
        [np.arange(l) for l in conv_lens]).astype(np.int32)

    conv_ids = np.array([str(uuid.UUID(int=int(seed) * 10_000_019 + c))
                         for c in range(n_convs)])
    role_codes = rng.integers(0, 4, size=total)
    roles = ROLES[role_codes]

    n_tokens = rng.integers(3, 81, size=total)
    # inverse-CDF draw == rng.choice(len(vocab), size, p=probs) value-
    # for-value (numpy's weighted replace=True choice is exactly
    # cumsum-normalize + random(size) + searchsorted-right; pinned by
    # tests/test_fixtures_gen.py so a numpy behavior change fails
    # loudly), minus choice()'s per-call validation overhead — ~30% of
    # fixture generation at bench sizes
    cdf = probs.cumsum()
    cdf /= cdf[-1]
    u = rng.random(int(n_tokens.sum()))
    # (a 2^16-bucket LUT bounding the binary search was tried and
    # REJECTED: the extra gathers cost 4x the search they saved)
    vocab_pa = pa.array(vocab.tolist(), type=pa.string())
    offs = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(n_tokens, out=offs[1:])
    # sprinkle punctuation and shared phrases deterministically (same
    # draws; the three per-row branches become two whole-column kernels
    # + one if_else select). RNG draws stay single global calls (the
    # draw sequence is the determinism contract); the assembly below is
    # chunked by rows so no single string/offset array approaches
    # Arrow's 2 GiB / int32 limits at large scale factors, and chunks
    # run on a small thread pool — the searchsorted and arrow string
    # kernels all release the GIL, and each chunk is a pure function
    # of its slice, so results are order- and thread-invariant.
    punct = rng.random(total)
    phrase_pick = rng.integers(0, len(SHARED_PHRASES), size=total)
    suffix_vals = pa.array([". " + p + "!" for p in SHARED_PHRASES])
    rows_per_chunk = _GEN_ROWS_PER_CHUNK

    def assemble(r0: int):
        r1 = min(total, r0 + rows_per_chunk)
        t0, t1 = int(offs[r0]), int(offs[r1])
        tok_idx = cdf.searchsorted(u[t0:t1], side="right")
        flat_pa = pa.DictionaryArray.from_arrays(
            pa.array(tok_idx.astype(np.int32)),
            vocab_pa).cast(pa.string())
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array((offs[r0:r1 + 1] - t0).astype(np.int32)),
                flat_pa), " ")
        suffixes = pa.DictionaryArray.from_arrays(
            pa.array(phrase_pick[r0:r1].astype(np.int32)),
            suffix_vals).cast(pa.string())
        with_phrase = pc.binary_join_element_wise(joined, suffixes, "")
        with_q = pc.binary_join_element_wise(
            pc.replace_substring(joined, " ", ", ",
                                 max_replacements=1), "?", "")
        pch = punct[r0:r1]
        return pc.if_else(pa.array(pch < 0.05), with_phrase,
                          pc.if_else(pa.array(pch < 0.08),
                                     with_q, joined))

    starts = list(range(0, total, rows_per_chunk))
    if len(starts) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, len(starts))) as ex:
            chunks = list(ex.map(assemble, starts))
    else:
        chunks = [assemble(s) for s in starts]
    if not chunks:
        texts = pa.array([], type=pa.string())
    elif len(chunks) == 1:
        texts = chunks[0]
    else:
        texts = pa.chunked_array(chunks)

    tool_codes = rng.integers(0, len(TOOLS), size=total)
    tool = pc.if_else(
        pa.array(role_codes == 3),   # ROLES[3] == "tool"
        pa.DictionaryArray.from_arrays(
            pa.array(tool_codes.astype(np.int32)),
            pa.array(TOOLS.tolist())).cast(pa.string()),
        pa.scalar(None, pa.string()))
    ts = EPOCH + (conv_idx * 3_600_000_000).astype("timedelta64[us]") \
        + (turn_idx.astype(np.int64) * 60_000_000).astype("timedelta64[us]")
    return conv_ids, conv_idx, turn_idx, roles, texts, tool, ts


def make_transcripts(n_convs: int = 20, seed: int = 42) -> pd.DataFrame:
    conv_ids, conv_idx, turn_idx, roles, texts, tool, ts = \
        _gen_columns(n_convs, seed)
    return pd.DataFrame({
        "conv_id": conv_ids[conv_idx],
        "turn_idx": turn_idx,
        "role": roles,
        "text": texts.to_pandas().to_numpy(dtype=object),
        "tool": tool.to_pandas().to_numpy(dtype=object),
        "ts": pd.Series(ts),
    })


def write_transcripts_parquet(path: str, n_convs: int, seed: int = 42) -> int:
    """Write the fixture as parquet; returns row count. Builds the
    arrow table directly from the generated columns (no pandas
    round-trip — same values as ``make_transcripts``)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    conv_ids, conv_idx, turn_idx, roles, texts, tool, ts = \
        _gen_columns(n_convs, seed)
    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()),
        ("tool", pa.string()), ("ts", pa.timestamp("us")),
    ])
    conv_col = pa.DictionaryArray.from_arrays(
        pa.array(conv_idx.astype(np.int32)),
        pa.array(conv_ids.tolist())).cast(pa.string())
    role_col = pa.array(roles.tolist(), type=pa.string())
    tbl = pa.Table.from_arrays(
        [conv_col, pa.array(turn_idx), role_col, texts, tool,
         pa.array(ts)], schema=schema)
    # Row groups sized for parallel scans (~5 MB here): pyarrow's
    # default writes ONE row group per chunk, and Spark assigns a
    # parquet byte-split's rows to the task holding the row-group
    # midpoint — a single-row-group file makes every downstream scan
    # of the corpus effectively single-task no matter how many splits
    # exist. 32k rows keeps each group well under
    # spark.sql.files.maxPartitionBytes so the build's docstore /
    # postings / assign scans fan out across the executor cores.
    # Values are unchanged (layout only).
    pq.write_table(tbl, path, row_group_size=32768)
    return len(tbl)
