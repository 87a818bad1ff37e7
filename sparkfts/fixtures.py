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


def make_transcripts(n_convs: int = 20, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = vocabulary()
    # Zipfian rank probabilities over the vocab
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()

    conv_lens = rng.integers(1, 41, size=n_convs)
    total = int(conv_lens.sum())
    conv_idx = np.repeat(np.arange(n_convs), conv_lens)
    turn_idx = np.concatenate([np.arange(l) for l in conv_lens]).astype(np.int32)

    conv_ids = np.array([str(uuid.UUID(int=int(seed) * 10_000_019 + c))
                         for c in range(n_convs)])
    roles = ROLES[rng.integers(0, 4, size=total)]

    n_tokens = rng.integers(3, 81, size=total)
    flat = vocab[rng.choice(len(vocab), size=int(n_tokens.sum()), p=probs)]
    bounds = np.cumsum(n_tokens)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(flat, bounds)]
    # sprinkle punctuation and shared phrases deterministically
    punct = rng.random(total)
    phrase_pick = rng.integers(0, len(SHARED_PHRASES), size=total)
    for i in range(total):
        if punct[i] < 0.05:
            texts[i] = texts[i] + ". " + SHARED_PHRASES[phrase_pick[i]] + "!"
        elif punct[i] < 0.08:
            texts[i] = texts[i].replace(" ", ", ", 1) + "?"

    tool = np.where(roles == "tool",
                    TOOLS[rng.integers(0, len(TOOLS), size=total)], None)
    ts = EPOCH + (conv_idx * 3_600_000_000).astype("timedelta64[us]") \
        + (turn_idx.astype(np.int64) * 60_000_000).astype("timedelta64[us]")

    return pd.DataFrame({
        "conv_id": conv_ids[conv_idx],
        "turn_idx": turn_idx,
        "role": roles,
        "text": texts,
        "tool": tool,
        "ts": pd.Series(ts),
    })


def write_transcripts_parquet(path: str, n_convs: int, seed: int = 42) -> int:
    """Write the fixture as parquet; returns row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    pdf = make_transcripts(n_convs, seed)
    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()),
        ("tool", pa.string()), ("ts", pa.timestamp("us")),
    ])
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema,
                                        preserve_index=False), path)
    return len(pdf)
