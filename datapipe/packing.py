"""Training-sequence packing: GPT-style concat-and-cut.

LLM pretraining consumes documents as one concatenated token stream cut
into fixed-length context windows (GPT-2/3, PaLM, LLaMA all train this
way — documents may span window boundaries). The batch op therefore
maps each document to its span in the global stream: `tok_start` (its
offset) and the first/last training sequence it touches.

Scale design: the global cumulative sum is NOT a single-partition
window (`Window.orderBy(...)` with no partition key serializes the
whole corpus through one task). It is the same two-pass pattern as
docid assignment: range-repartition the narrow (doc_id, n_tokens)
projection, per-partition sums → driver prefix offsets (O(P) driver
state), then a within-partition vectorized cumsum + offset. The range
sampling pass touches two int columns only.

SQL-oracle parity: the result equals a plain
`SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING ...)` —
which is exactly what the dp_pack_sequences gate checks in DuckDB.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def pack_sequences(df: DataFrame, budget: int, text_col: str = "text",
                   id_col: str = "doc_id",
                   partitions: int | None = None) -> DataFrame:
    """Per document: (doc_id, n_tokens, tok_start, seq_first, seq_last)
    under concat-and-cut packing with `budget` tokens per training
    sequence, documents ordered by `id_col`. Empty documents occupy no
    tokens: seq_first == seq_last == the sequence their offset falls in.
    Token definition matches textstats.token_count (analyzer split)."""
    assert budget > 0
    spark = df.sparkSession
    p = int(partitions
            or spark.conf.get("spark.sql.shuffle.partitions"))
    # null text counts as zero tokens (same coalesce as _span_grams /
    # word_histogram) — without it size(split(NULL)) is NULL and the
    # int64 cast in assign() crashes
    toks = F.filter(F.split(F.lower(F.coalesce(
                        F.col(text_col).cast("string"), F.lit(""))),
                    "[^a-z0-9]+"),
                    lambda t: t != "")
    narrow = df.select(F.col(id_col).alias("doc_id"),
                       F.size(toks).cast("long").alias("n_tokens"))
    srt = (narrow.repartitionByRange(p, "doc_id")
                 .sortWithinPartitions("doc_id")
                 .withColumn("_pid", F.spark_partition_id())
                 .persist())
    part_sums = {int(r["_pid"]): int(r["s"]) for r in
                 srt.groupBy("_pid")
                    .agg(F.sum("n_tokens").alias("s")).collect()}
    offs, acc = {}, 0
    for pid in sorted(part_sums):
        offs[pid] = acc
        acc += part_sums[pid]

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("tok_start", T.LongType()),
        T.StructField("seq_first", T.LongType()),
        T.StructField("seq_last", T.LongType()),
    ])
    b = int(budget)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            n = pdf["n_tokens"].to_numpy(np.int64)
            start = (offs.get(pid, 0) + local
                     + np.concatenate(([0], np.cumsum(n)[:-1])))
            local += int(n.sum())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "tok_start": start,
                "seq_first": start // b,
                "seq_last": np.maximum(start, start + n - 1) // b,
            })

    out = srt.mapInPandas(assign, schema=out_schema)
    # caller contract: the persisted (doc_id, n_tokens) parent MUST stay
    # cached until `out` is materialized (the driver offsets were
    # computed from this exact partitioning); afterwards call
    # `release_pack_cache(out)` to free the executors' cache. The
    # __spark_entry__ gate and tests honor this.
    out._sparkfts_cached_parent = srt   # type: ignore[attr-defined]
    return out


def release_pack_cache(out: DataFrame) -> None:
    """Unpersist the cached parent stashed by pack_sequences once the
    output has been materialized (collect/write/toPandas)."""
    srt = getattr(out, "_sparkfts_cached_parent", None)
    if srt is not None:
        srt.unpersist()
        out._sparkfts_cached_parent = None  # type: ignore[attr-defined]
