"""Structured-Streaming incremental indexing: the realtime half of the
reference's lambda architecture (README.md:3-13 — nightly MR rebuild +
a Storm realtime leg that lives OUTSIDE the reference repo; here both
halves are one engine).

Design: `foreachBatch` builds a self-contained mini-index (same on-disk
format as the batch build, build_index with num_shards small) per
micro-batch under <root>/delta/batch=<id>/, with docids offset into an
id space above the base index (offset ledger in <root>/delta/_log.json,
idempotent per batch id → exactly-once on retry). Query time, a
CombinedIndex unions the base + delta dictionaries and scores BM25 with
UNION-global stats (N, df, avgdl summed/reweighted across sub-indexes),
so results are exactly what a monolithic rebuild over base+delta rows
would produce — verified against the brute-force oracle in tests.

Block-max metadata stores (max_tf, min_dl) per block and the bound is
evaluated at query time under the union's avgdl, so WAND pruning stays
exact across base+delta — no special-casing needed.
"""
from __future__ import annotations

import json
import math
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from . import storage
from .build import BuildConfig, build_index
from .query import FTSIndex, score_shard


# ---------------------------------------------------------------- delta log
def _log_path(root: str) -> str:
    return os.path.join(root, "delta", "_log.json")


def read_delta_log(root: str) -> list[dict]:
    try:
        with open(_log_path(root)) as f:
            return json.load(f)
    except FileNotFoundError:
        return []


def _append_delta_log(root: str, entry: dict) -> None:
    log = read_delta_log(root)
    log.append(entry)
    tmp = _log_path(root) + ".tmp"
    os.makedirs(os.path.dirname(tmp), exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(log, f)
    os.replace(tmp, _log_path(root))


# ------------------------------------------------------------- stream build
def make_batch_indexer(base_root: str, text_col: str = "text",
                       order_cols: list[str] | None = None,
                       cfg: BuildConfig | None = None,
                       stream_name: str = "manual"):
    """Returns a foreachBatch(df, batch_id) callback appending micro-batch
    mini-indexes under <base_root>/delta/. Idempotent per
    (stream_name, batch_id) — Structured Streaming redelivers the last
    uncommitted batch with the same id on retry/restart, and the ledger
    skips it once committed (the exactly-once contract). Distinct streams
    (different checkpoints) get distinct name scopes."""
    order_cols = order_cols or ["conv_id", "turn_idx"]
    cfg = cfg or BuildConfig(num_shards=2, partitions=2)

    def process(df: DataFrame, batch_id: int) -> None:
        log = read_delta_log(base_root)
        if any(e["batch_id"] == batch_id
               and e.get("stream", "manual") == stream_name for e in log):
            return  # already committed (streaming retry)
        spark = df.sparkSession
        base_n = (spark.read.parquet(storage.path(base_root, "stats"))
                  .collect()[0]["n"])
        offset = int(base_n) + sum(e["n_docs"] for e in log)
        droot = os.path.join(base_root, "delta",
                             f"stream={stream_name}", f"batch={batch_id}")
        summary = build_index(spark, df, droot, text_col=text_col,
                              order_cols=order_cols, cfg=cfg,
                              docid_offset=offset)
        _append_delta_log(base_root, {
            "stream": stream_name, "batch_id": batch_id, "root": droot,
            "n_docs": summary["n_docs"], "docid_offset": offset,
            "build_id": summary["build_id"]})

    return process


def start_stream_index(stream_df: DataFrame, base_root: str,
                       checkpoint: str, text_col: str = "text",
                       order_cols: list[str] | None = None,
                       cfg: BuildConfig | None = None,
                       trigger_once: bool = True):
    """Wire a streaming DataFrame into the delta indexer."""
    name = os.path.basename(os.path.normpath(checkpoint))
    w = (stream_df.writeStream
         .foreachBatch(make_batch_indexer(base_root, text_col,
                                          order_cols, cfg,
                                          stream_name=name))
         .option("checkpointLocation", checkpoint))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


# ----------------------------------------------------------- combined query
class CombinedIndex:
    """Query base + delta mini-indexes as one corpus with exact
    union-global BM25 (B6) — the reference's 'search hits both the
    rebuilt index and the realtime index' semantics."""

    def __init__(self, spark: SparkSession, base_root: str):
        self.spark = spark
        self.subs = [FTSIndex(spark, base_root)]
        for e in read_delta_log(base_root):
            self.subs.append(FTSIndex(spark, e["root"]))
        self.N = sum(s.N for s in self.subs)
        self.avgdl = (sum(s.N * s.avgdl for s in self.subs) / self.N
                      if self.N else 0.0)
        s0 = self.subs[0]
        self.k1, self.b = s0.k1, s0.b
        self.tokenizer = s0.tokenizer

    def _idf(self, terms: list[str]) -> dict[str, float]:
        df_tot = {t: 0.0 for t in terms}
        for s in self.subs:
            rows = (self.spark.read
                    .parquet(storage.path(s.root, "term_stats"))
                    .where(F.col("term").isin(terms)).collect())
            for r in rows:
                df_tot[r["term"]] += float(r["df"])
        return {t: math.log(1.0 + (self.N - d + 0.5) / (d + 0.5))
                for t, d in df_tot.items()}

    def topk(self, query: str, k: int = 10, mode: str = "or",
             method: str = "wand") -> pd.DataFrame:
        from .analyzer import tokenize_text
        terms = sorted(set(tokenize_text(query, self.tokenizer)))
        if not terms:
            return pd.DataFrame({"docid": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        idf = self._idf(terms)
        nq = len(terms)
        k1, b, avgdl = self.k1, self.b, self.avgdl
        parts = []
        for i, s in enumerate(self.subs):
            # block bounds are (max_tf, min_dl) pairs evaluated at query
            # time, so WAND stays exact under the union avgdl
            m = method
            rows = s._posting_rows(terms)

            def per_shard(pdf):
                # single-arg signature: applyInPandas must not pass the
                # group key tuple
                return score_shard(pdf, idf, avgdl, k1, b, k, mode, nq, m)

            out = (rows.groupBy("shard")
                   .applyInPandas(per_shard, schema="docid long, score double")
                   .toPandas())
            parts.append(out)
        allp = pd.concat(parts) if parts else pd.DataFrame()
        if allp.empty:
            return pd.DataFrame({"docid": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        return (allp.sort_values(["score", "docid"],
                                 ascending=[False, True])
                .head(k).reset_index(drop=True))
