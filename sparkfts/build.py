"""Index build pipeline: transcripts DataFrame → on-disk inverted index.

PySpark-native replacement for the reference's MapReduce→embedded-ES→
snapshot pipeline (ExampleIndexingJob.java:23-76, BaseESReducer.java:81-190).
Doc-partitioned shard design, mirroring the reference's
one-reducer-builds-one-shard model (README.md:29-33) but from scratch:

  1. Stable global docID assignment under (conv_id, turn_idx) ordering —
     range repartition + sortWithinPartitions + driver prefix-sum of
     per-partition counts (deterministic and independent of parallelism:
     the docID of a row is its global rank regardless of where partition
     boundaries fall, which is what makes local[8] ≡ local[32] output).
     No monotonically_increasing_id (partition-layout-dependent), no
     global single-partition window.
  2. shard = docid // ceil(N / num_shards): contiguous, perfectly
     balanced doc ranges. This doubles as the skew strategy — a hot term's
     postings are split across ALL shards by construction (the analog of
     the reference's numShardsPerOrg spread,
     ElasticsearchRoutingStrategyV1.java:16-23), so no term-level salting
     stage is needed; per-shard posting length is bounded by
     docs_per_shard.
  3. Tokenize via vectorized pandas UDF (Arrow batches, no per-row
     Python) → doc lengths, global avgdl/N.
  4. explode → groupBy(shard, term, docid, dl).count() — Catalyst plans a
     map-side partial aggregate before the shuffle, so duplicate
     (term, docid) token instances collapse early (the shuffle carries
     distinct postings, not raw tokens).
  5. repartition(P, shard) + sortWithinPartitions(shard, term, docid) →
     streaming mapInPandas encoder: one pass, bounded memory, emits
     delta+varint blocks with block-max metadata (codec.py). Terms whose
     per-shard posting exceeds max_chunk_postings are flushed as multiple
     chunk rows (docid-range-ordered, so query-side concat by chunk id
     restores global order without a merge).
  6. Write everything as parquet partitioned by shard (Iceberg-style
     layout; partition pruning at query time = the analog of the
     reference's getPossibleRoutingHashes shard pruning,
     ElasticsearchRoutingStrategyV1.java:137-148). The per-shard manifest
     rows (lineage + timings + counts) replace the reference's merged
     manifests + job counters (IndexingPostProcessor.java:33-48,
     BaseESReducer.java:29-31); placeholder rows for empty shards mirror
     IndexingPostProcessor.placeMissingShards (:80-108).

Checkpoint-resume at shard granularity: a manifest row marks a shard
committed; resume anti-joins expected-vs-committed and rebuilds only the
gap (the pipeline is pure-functional until the write, so re-running a
shard is idempotent — unlike the reference, which must disable
speculative execution, ExampleIndexingJob.java:59).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from . import codec
from .analyzer import DEFAULT, TokenizerConfig, tokenize_series

POSTING_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("chunk", T.IntegerType(), False),
    T.StructField("df", T.LongType(), False),
    T.StructField("cf", T.LongType(), False),
    T.StructField("blob", T.BinaryType(), False),
    T.StructField("block_first", T.ArrayType(T.LongType()), False),
    T.StructField("block_last", T.ArrayType(T.LongType()), False),
    T.StructField("block_off", T.ArrayType(T.LongType()), False),
    T.StructField("block_n", T.ArrayType(T.IntegerType()), False),
    T.StructField("block_max_partial", T.ArrayType(T.DoubleType()), False),
    T.StructField("nbytes", T.LongType(), False),
    T.StructField("enc_us", T.LongType(), False),
])


@dataclass(frozen=True)
class BuildConfig:
    num_shards: int = 8
    partitions: int | None = None          # shuffle width; None → session default
    max_chunk_postings: int = 1 << 18      # flush giant per-shard terms in chunks
    block: int = codec.BLOCK
    k1: float = codec.K1
    b: float = codec.B
    tokenizer: TokenizerConfig = field(default_factory=lambda: DEFAULT)


def assign_docids(df: DataFrame, order_cols: list[str],
                  partitions: int | None = None) -> DataFrame:
    """Add a stable dense int64 ``docid`` = global rank under order_cols.

    Scales: range shuffle + per-partition local rank + a driver-side
    prefix sum over per-partition counts (num_partitions integers — O(P),
    not O(N), on the driver).
    """
    p = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    srt = (df.repartitionByRange(int(p), *order_cols)
             .sortWithinPartitions(*order_cols)
             .withColumn("_pid", F.spark_partition_id()))
    srt.persist()
    counts = {r["_pid"]: r["cnt"] for r in
              srt.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    total = sum(counts.values())
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField("docid", T.LongType(), False)])

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = offsets.get(pid, 0) + local
            pdf = pdf.drop(columns=["_pid"])
            pdf["docid"] = np.arange(base, base + len(pdf), dtype=np.int64)
            local += len(pdf)
            yield pdf

    out = srt.mapInPandas(add_ids, schema=out_schema)
    # dense rank ⇒ n_docs and max docid are already known on the driver
    out._sparkfts_n_docs = total          # type: ignore[attr-defined]
    out._sparkfts_cached_parent = srt     # type: ignore[attr-defined]
    return out


def _make_tokenize_udf(cfg: TokenizerConfig):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tok(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts, cfg)
    return tok


def _make_encoder(avgdl: float, cfg: BuildConfig):
    """Streaming posting encoder for mapInPandas over RAW token rows
    (shard, term, docid, dl) sorted by (shard, term, docid) — duplicate
    (term, docid) rows are adjacent, so tf is a run-length count
    (np.unique on the sorted slice). No upstream groupBy: the relational
    plan pays ONE shuffle of the exploded tokens instead of a 10^7-entry
    hash aggregate plus a second shuffle (measured 2-3x faster; at 100 TB
    the sort-based shuffle also spills gracefully where a giant hash agg
    would not).

    Bounded memory: state is one (shard, term) group's buffers. raw rows
    are aggregated into postings whenever the buffer passes
    max_chunk_postings, cutting at a docid-run boundary (a docid's
    duplicates never split across chunks), and full chunks are emitted
    eagerly — so a stopword's per-shard posting list streams through in
    O(max_chunk) memory.
    """
    k1, b, block, max_chunk = cfg.k1, cfg.b, cfg.block, cfg.max_chunk_postings

    def encoder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.perf_counter()
        rows: list[dict] = []
        key: tuple[int, str] | None = None
        raw: list[tuple[np.ndarray, np.ndarray]] = []   # (docids, dls)
        raw_n = 0
        agg: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []  # d, tf, dl
        agg_n = 0
        next_chunk = 0

        def aggregate(final: bool) -> None:
            """raw duplicate rows → unique postings appended to agg."""
            nonlocal raw, raw_n, agg, agg_n
            if not raw:
                return
            d = np.concatenate([x[0] for x in raw])
            l = np.concatenate([x[1] for x in raw])
            if not final:
                # keep the last docid's (possibly continuing) run buffered
                cut = int(np.searchsorted(d, d[-1], side="left"))
                if cut == 0:
                    return
                d, keep_d = d[:cut], d[cut:]
                l, keep_l = l[:cut], l[cut:]
                raw, raw_n = [(keep_d, keep_l)], len(keep_d)
            else:
                raw, raw_n = [], 0
            uniq, idx, counts = np.unique(d, return_index=True,
                                          return_counts=True)
            agg.append((uniq, counts.astype(np.int64), l[idx]))
            agg_n += len(uniq)

        def emit_chunks(final: bool) -> None:
            nonlocal agg, agg_n, next_chunk
            if not agg or (not final and agg_n < max_chunk):
                return
            d = np.concatenate([x[0] for x in agg])
            t = np.concatenate([x[1] for x in agg])
            l = np.concatenate([x[2] for x in agg])
            start = 0
            while start < len(d):
                end = len(d) if final else min(start + max_chunk, len(d))
                if not final and end - start < max_chunk:
                    break
                enc = codec.encode_postings(d[start:end], t[start:end],
                                            l[start:end], avgdl, k1, b, block)
                rows.append({
                    "shard": key[0], "term": key[1], "chunk": next_chunk,
                    "df": enc["df"], "cf": enc["cf"], "blob": enc["blob"],
                    "block_first": enc["block_first"],
                    "block_last": enc["block_last"],
                    "block_off": enc["block_off"],
                    "block_n": enc["block_n"],
                    "block_max_partial": enc["block_max_partial"],
                    "nbytes": len(enc["blob"]),
                    "enc_us": int((time.perf_counter() - t0) * 1e6),
                })
                next_chunk += 1
                start = end
            agg = ([(d[start:], t[start:], l[start:])]
                   if start < len(d) else [])
            agg_n = len(d) - start

        def finish_group() -> None:
            nonlocal raw, raw_n, agg, agg_n, next_chunk
            aggregate(final=True)
            emit_chunks(final=True)
            raw, raw_n, agg, agg_n, next_chunk = [], 0, [], 0, 0

        def emit() -> pd.DataFrame:
            nonlocal rows
            pdf = pd.DataFrame(rows, columns=[f.name for f in POSTING_SCHEMA])
            rows = []
            return pdf

        for pdf in batches:
            if len(pdf) == 0:
                continue
            shard = pdf["shard"].to_numpy()
            term = pdf["term"].to_numpy()
            docid = pdf["docid"].to_numpy(dtype=np.int64)
            dl = pdf["dl"].to_numpy(dtype=np.int64)
            # group boundaries within the batch (vectorized)
            change = np.flatnonzero(
                (shard[1:] != shard[:-1]) | (term[1:] != term[:-1]))
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [len(pdf)]))
            for s, e in zip(starts, ends):
                gk = (int(shard[s]), str(term[s]))
                if gk != key:
                    if key is not None:
                        finish_group()
                    key = gk
                raw.append((docid[s:e], dl[s:e]))
                raw_n += e - s
                if raw_n >= max_chunk:
                    aggregate(final=False)
                    emit_chunks(final=False)
            if len(rows) >= 1024:
                yield emit()
        if key is not None:
            finish_group()
        if rows:
            yield emit()

    return encoder


def build_index(spark: SparkSession, df: DataFrame, out_dir: str,
                text_col: str = "text",
                docid_col: str | None = None,
                order_cols: list[str] | None = None,
                cfg: BuildConfig = BuildConfig(),
                resume: bool = False,
                docid_offset: int = 0,
                _only_shards: list[int] | None = None) -> dict:
    """Build (or resume) the full index under ``out_dir``.

    Either ``docid_col`` (pre-existing unique int64 ids) or ``order_cols``
    (stable ordering for rank-based assignment, e.g.
    ["conv_id", "turn_idx"]) must be given. Returns a summary dict.
    ``_only_shards`` is a test hook simulating a partial (killed) build.
    """
    from . import storage
    build_id = storage.new_build_id(out_dir)
    t_start = time.perf_counter()
    phases: dict[str, float] = {}
    _t = [t_start]

    def mark(name: str) -> None:
        now = time.perf_counter()
        phases[name] = round(now - _t[0], 3)
        _t[0] = now

    committed: set[int] = set()
    if resume:
        committed = storage.committed_shards(spark, out_dir)

    if docid_col is not None:
        assert docid_offset == 0, "docid_offset only applies to rank ids"
        base = df.withColumn("docid", F.col(docid_col).cast("long"))
        agg0 = base.agg(F.count("*").alias("n"),
                        F.max("docid").alias("mx")).collect()[0]
        n_docs, max_id = int(agg0["n"]), agg0["mx"]
        cached_parent = None
    else:
        assert order_cols, "need docid_col or order_cols"
        base = assign_docids(df, order_cols, cfg.partitions)
        n_docs = base._sparkfts_n_docs          # dense rank: no extra job
        max_id = n_docs - 1
        cached_parent = base._sparkfts_cached_parent
        if docid_offset:
            # delta/streaming indexes live in an id space above the base
            base = base.withColumn(
                "docid", F.col("docid") + F.lit(docid_offset))

    if n_docs == 0:
        docs_per_shard = 1
    else:
        docs_per_shard = max(1, -(-(max_id + 1) // cfg.num_shards))
    doc = base.withColumn(
        "shard", ((F.col("docid") - F.lit(docid_offset))
                  / F.lit(docs_per_shard)).cast("int"))

    mark("assign_docids")

    # Tokenizer: pure Catalyst expression when possible (whole-stage
    # codegen, zero Python in the hot path); pandas-UDF fallback for
    # non-JVM-expressible analyzer configs. Token arrays are NEVER
    # cached — only scalar dl is — so the persist holds no 10^8-object
    # token graph (GC poison at scale).
    from .analyzer import jvm_tokens
    tokens_col = jvm_tokens(F.col(text_col), cfg.tokenizer)
    if tokens_col is None:
        tokens_col = _make_tokenize_udf(cfg.tokenizer)(F.col(text_col))
    doc = doc.withColumn("dl", F.size(tokens_col).cast("long"))
    doc.persist()

    todo = [s for s in range(cfg.num_shards) if s not in committed]
    if _only_shards is not None:
        todo = [s for s in todo if s in _only_shards]
    todo_set = set(todo)

    if todo:
        sub = doc.where(F.col("shard").isin(todo))
        # doc store: the reference's _source / fetch path (BaseESReducer
        # keeps JSON in ES; ours is the input row keyed by docid, sorted
        # so parquet row-group min/max stats prune docid point lookups).
        # dl rides along (the Lucene-norms analog), so no separate
        # doclens artifact is needed.
        store_cols = [c for c in df.columns if c != docid_col]
        (sub.select("shard", "docid", "dl", *store_cols)
            .sortWithinPartitions("docid")
            .write.mode("append").partitionBy("shard")
            .parquet(storage.path(out_dir, "docstore")))
    mark("docstore_write")

    # Global stats must reflect the FULL corpus (all docs, not just the
    # shards rebuilt this run); cheap agg on the cached docs.
    stats_src = doc.agg(F.avg("dl").alias("avgdl")).collect()[0]
    N, avgdl = n_docs, float(stats_src["avgdl"] or 0.0)
    mark("global_stats")

    if todo:
        # ONE shuffle: raw exploded tokens, partitioned by shard, sorted
        # by (shard, term, docid); tf computed by run-length in the
        # encoder (see _make_encoder for the groupBy-vs-sort tradeoff).
        pairs = (doc.where(F.col("shard").isin(todo))
                 .select("shard", "docid", "dl",
                         F.explode(tokens_col).alias("term")))
        p = cfg.partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions"))
        enc_in = (pairs.repartition(min(p, max(1, len(todo))), "shard")
                       .sortWithinPartitions("shard", "term", "docid"))
        enc_out = enc_in.mapInPandas(_make_encoder(avgdl, cfg),
                                     schema=POSTING_SCHEMA)
        (enc_out.write.mode("append").partitionBy("shard")
                .parquet(storage.path(out_dir, "postings")))
    mark("postings_write")

    # Derived artifacts are always recomputed from the on-disk shards so a
    # resumed build converges to the same state as a clean one (column-
    # pruned read: term/df/cf only, never the blobs).
    post = spark.read.parquet(storage.path(out_dir, "postings"))
    (post.groupBy("term")
         .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
         .sort("term")
         .write.mode("overwrite")
         .parquet(storage.path(out_dir, "term_stats")))
    mark("term_stats")

    stats_row = [(N, avgdl, cfg.num_shards,
                  int(docs_per_shard), float(cfg.k1), float(cfg.b),
                  int(cfg.block), int(docid_offset), build_id)]
    spark.createDataFrame(
        stats_row,
        "n long, avgdl double, num_shards int, docs_per_shard long, "
        "k1 double, b double, block int, docid_offset long, build_id string"
    ).write.mode("overwrite").parquet(storage.path(out_dir, "stats"))

    # Manifest: one committed row per shard built this run, including
    # empty-shard placeholders (IndexingPostProcessor.java:80-108 analog).
    if todo:
        built = {r["shard"]: r for r in
                 (post.where(F.col("shard").isin(todo)).groupBy("shard")
                      .agg(F.countDistinct("term").alias("n_terms"),
                           F.sum("df").alias("n_postings"),
                           F.sum("nbytes").alias("bytes"),
                           F.max("enc_us").alias("max_enc_us"))
                      .collect())}
        wall_us = int((time.perf_counter() - t_start) * 1e6)
        man_rows = []
        for s in sorted(todo_set):
            r = built.get(s)
            man_rows.append((
                int(s),
                int(r["n_terms"]) if r else 0,
                int(r["n_postings"]) if r else 0,
                int(r["bytes"]) if r else 0,
                int(r["max_enc_us"]) if r else 0,
                "committed", build_id, wall_us, N))
        spark.createDataFrame(
            man_rows,
            "shard int, n_terms long, n_postings long, bytes long, "
            "max_enc_us long, status string, build_id string, "
            "build_wall_us long, corpus_docs long"
        ).write.mode("append").parquet(storage.path(out_dir, "manifest"))

    doc.unpersist()
    if cached_parent is not None:
        cached_parent.unpersist()
    mark("manifest")
    return {"n_docs": N, "avgdl": avgdl, "num_shards": cfg.num_shards,
            "docs_per_shard": docs_per_shard, "built_shards": sorted(todo_set),
            "build_id": build_id, "phases": phases,
            "wall_sec": time.perf_counter() - t_start}
