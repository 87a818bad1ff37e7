"""On-disk index layout + manifest/commit helpers.

Layout under one index root (parquet directories; the thin-interface
analog of the reference's scheme-switched SnapshotTransportStrategy.java:
17-27 — Spark's Hadoop FS connectors pick the backend from the path
scheme, so s3a://... works unchanged at scale):

  <root>/docstore/shard=K/    input rows + docid + dl, sorted by docid
  <root>/postings/shard=K/    dictionary + compressed posting rows
  <root>/term_stats/          global (term, df, cf) — idf source
  <root>/stats/               single row: N, avgdl, shard geometry, k1/b
  <root>/manifest/            per-shard committed rows (lineage + metrics)

The manifest is the resume ledger (the reference's merged+deduped
manifest files, IndexingPostProcessor.java:33-69, re-expressed as a
table): a shard is committed iff a manifest row says so.
"""
from __future__ import annotations

import os
import uuid


def path(root: str, part: str) -> str:
    return os.path.join(root, part)


def new_build_id(root: str) -> str:
    return uuid.uuid5(uuid.NAMESPACE_URL,
                      f"sparkfts://{os.path.abspath(root)}/{os.getpid()}"
                      f"/{uuid.uuid4()}").hex[:12]


def manifest_exists(root: str) -> bool:
    p = path(root, "manifest")
    return os.path.isdir(p) and any(
        f.endswith(".parquet") for f in os.listdir(p))


def committed_shards(spark, root: str) -> set[int]:
    if not manifest_exists(root):
        return set()
    rows = (spark.read.parquet(path(root, "manifest"))
            .where("status = 'committed'")
            .select("shard").distinct().collect())
    return {int(r["shard"]) for r in rows}
