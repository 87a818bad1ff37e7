"""sparkfts — PySpark-native offline full-text index builder + BM25 engine.

A from-scratch re-expression of the capability of
purecloudlabs/elasticsearch-lambda (Hadoop MR → embedded Elasticsearch →
shard snapshots) as an idiomatic Spark DataFrame pipeline: posting-list
construction, delta+varint compression with block-max metadata, BM25
(k1=1.2, b=0.75) top-k with block-max pruning, shard-pruned doc fetch,
and checkpoint-resumable builds with per-shard lineage manifests.
"""
from .analyzer import TokenizerConfig, tokenize_series, tokenize_text
from .build import BuildConfig, assign_docids, build_index, build_many
from .classic import classic_topk, classic_topk_local
from .doctype import TypedIndex, build_typed, pivot_types, type_doc_counts
from .es_routing import EsRoutingStrategyV1
from .query import FTSIndex
from .rotation import AliasWatch, IndexVersion, RotationRegistry
from .serving import ServingIndex
from .streaming import (CombinedIndex, compact, make_batch_indexer,
                        nightly_rotate)

__all__ = [
    "TokenizerConfig", "tokenize_series", "tokenize_text",
    "BuildConfig", "assign_docids", "build_index", "build_many",
    "TypedIndex", "build_typed", "pivot_types", "type_doc_counts",
    "FTSIndex", "classic_topk", "classic_topk_local",
    "EsRoutingStrategyV1",
    "AliasWatch", "IndexVersion", "RotationRegistry", "ServingIndex",
    "CombinedIndex", "compact", "make_batch_indexer", "nightly_rotate",
]
