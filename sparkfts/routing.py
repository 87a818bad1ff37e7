"""Tenant/org-scoped shard routing + query-side shard pruning.

The reference's signature routing capability rebuilt from scratch
(ElasticsearchRoutingStrategyV1.java:16-23, 114-148; README.md:54-58):
an org's documents are spread over exactly ``shards_per_org`` of the
``num_shards`` index shards, so

  * an org-scoped query fans out to k shards instead of all N — the
    ``getPossibleRoutingHashes`` analog is :func:`possible_shards`;
  * a hot org still spreads over k shards (bounded skew), and distinct
    orgs land in distinct shard groups (spread invariants mirrored from
    ElasticsearchRoutingStrategyV1Test.java:55-139 in
    tests/test_routing.py).

Layout: shards are split into G = num_shards // shards_per_org
contiguous GROUPS of k shards. An org hashes to one group; each of its
documents hashes to one shard inside that group. ``num_shards`` must be
a multiple of ``shards_per_org``.

The hash must be computable by THREE engines on identical inputs — the
Python query planner (no JVM round-trip), Spark SQL built-ins (build
time, codegen'd), and ANSI SQL (the DuckDB correctness oracle) — so it
is defined arithmetically over the md5 hex digest:

    H(s) = sum_{i=0..7} ascii(md5_hex(s)[i]) * 131^i      (fits int64)

md5 supplies the avalanche; the ascii fold only needs to keep it.
"""
from __future__ import annotations

import hashlib

MULT = 131
NCHARS = 8
_POW = [MULT ** i for i in range(NCHARS)]


def _fold(hexdigest: str) -> int:
    return sum(ord(c) * p for c, p in zip(hexdigest[:NCHARS], _POW))


def org_hash(org: str) -> int:
    """H(org) — the routing hash (python side)."""
    return _fold(hashlib.md5(org.encode("utf-8")).hexdigest())


def n_groups(num_shards: int, shards_per_org: int) -> int:
    if num_shards % shards_per_org != 0:
        raise ValueError(
            f"num_shards={num_shards} must be a multiple of "
            f"shards_per_org={shards_per_org}")
    return num_shards // shards_per_org


def possible_shards(org: str, num_shards: int,
                    shards_per_org: int) -> list[int]:
    """All shards that may hold this org's documents — the query-side
    pruning set (getPossibleRoutingHashes analog,
    ElasticsearchRoutingStrategyV1.java:137-148)."""
    g = org_hash(org) % n_groups(num_shards, shards_per_org)
    return [g * shards_per_org + j for j in range(shards_per_org)]


def doc_shard(org: str, doc_key: str, num_shards: int,
              shards_per_org: int) -> int:
    """Shard for one document: org picks the group, the doc key picks
    the member (python reference used by tests/oracles)."""
    g = org_hash(org) % n_groups(num_shards, shards_per_org)
    return g * shards_per_org + org_hash(doc_key) % shards_per_org


# -------------------------------------------------------------- Spark side
def hash_col(col):
    """Spark Column: H(col) — same fold over F.md5, pure built-ins."""
    from pyspark.sql import functions as F
    md5 = F.md5(F.encode(col.cast("string"), "UTF-8"))
    v = F.lit(0).cast("long")
    for i in range(NCHARS):
        v = v + F.ascii(F.substring(md5, i + 1, 1)).cast("long") * _POW[i]
    return v


def shard_col(org_col, key_col, num_shards: int, shards_per_org: int):
    """Spark Column: the document's shard under org routing."""
    from pyspark.sql import functions as F
    g = F.pmod(hash_col(org_col),
               F.lit(n_groups(num_shards, shards_per_org)))
    member = F.pmod(hash_col(key_col), F.lit(shards_per_org))
    return (g * shards_per_org + member).cast("int")


# ---------------------------------------------------------------- SQL side
def sql_hash(expr: str) -> str:
    """ANSI-SQL (DuckDB) rendering of H(expr) for correctness oracles."""
    terms = " + ".join(
        f"ascii(substr(md5(CAST(({expr}) AS VARCHAR)), {i + 1}, 1))"
        f"::BIGINT * {_POW[i]}"
        for i in range(NCHARS))
    return f"({terms})"


def sql_shard(org_expr: str, key_expr: str, num_shards: int,
              shards_per_org: int) -> str:
    """ANSI-SQL rendering of doc_shard(...)."""
    g = n_groups(num_shards, shards_per_org)
    return (f"(({sql_hash(org_expr)}) % {g}) * {shards_per_org} "
            f"+ (({sql_hash(key_expr)}) % {shards_per_org})")
