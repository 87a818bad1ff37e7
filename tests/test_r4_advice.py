"""Round-4 ADVICE regression tests:

1. Legacy stats rows (no docid_span) on routed / caller-docid indexes
   must NOT understate the id-space span (delta reservations would
   overlap the base's real docids while the CombinedIndex disjointness
   check, using the same understated span, silently passes).
2. RotationRegistry._next_seq must not parse a legacy all-digit id as a
   sequence number.
3. CombinedIndex.match_docids gains org=/field=; CombinedIndex.search
   is the distributed twin of search_local.
"""
import os

import pandas as pd
import pytest

from sparkfts import FTSIndex, storage
from sparkfts.build import BuildConfig, build_index
from sparkfts.fixtures import make_transcripts
from sparkfts.streaming import CombinedIndex, make_batch_indexer, \
    read_delta_log


def _strip_docid_span(root: str) -> None:
    """Rewrite every stats file without the docid_span column —
    simulates a stats row written before the field existed."""
    import pyarrow.parquet as pq
    sdir = storage.path(root, "stats")
    for fn in os.listdir(sdir):
        if not fn.endswith(".parquet") or fn.startswith(("_", ".")):
            continue
        p = os.path.join(sdir, fn)
        tbl = pq.read_table(p)
        tbl = tbl.drop_columns(["docid_span"])
        tmp = os.path.join(sdir, "_tmp-" + fn)
        pq.write_table(tbl, tmp)
        os.replace(tmp, p)


def test_legacy_routed_stats_span_derived(spark, tmp_path_factory):
    """Routed index with a legacy stats row: span must come from the
    routing geometry (num_shards * docs_per_shard), not n — and a delta
    attached afterwards must reserve PAST the base's sparse ids."""
    rcfg = BuildConfig(num_shards=4, partitions=4, routing_col="org",
                       shards_per_org=2)
    base = make_transcripts(12, seed=71).assign(
        org=lambda d: d["conv_id"].map(
            lambda c: f"o{sum(map(ord, c)) % 3}"))
    root = str(tmp_path_factory.mktemp("legacy_routed"))
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=rcfg)
    st = storage.read_stats(root)
    true_span = int(st["num_shards"]) * int(st["docs_per_shard"])
    assert int(st["docid_span"]) == true_span

    _strip_docid_span(root)
    st2 = storage.read_stats(root)
    assert "docid_span" not in st2
    assert storage.effective_docid_span(root, st2) == true_span
    assert FTSIndex(spark, root).docid_span == true_span

    # delta attachment on the legacy base must reserve past the sparse
    # ids; the old n-fallback would have reserved inside the base range
    d1 = make_transcripts(4, seed=72).assign(
        org=lambda d: d["conv_id"].map(
            lambda c: f"o{sum(map(ord, c)) % 3}"))
    make_batch_indexer(root, cfg=rcfg)(spark.createDataFrame(d1),
                                       batch_id=0)
    log = read_delta_log(root)
    assert log[0]["docid_offset"] >= true_span > len(base)
    ci = CombinedIndex(spark, root)   # disjointness check passes honestly
    got = ci.topk("alpha query", k=5)
    for d in got["docid"]:
        ci._sub_for(int(d))           # every hit routes to a real owner


def test_legacy_docid_col_span_from_footers(spark, tmp_path_factory):
    """Caller-docid index (sparse ids, no routing) with a legacy stats
    row: the parquet-footer max-docid scan recovers the true extent."""
    pdf = make_transcripts(10, seed=73)
    pdf = pdf.assign(myid=[i * 7 + 3 for i in range(len(pdf))])
    root = str(tmp_path_factory.mktemp("legacy_docidcol"))
    build_index(spark, spark.createDataFrame(pdf), root,
                docid_col="myid",
                cfg=BuildConfig(num_shards=2, partitions=2))
    true_span = int(pdf["myid"].max()) + 1
    assert int(storage.read_stats(root)["docid_span"]) == true_span

    _strip_docid_span(root)
    st = storage.read_stats(root)
    assert storage.effective_docid_span(root, st) == true_span > len(pdf)


def test_next_seq_ignores_alldigit_legacy_id(tmp_path):
    from sparkfts.rotation import IndexVersion, RotationRegistry
    reg = RotationRegistry(str(tmp_path))
    # legacy pre-sequence file whose 12-hex id is all digits
    with open(os.path.join(reg.base, "version-123456789012.json"),
              "w") as f:
        f.write('{"vid": "123456789012", "root": "/x", "state": "COMPLETE"}')
    def v(root):
        return IndexVersion(alias="a", root=root, index_date="2026-01-01",
                            registered_at="2026-01-01T00:00:00",
                            num_shards=2, build_id="b")
    vid = reg.register(v("/y"))
    assert vid.startswith("00000000-")
    vid2 = reg.register(v("/z"))
    assert vid2.startswith("00000001-")


@pytest.fixture(scope="module")
def routed_stream(spark, tmp_path_factory):
    """Routed multi-field base + one routed delta, plus the monolithic
    rebuild over all rows for rank-parity checks."""
    rcfg = BuildConfig(num_shards=4, partitions=4, routing_col="org",
                       shards_per_org=2)

    def prep(pdf):
        return pdf.assign(org=pdf["conv_id"].map(
            lambda c: f"o{sum(map(ord, c)) % 2}"))

    base, d1 = prep(make_transcripts(10, seed=74)), \
        prep(make_transcripts(4, seed=75))
    root = str(tmp_path_factory.mktemp("r4_stream"))
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=rcfg)
    make_batch_indexer(root, cfg=rcfg)(spark.createDataFrame(d1),
                                       batch_id=0)
    mroot = str(tmp_path_factory.mktemp("r4_mono"))
    build_index(spark,
                spark.createDataFrame(pd.concat([base, d1],
                                                ignore_index=True)),
                mroot, order_cols=["conv_id", "turn_idx"], cfg=rcfg)
    return CombinedIndex(spark, root), FTSIndex(spark, mroot)


def _keys(fetch, docids):
    if not len(docids):
        return []
    docs = fetch(list(docids))
    return sorted((r["conv_id"], int(r["turn_idx"]))
                  for _, r in docs.iterrows())


def test_combined_match_docids_org(spark, routed_stream):
    """ADVICE r3 #2: org-scoped boolean match over base+delta must equal
    the monolithic routed rebuild's match_docids(org=)."""
    ci, mono = routed_stream
    for org in ("o0", "o1"):
        for mode in ("and", "or"):
            got = ci.match_docids("alpha index", mode, org=org)
            want = mono.match_docids("alpha index", mode,
                                     org=org).toPandas()
            assert _keys(ci.fetch_docs, got["docid"]) == _keys(
                lambda i: mono.fetch_docs(i).toPandas(),
                want["docid"]), (org, mode)
            # org restriction is a strict subset of the global match
            glob = ci.match_docids("alpha index", mode)
            assert set(_keys(ci.fetch_docs, got["docid"])) <= set(
                _keys(ci.fetch_docs, glob["docid"]))


def test_combined_search_distributed_matches_local(spark, routed_stream):
    """CombinedIndex.search (Spark path) must equal search_local
    (zero-job path) column-for-column."""
    ci, _ = routed_stream
    for q, mode in [("alpha query index", "or"), ("shard merge", "and")]:
        got = ci.search(q, k=5, mode=mode)
        want = ci.search_local(q, k=5, mode=mode)
        assert got["docid"].tolist() == want["docid"].tolist()
        assert got["score"].tolist() == pytest.approx(
            want["score"].tolist(), abs=1e-12)
        assert set(got.columns) == set(want.columns)
        org_hits = ci.search(q, k=5, mode=mode, org="o0")
        org_local = ci.search_local(q, k=5, mode=mode, org="o0")
        assert org_hits["docid"].tolist() == org_local["docid"].tolist()
