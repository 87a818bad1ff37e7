"""API-matrix completion (VERDICT r02 #5 + ADVICE r02 #3): every query
surface must support field= (multi-field indexes) and org= (routed
indexes), rank-identical to the surface that already had the feature.

Fixtures build three small indexes over the SAME corpus/order (so
docids align): classic (text only), mf (text+meta fields), routed
(org tenant routing).
"""
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import TokenizerConfig
from sparkfts.fixtures import make_transcripts


@pytest.fixture(scope="module")
def corpus():
    pdf = make_transcripts(25, seed=77)
    pdf = pdf.assign(meta=(pdf["role"] + " " + pdf["tool"].fillna("")),
                     org=[f"o{i % 3}" for i in range(len(pdf))])
    return pdf


@pytest.fixture(scope="module")
def idx_classic(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("amx_classic"))
    build_index(spark, spark.createDataFrame(corpus), root,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=4, partitions=4))
    return FTSIndex(spark, root)


@pytest.fixture(scope="module")
def idx_mf(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("amx_mf"))
    cfg = BuildConfig(num_shards=4, partitions=4,
                      fields={"text": TokenizerConfig(),
                              "meta": TokenizerConfig()})
    build_index(spark, spark.createDataFrame(corpus), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    return FTSIndex(spark, root)


@pytest.fixture(scope="module")
def idx_routed(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("amx_routed"))
    cfg = BuildConfig(num_shards=4, partitions=4, routing_col="org",
                      shards_per_org=2)
    build_index(spark, spark.createDataFrame(corpus), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    return FTSIndex(spark, root)


def _pd(df):
    return df.toPandas().reset_index(drop=True)


def _same(a, b):
    assert a["docid"].tolist() == b["docid"].tolist()
    assert a["score"].to_numpy() == pytest.approx(
        b["score"].to_numpy(), abs=1e-9)


def test_phrase_topk_field_scoped(idx_classic, idx_mf):
    """phrase_topk(field='text') on the mf index must equal phrase_topk
    on a classic index built over the same text column (same docids,
    same field avgdl/df ⇒ identical scores); fieldless phrase on an mf
    index must raise like topk does."""
    for phrase in ["nightly index", "block max wand", "alpha",
                   "zzz absent phrase"]:
        want = _pd(idx_classic.phrase_topk(phrase, k=10))
        got = _pd(idx_mf.phrase_topk(phrase, k=10, field="text"))
        _same(got, want)
    with pytest.raises(ValueError, match="field"):
        idx_mf.phrase_topk("nightly index", k=5)
    with pytest.raises(ValueError, match="fields"):
        idx_classic.phrase_topk("nightly index", k=5, field="text")


def test_phrase_topk_meta_field_no_cross_field_adjacency(idx_mf, corpus):
    """Adjacency must be within the chosen field only."""
    got = {r["docid"] for r in
           idx_mf.phrase_topk("assistant search_tool", k=1000,
                              field="meta").collect()}
    pdf = (corpus.sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    want = {i for i, v in enumerate(pdf["meta"])
            if "assistant search_tool" in " ".join(v.lower().split())}
    assert got == want


def test_topk_local_org_scoped(idx_routed):
    """topk_local(org=) — the ms-latency path — must be rank-identical
    to the distributed topk(org=)."""
    for q, mode in [("alpha index query", "or"), ("shard merge", "and")]:
        for org in ("o0", "o1", "o2"):
            want = _pd(idx_routed.topk(q, k=10, mode=mode, org=org))
            got = idx_routed.topk_local(q, k=10, mode=mode, org=org)
            _same(got, want)
    # unknown tenant → empty, not error
    assert idx_routed.topk_local("alpha", k=5, org="nope").empty


def test_topk_local_org_requires_routed_index(idx_classic):
    with pytest.raises(ValueError, match="routing"):
        idx_classic.topk_local("alpha", k=5, org="o1")


def test_topk_many_field_scoped(idx_mf):
    """topk_many(field=) must match per-query topk(field=) and raise on
    a fieldless batch over a multi-field index (ADVICE r02: it used to
    silently return empty)."""
    queries = {"a": ("alpha index query", "or"),
               "b": ("shard merge", "and"),
               "c": ("assistant", "or")}
    got = idx_mf.topk_many(queries, k=10, field="text")
    for qid, (q, mode) in queries.items():
        want = idx_mf.topk_pandas(q, k=10, mode=mode, field="text")
        _same(got[qid], want)
    with pytest.raises(ValueError, match="field"):
        idx_mf.topk_many(queries, k=10)


def test_topk_many_org_scoped(idx_routed):
    """topk_many(org=) must match per-query topk(org=)."""
    queries = {"a": ("alpha index query", "or"),
               "b": ("shard merge", "and")}
    for org in ("o0", "o2"):
        got = idx_routed.topk_many(queries, k=10, org=org)
        for qid, (q, mode) in queries.items():
            want = _pd(idx_routed.topk(q, k=10, mode=mode, org=org))
            _same(got[qid], want)


def test_search_surfaces_pass_through(idx_routed, idx_mf):
    """search/search_local accept org=/field= and agree with topk."""
    hits = idx_routed.search_local("alpha index query", k=5, org="o1")
    want = idx_routed.topk_local("alpha index query", k=5, org="o1")
    assert hits["docid"].tolist() == want["docid"].tolist()
    if not hits.empty:
        assert "text" in hits.columns
    got = _pd(idx_mf.search("alpha index query", k=5, field="text"))
    wantf = idx_mf.topk_pandas("alpha index query", k=5, field="text")
    assert got["docid"].tolist() == wantf["docid"].tolist()


def test_phrase_topk_org_scoped(idx_routed, corpus):
    """phrase_topk(org=) must equal the unrestricted phrase ranking
    filtered to the tenant's docs (global stats), like topk(org=)."""
    pdf = (corpus.sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    for org in ("o0", "o1", "o2"):
        keep = {int(r["docid"]) for r in
                idx_routed._docstore.where(f"org = '{org}'")
                .select("docid").collect()}
        full = _pd(idx_routed.phrase_topk("nightly index", k=10_000))
        want = full[full["docid"].isin(keep)].head(10).reset_index(
            drop=True)
        got = _pd(idx_routed.phrase_topk("nightly index", k=10, org=org))
        _same(got, want)
    # unknown tenant → empty
    assert _pd(idx_routed.phrase_topk("nightly index", k=5,
                                      org="nope")).empty


def test_phrase_topk_org_requires_routed_index(idx_classic):
    with pytest.raises(ValueError, match="routing"):
        idx_classic.phrase_topk("nightly index", k=5, org="o0")


def test_match_docids_org_scoped(idx_routed):
    for org in ("o0", "o2"):
        keep = {int(r["docid"]) for r in
                idx_routed._docstore.where(f"org = '{org}'")
                .select("docid").collect()}
        for mode in ("and", "or"):
            full = [r["docid"] for r in
                    idx_routed.match_docids("alpha index",
                                            mode).collect()]
            got = [r["docid"] for r in
                   idx_routed.match_docids("alpha index", mode,
                                           org=org).collect()]
            assert got == [d for d in full if d in keep], (org, mode)


# ------------------------------------------------------------------ #
# Round 4: zero-Spark-job twins for phrase + boolean match           #
# ------------------------------------------------------------------ #

def _zero_jobs(spark, tag, fn):
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    out = fn()
    jobs = sc.statusTracker().getJobIdsForGroup(tag)
    sc.setJobGroup(None, None)
    assert len(jobs) == 0, f"{tag}: local path must not launch Spark jobs"
    return out


def test_phrase_topk_local_matches_distributed(spark, idx_classic,
                                               idx_mf, idx_routed):
    for idx, kw in [(idx_classic, {}), (idx_mf, {"field": "text"}),
                    (idx_routed, {"org": "o1"})]:
        want = _pd(idx.phrase_topk("nightly index", k=15, **kw))
        got = _zero_jobs(spark, f"ptl-{id(idx)}",
                         lambda: idx.phrase_topk_local("nightly index",
                                                       k=15, **kw))
        _same(got, want)
    # absent phrase and empty query
    assert idx_classic.phrase_topk_local("zzz qqq", k=5).empty
    assert idx_classic.phrase_topk_local("... !!!", k=5).empty


def test_match_docids_local_matches_distributed(spark, idx_classic,
                                                idx_mf, idx_routed):
    for idx, kw in [(idx_classic, {}), (idx_mf, {"field": "text"}),
                    (idx_routed, {"org": "o2"})]:
        for mode in ("and", "or"):
            want = _pd(idx.match_docids("alpha index", mode, **kw))
            got = _zero_jobs(
                spark, f"mdl-{id(idx)}-{mode}",
                lambda: idx.match_docids_local("alpha index", mode,
                                               **kw))
            assert got["docid"].tolist() == want["docid"].tolist(), \
                (mode, kw)
    # AND with an absent term is empty
    assert idx_classic.match_docids_local("alpha zzzmissing",
                                          "and").empty


def test_combined_local_twins(spark, corpus, tmp_path_factory):
    """CombinedIndex phrase_topk_local / match_docids_local over
    base+delta: zero jobs, rank-identical to the distributed surfaces
    (union-global stats for phrase)."""
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=3, partitions=4)
    base = corpus.iloc[:40]
    d1 = corpus.iloc[40:]
    root = str(tmp_path_factory.mktemp("amx_stream"))
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    make_batch_indexer(root, cfg=cfg)(spark.createDataFrame(d1),
                                      batch_id=0)
    ci = CombinedIndex(spark, root)
    want = ci.phrase_topk("nightly index", k=15)
    got = _zero_jobs(spark, "ci-ptl",
                     lambda: ci.phrase_topk_local("nightly index", k=15))
    assert got["docid"].tolist() == want["docid"].tolist()
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-9)
    for mode in ("and", "or"):
        wantm = ci.match_docids("alpha index", mode)
        gotm = _zero_jobs(
            spark, f"ci-mdl-{mode}",
            lambda: ci.match_docids_local("alpha index", mode))
        assert gotm["docid"].tolist() == wantm["docid"].tolist(), mode
