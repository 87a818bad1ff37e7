"""Multi-field indexing: per-field analyzers, field-prefixed terms,
per-field doc lengths/avgdl, field-scoped BM25 — the reference's
per-index template + per-field analyzer capability rebuilt
(BaseESReducer.java:107-132)."""
import numpy as np
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.analyzer import TokenizerConfig
from sparkfts.fixtures import make_transcripts
from sparkfts.oracle import BM25Oracle


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = make_transcripts(25, seed=21)
    # second analyzed field with its own distribution (role+tool tags)
    pdf = pdf.assign(meta=(pdf["role"] + " " + pdf["tool"].fillna("")))
    sdf = spark.createDataFrame(pdf)
    root = str(tmp_path_factory.mktemp("mf"))
    cfg = BuildConfig(num_shards=4, partitions=4,
                      fields={"text": TokenizerConfig(),
                              "meta": TokenizerConfig()})
    build_index(spark, sdf, root, order_cols=["conv_id", "turn_idx"],
                cfg=cfg)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return root, pdf


def test_field_scoped_bm25_matches_per_field_oracle(spark, built):
    root, pdf = built
    idx = FTSIndex(spark, root)
    assert set(idx.fields) == {"text", "meta"}
    ids = np.arange(len(pdf), dtype=np.int64)
    for fld, q, mode in [("text", "alpha index query", "or"),
                         ("text", "shard merge", "and"),
                         ("meta", "assistant search", "or"),
                         ("meta", "user", "or")]:
        oracle = BM25Oracle(ids, pdf[fld].reset_index(drop=True))
        got = idx.topk_pandas(q, k=10, mode=mode, field=fld)
        want = oracle.topk(q, k=10, mode=mode)
        assert got["docid"].tolist() == want["docid"].tolist(), (fld, q)
        assert got["score"].to_numpy() == pytest.approx(
            want["score"].to_numpy(), abs=1e-9), (fld, q)


def test_fields_have_independent_stats(spark, built):
    root, pdf = built
    idx = FTSIndex(spark, root)
    # per-field avgdl equals the field's true mean token count
    for fld in ("text", "meta"):
        toks = (pdf[fld].str.lower()
                .str.split("[^a-z0-9]+", regex=True)
                .map(lambda ts: len([t for t in ts if t])))
        assert idx.fields[fld] == pytest.approx(float(toks.mean()))
    # terms are field-prefixed in the dictionary
    terms = {r["term"] for r in spark.read.parquet(root + "/term_stats")
             .select("term").collect()}
    assert all(":" in t for t in terms)
    assert any(t.startswith("text:") for t in terms)
    assert any(t.startswith("meta:") for t in terms)


def test_field_required_on_multifield_index(spark, built):
    root, _ = built
    idx = FTSIndex(spark, root)
    with pytest.raises(ValueError, match="field"):
        idx.topk_pandas("alpha", k=5)
    with pytest.raises(ValueError, match="field"):
        idx.topk_pandas("alpha", k=5, field="nope")


def test_field_param_rejected_on_classic_index(spark, tmp_path_factory):
    pdf = make_transcripts(5, seed=4)
    sdf = spark.createDataFrame(pdf)
    root = str(tmp_path_factory.mktemp("classic"))
    build_index(spark, sdf, root, order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=2, partitions=2))
    idx = FTSIndex(spark, root)
    with pytest.raises(ValueError, match="fields"):
        idx.topk_pandas("alpha", k=5, field="text")


def test_match_docids_field_scoped(spark, built):
    root, pdf = built
    idx = FTSIndex(spark, root)
    got = [r["docid"] for r in
           idx.match_docids("assistant", "and", field="meta").collect()]
    want = [i for i, v in enumerate(pdf["meta"]) if "assistant" in v.split()]
    assert got == want


def test_routing_composes_with_fields(spark, tmp_path_factory):
    """Tenant routing and multi-field indexing are orthogonal config
    axes — a build using BOTH must produce a field-scoped, org-scoped
    ranking equal to the brute-force oracle filtered to the org."""
    import numpy as np
    pdf = make_transcripts(20, seed=33)
    pdf = pdf.assign(meta=(pdf["role"] + " " + pdf["tool"].fillna("")),
                     org=[f"o{i % 3}" for i in range(len(pdf))])
    sdf = spark.createDataFrame(pdf)
    root = str(tmp_path_factory.mktemp("mfr"))
    cfg = BuildConfig(num_shards=4, partitions=4, routing_col="org",
                      shards_per_org=2,
                      fields={"text": TokenizerConfig(),
                              "meta": TokenizerConfig()})
    build_index(spark, sdf, root, order_cols=["conv_id", "turn_idx"],
                cfg=cfg)
    idx = FTSIndex(spark, root)
    ds = (idx._docstore.toPandas()
          .sort_values("docid").reset_index(drop=True))
    oracle = BM25Oracle(ds["docid"].to_numpy(np.int64),
                        ds["text"].reset_index(drop=True))
    keep = set(ds[ds["org"] == "o1"]["docid"])
    got = idx.topk_pandas("alpha index query", k=10, mode="or",
                          org="o1", field="text")
    want = oracle.topk("alpha index query", k=len(ds), mode="or")
    want = want[want["docid"].isin(keep)].head(10).reset_index(drop=True)
    assert got["docid"].tolist() == want["docid"].tolist()
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-9)


def test_topk_local_field_scoped(spark, built):
    """The no-Spark-job local path must honor field scoping on
    multi-field indexes (and refuse fieldless queries, instead of
    silently returning empty for unprefixed terms)."""
    import numpy as np
    root, pdf = built
    idx = FTSIndex(spark, root)
    with pytest.raises(ValueError, match="field"):
        idx.topk_local("alpha", k=5)
    ids = np.arange(len(pdf), dtype=np.int64)
    for fld, q in [("text", "alpha index query"), ("meta", "assistant")]:
        oracle = BM25Oracle(ids, pdf[fld].reset_index(drop=True))
        got = idx.topk_local(q, k=10, field=fld)
        want = oracle.topk(q, k=10)
        assert got["docid"].tolist() == want["docid"].tolist(), fld
        assert got["score"].to_numpy() == pytest.approx(
            want["score"].to_numpy(), abs=1e-9)
