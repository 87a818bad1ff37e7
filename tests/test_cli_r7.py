"""Round-7 CLI surface: query --kind prefix/wildcard/fuzzy with
--rewrite, --fuzziness, --max-expansions (A20 parity for the
multi-term query DSL)."""
import json

import pytest

from sparkfts.cli import main
from sparkfts.fixtures import make_transcripts


@pytest.fixture(autouse=True)
def no_stop(monkeypatch, spark):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    from sparkfts import BuildConfig, build_index
    p = str(tmp_path_factory.mktemp("cli7") / "idx")
    build_index(spark,
                spark.createDataFrame(make_transcripts(15, seed=93)),
                p, order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=2, partitions=2))
    return p


def _run(capsys, *argv):
    rc = main(["--master", "local[2]", *argv])
    out = capsys.readouterr().out.strip().splitlines()
    return rc, [json.loads(line) for line in out if line.startswith("{")]


def test_cli_prefix_local_equals_library(root, capsys, spark):
    from sparkfts import FTSIndex
    rc, rows = _run(capsys, "query", "--index", root, "--q", "re",
                    "--kind", "prefix", "--k", "5", "--local")
    assert rc == 0 and rows
    want = FTSIndex(spark, root).pattern_topk_local("re", "prefix", k=5)
    assert [r["docid"] for r in rows] == want["docid"].tolist()


def test_cli_prefix_distributed_and_wildcard(root, capsys):
    rc, d = _run(capsys, "query", "--index", root, "--q", "re",
                 "--kind", "prefix", "--k", "5")
    rc2, loc = _run(capsys, "query", "--index", root, "--q", "re",
                    "--kind", "prefix", "--k", "5", "--local")
    assert rc == 0 and rc2 == 0
    assert [r["docid"] for r in d] == [r["docid"] for r in loc]
    rc, w = _run(capsys, "query", "--index", root, "--q", "r?build",
                 "--kind", "wildcard", "--k", "5", "--local")
    assert rc == 0


def test_cli_fuzzy_and_constant_score(root, capsys, spark):
    from sparkfts import FTSIndex
    rc, rows = _run(capsys, "query", "--index", root, "--q", "rebiuld",
                    "--kind", "fuzzy", "--fuzziness", "2", "--k", "5",
                    "--local")
    assert rc == 0
    idx = FTSIndex(spark, root)
    want = idx.pattern_topk_local("rebiuld", "fuzzy", k=5, fuzziness=2)
    assert [r["docid"] for r in rows] == want["docid"].tolist()
    rc, cs = _run(capsys, "query", "--index", root, "--q", "re",
                  "--kind", "prefix", "--rewrite", "constant_score",
                  "--k", "5", "--local")
    assert rc == 0
    assert all(r["score"] == 1.0 for r in cs)
    assert [r["docid"] for r in cs] == sorted(r["docid"] for r in cs)


def test_cli_kind_rejects_incompatible_flags(root, capsys):
    with pytest.raises(SystemExit):
        main(["--master", "local[2]", "query", "--index", root,
              "--q", "re", "--kind", "prefix", "--phrase"])
    with pytest.raises(SystemExit):
        main(["--master", "local[2]", "query", "--index", root,
              "--q", "re", "--kind", "prefix", "--mode", "and"])
    with pytest.raises(SystemExit):
        main(["--master", "local[2]", "query", "--index", root,
              "--q", "re", "--kind", "prefix", "--similarity",
              "classic"])


def test_cli_regexp_kind(root, capsys, spark):
    from sparkfts import FTSIndex
    rc, rows = _run(capsys, "query", "--index", root, "--q",
                    "re(build|sume)", "--kind", "regexp", "--k", "5",
                    "--local")
    assert rc == 0
    want = FTSIndex(spark, root).pattern_topk_local(
        "re(build|sume)", "regexp", k=5)
    assert [r["docid"] for r in rows] == want["docid"].tolist()


def test_cli_must_not(root, capsys, spark):
    from sparkfts import FTSIndex
    rc, rows = _run(capsys, "query", "--index", root, "--q",
                    "alpha query", "--must-not", "batch", "--k", "5",
                    "--local")
    assert rc == 0
    want = FTSIndex(spark, root).topk_local("alpha query", k=5,
                                            must_not="batch")
    assert [r["docid"] for r in rows] == want["docid"].tolist()
    with pytest.raises(SystemExit):
        main(["--master", "local[2]", "query", "--index", root,
              "--q", "alpha", "--must-not", "batch", "--phrase"])


@pytest.fixture(scope="module")
def mf_root(spark, tmp_path_factory):
    from sparkfts import BuildConfig, build_index
    from sparkfts.analyzer import TokenizerConfig
    pdf = make_transcripts(12, seed=94)
    pdf = pdf.assign(meta=(pdf["role"] + " " + pdf["tool"].fillna("")))
    p = str(tmp_path_factory.mktemp("cli7mf") / "idx")
    build_index(spark, spark.createDataFrame(pdf), p,
                order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=2, partitions=2,
                                fields={"text": TokenizerConfig(),
                                        "meta": TokenizerConfig()}))
    return p


def test_cli_multi_match(mf_root, capsys, spark):
    from sparkfts import FTSIndex
    rc, rows = _run(capsys, "query", "--index", mf_root, "--q",
                    "assistant alpha", "--fields", "text=1.0,meta=2.0",
                    "--type", "best_fields", "--tie-breaker", "0.3",
                    "--k", "5", "--local")
    assert rc == 0 and rows
    want = FTSIndex(spark, mf_root).multi_match_local(
        "assistant alpha", fields={"text": 1.0, "meta": 2.0}, k=5,
        qtype="best_fields", tie_breaker=0.3)
    assert [r["docid"] for r in rows] == want["docid"].tolist()
    assert [round(r["score"], 9) for r in rows] == [
        round(v, 9) for v in want["score"]]
    with pytest.raises(SystemExit):
        main(["--master", "local[2]", "query", "--index", mf_root,
              "--q", "alpha", "--fields", "text", "--filter",
              "role = 'user'"])


def test_cli_agg_count_sort_cardinality(root, capsys, spark):
    from sparkfts import FTSIndex
    idx = FTSIndex(spark, root)
    rc = main(["--master", "local[2]", "agg", "--index", root,
               "--q", "alpha", "--what", "count", "--mode", "or"])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert got["count"] == idx.count("alpha", mode="or")

    rc, rows = _run(capsys, "agg", "--index", root, "--q", "alpha",
                    "--what", "sort", "--by", "turn_idx", "--k", "7",
                    "--mode", "or")
    assert rc == 0 and len(rows) == 7
    want = idx.sorted_search("alpha", by="turn_idx", k=7,
                             mode="or").collect()
    assert [r["docid"] for r in rows] == [r["docid"] for r in want]

    rc = main(["--master", "local[2]", "agg", "--index", root,
               "--q", "alpha", "--what", "cardinality", "--by",
               "role", "--mode", "or"])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and not got["approx"]
    assert got["cardinality"] == idx.facet_cardinality(
        "alpha", by="role", mode="or")


def test_cli_agg_buckets(root, capsys, spark):
    from sparkfts import FTSIndex
    idx = FTSIndex(spark, root)
    rc, rows = _run(capsys, "agg", "--index", root, "--q", "alpha",
                    "--what", "counts", "--by", "role", "--mode", "or")
    want = idx.facet_counts("alpha", by="role", k=20,
                            mode="or").collect()
    assert rc == 0
    assert [(r["value"], r["doc_count"]) for r in rows] == \
        [(r["value"], r["doc_count"]) for r in want]

    rc, rows = _run(capsys, "agg", "--index", root, "--q", "alpha",
                    "--what", "stats", "--by", "role", "--metric",
                    "turn_idx", "--mode", "or")
    want = idx.facet_metrics("alpha", by="role", metric="turn_idx",
                             mode="or").collect()
    assert rc == 0
    assert [(r["value"], r["sum"]) for r in rows] == \
        [(r["value"], r["sum"]) for r in want]

    rc, rows = _run(capsys, "agg", "--index", root, "--q", "alpha",
                    "--what", "percentiles", "--metric", "turn_idx",
                    "--percentiles", "50,95", "--mode", "or")
    want = idx.facet_percentiles("alpha", metric="turn_idx",
                                 percentiles=(50.0, 95.0),
                                 mode="or").collect()
    assert rc == 0
    assert [(r["p"], r["pctl"]) for r in rows] == \
        [(r["p"], r["pctl"]) for r in want]

    rc, rows = _run(capsys, "agg", "--index", root, "--q", "alpha",
                    "--what", "top-hits", "--by", "role", "--k", "3",
                    "--k-hits", "2", "--mode", "or")
    want = idx.facet_top_hits("alpha", by="role", k_buckets=3,
                              k_hits=2, mode="or").collect()
    assert rc == 0
    assert [(r["value"], r["docid"]) for r in rows] == \
        [(r["value"], r["docid"]) for r in want]

    with pytest.raises(SystemExit):   # --what sort requires --by
        main(["--master", "local[2]", "agg", "--index", root,
              "--q", "alpha", "--what", "sort"])
    with pytest.raises(SystemExit):   # stats requires --metric
        main(["--master", "local[2]", "agg", "--index", root,
              "--q", "alpha", "--what", "stats", "--by", "role"])


def test_cli_must_matches_library(root, capsys, spark):
    """--must (bool must+should): CLI rows equal topk(must=) on both
    the distributed and local paths; incompatible flags exit."""
    from sparkfts import FTSIndex
    idx = FTSIndex(spark, root)
    want = idx.topk_pandas("query index", k=5, mode="or", must="alpha")
    rc, rows = _run(capsys, "query", "--index", root,
                    "--q", "query index", "--must", "alpha",
                    "--k", "5")
    assert rc == 0
    assert [r["docid"] for r in rows] == want["docid"].tolist()
    rc, loc = _run(capsys, "query", "--index", root,
                   "--q", "query index", "--must", "alpha",
                   "--k", "5", "--local")
    assert rc == 0
    assert [r["docid"] for r in loc] == want["docid"].tolist()
    with pytest.raises(SystemExit):   # must requires OR mode
        main(["--master", "local[2]", "query", "--index", root,
              "--q", "query index", "--must", "alpha",
              "--mode", "and"])
    with pytest.raises(SystemExit):   # not with --kind expansions
        main(["--master", "local[2]", "query", "--index", root,
              "--q", "re", "--kind", "prefix", "--must", "alpha"])


@pytest.mark.slow
def test_cli_boost_matches_library(root, capsys, spark):
    """--boost TERM=W scales clause weights like topk(boosts=)."""
    from sparkfts import FTSIndex
    idx = FTSIndex(spark, root)
    want = idx.topk_pandas("alpha query", k=5,
                           boosts={"alpha": 2.0})
    rc, rows = _run(capsys, "query", "--index", root,
                    "--q", "alpha query", "--boost", "alpha=2.0",
                    "--k", "5")
    assert rc == 0
    assert [r["docid"] for r in rows] == want["docid"].tolist()
    rc, loc = _run(capsys, "query", "--index", root,
                   "--q", "alpha query", "--boost", "alpha=2.0",
                   "--k", "5", "--local")
    assert rc == 0
    assert [r["docid"] for r in loc] == want["docid"].tolist()
    with pytest.raises(SystemExit):   # malformed pair
        main(["--master", "local[2]", "query", "--index", root,
              "--q", "alpha query", "--boost", "alpha"])
    with pytest.raises(SystemExit):   # not with expansions
        main(["--master", "local[2]", "query", "--index", root,
              "--q", "re", "--kind", "prefix", "--boost", "re=2"])


@pytest.mark.slow
def test_cli_histograms_match_library(root, capsys, spark):
    from sparkfts import FTSIndex
    idx = FTSIndex(spark, root)
    rc, rows = _run(capsys, "agg", "--index", root, "--q", "alpha",
                    "--what", "histogram", "--metric", "turn_idx",
                    "--interval", "5", "--mode", "or")
    want = idx.facet_histogram("alpha", on="turn_idx", interval=5,
                               mode="or").collect()
    assert rc == 0
    assert [(r["bucket"], r["doc_count"]) for r in rows] == \
        [(r["bucket"], r["doc_count"]) for r in want]
    rc, rows = _run(capsys, "agg", "--index", root, "--q", "alpha",
                    "--what", "date-histogram", "--metric", "ts",
                    "--interval", "day", "--mode", "or")
    want = idx.facet_date_histogram("alpha", on="ts", interval="day",
                                    mode="or").collect()
    assert rc == 0
    assert [(r["bucket"], r["doc_count"]) for r in rows] == \
        [(str(r["bucket"]), r["doc_count"]) for r in want]
    with pytest.raises(SystemExit):   # requires --interval
        main(["--master", "local[2]", "agg", "--index", root,
              "--q", "alpha", "--what", "histogram",
              "--metric", "turn_idx"])


@pytest.mark.slow
def test_cli_phrase_slop_matches_library(root, capsys, spark):
    from sparkfts import FTSIndex
    idx = FTSIndex(spark, root)
    want = idx.phrase_topk_local("rebuild nightly", k=8, slop=2)
    rc, rows = _run(capsys, "query", "--index", root,
                    "--q", "rebuild nightly", "--phrase",
                    "--slop", "2", "--k", "8", "--local")
    assert rc == 0
    assert [r["docid"] for r in rows] == want["docid"].tolist()
    with pytest.raises(SystemExit):   # slop requires --phrase
        main(["--master", "local[2]", "query", "--index", root,
              "--q", "rebuild nightly", "--slop", "2"])
