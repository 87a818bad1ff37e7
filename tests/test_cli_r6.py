"""Round-6 CLI surface: query --after (deep pagination cursor),
query --similarity classic, and the Spark-free es-route command."""
import json

import numpy as np
import pytest

from sparkfts.cli import main
from sparkfts.fixtures import make_transcripts


@pytest.fixture(autouse=True)
def no_stop(monkeypatch, spark):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    from sparkfts import BuildConfig, build_index
    p = str(tmp_path_factory.mktemp("cli6") / "idx")
    build_index(spark,
                spark.createDataFrame(make_transcripts(15, seed=93)),
                p, order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=2, partitions=2))
    return p


def _run(capsys, *argv):
    rc = main(["--master", "local[2]", *argv])
    out = capsys.readouterr().out.strip().splitlines()
    return rc, [json.loads(line) for line in out if line.startswith("{")]


def test_cli_query_after_pages(root, capsys):
    rc, p1 = _run(capsys, "query", "--index", root, "--q",
                  "alpha query index", "--k", "4", "--local")
    assert rc == 0 and len(p1) == 4
    cursor = f"{p1[-1]['score']},{p1[-1]['docid']}"
    rc, p2 = _run(capsys, "query", "--index", root, "--q",
                  "alpha query index", "--k", "4", "--local",
                  "--after", cursor)
    assert rc == 0
    rc, top8 = _run(capsys, "query", "--index", root, "--q",
                    "alpha query index", "--k", "8", "--local")
    assert [r["docid"] for r in p1 + p2] == \
        [r["docid"] for r in top8]


def test_cli_query_similarity_classic(root, capsys):
    from sparkfts import FTSIndex, classic_topk_local
    from sparkfts.session import get_spark
    rc, rows = _run(capsys, "query", "--index", root, "--q",
                    "alpha query index", "--k", "5", "--local",
                    "--similarity", "classic")
    assert rc == 0 and rows
    spark = get_spark(master="local[2]")
    want = classic_topk_local(FTSIndex(spark, root),
                              "alpha query index", k=5, mode="or")
    assert [r["docid"] for r in rows] == want["docid"].tolist()
    np.testing.assert_allclose([r["score"] for r in rows],
                               want["score"], rtol=0, atol=1e-12)


def test_cli_query_flag_conflicts(root, capsys):
    with pytest.raises(SystemExit):
        main(["query", "--index", root, "--q", "x",
              "--similarity", "classic", "--phrase"])
    with pytest.raises(SystemExit):
        main(["query", "--index", root, "--q", "x",
              "--after", "notacursor"])
    with pytest.raises(SystemExit):
        main(["query", "--index", root, "--q", "x",
              "--after", "1.0,5", "--highlight"])


def test_cli_es_route_matches_library(capsys):
    from sparkfts.es_routing import EsRoutingStrategyV1
    st = EsRoutingStrategyV1(10, 7)
    rc = main(["es-route", "--org", "orgA", "--conv", "conv1",
               "--num-shards", "10", "--shards-per-org", "7"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0
    assert out["routing"] == st.routing_hash("orgA", "conv1")
    rc = main(["es-route", "--org", "orgA", "--num-shards", "10",
               "--shards-per-org", "7", "--possible"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["routing"] == st.possible_routing_hashes("orgA")
