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
