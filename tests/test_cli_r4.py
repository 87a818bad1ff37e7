"""Round-4 CLI surface: phrase/local query flags, compact --merge,
build-many routing/fields/resume flags, ann-build/ann-query."""
import json
import os

import numpy as np
import pytest

from sparkfts.cli import main
from sparkfts.fixtures import make_transcripts


@pytest.fixture(autouse=True)
def no_stop(monkeypatch, spark):
    """cli.main stops 'its' session in a finally — but getOrCreate hands
    it the suite's shared session, so neuter stop() for these tests."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)


@pytest.fixture(scope="module")
def tr_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli_in") / "tr.parquet")
    pdf = make_transcripts(12, seed=95)
    spark.createDataFrame(pdf).write.parquet(p)
    return p


def _run(capsys, *argv):
    rc = main(["--master", "local[2]", *argv])
    out = capsys.readouterr().out.strip().splitlines()
    return rc, [json.loads(line) for line in out if line.startswith("{")]


def test_cli_build_query_phrase_local(tr_parquet, tmp_path, capsys):
    root = str(tmp_path / "idx")
    rc, rows = _run(capsys, "build", "--input", tr_parquet,
                    "--out", root, "--num-shards", "2",
                    "--partitions", "2")
    assert rc == 0 and rows[0]["n_docs"] > 0
    rc, hits = _run(capsys, "query", "--index", root,
                    "--q", "alpha query", "--k", "5")
    assert rc == 0 and hits
    rc, lhits = _run(capsys, "query", "--index", root,
                     "--q", "alpha query", "--k", "5", "--local")
    assert [h["docid"] for h in lhits] == [h["docid"] for h in hits]
    rc, ph = _run(capsys, "query", "--index", root,
                  "--q", "nightly index", "--k", "5", "--phrase",
                  "--local")
    assert rc == 0


def test_cli_compact_merge(tr_parquet, tmp_path, capsys):
    root = str(tmp_path / "base")
    _run(capsys, "build", "--input", tr_parquet, "--out", root,
         "--num-shards", "2", "--partitions", "2")
    out = str(tmp_path / "merged")
    rc, rows = _run(capsys, "compact", "--base", root, "--out", out,
                    "--num-shards", "2", "--merge")
    assert rc == 0 and rows[0]["n_docs"] > 0


def test_cli_build_many_routed_and_resume_flags(spark, tmp_path, capsys):
    pdf = make_transcripts(10, seed=96)
    pdf = pdf.assign(ix=["a" if i % 2 else "b" for i in range(len(pdf))],
                     org=[f"o{i % 2}" for i in range(len(pdf))])
    src = str(tmp_path / "many_in.parquet")
    spark.createDataFrame(pdf).write.parquet(src)
    base = str(tmp_path / "many_out")
    rc, rows = _run(capsys, "build-many", "--input", src,
                    "--out-base", base, "--index-col", "ix",
                    "--shards", "a=2,b=4", "--partitions", "2",
                    "--routing", "b=org:2")
    assert rc == 0
    assert rows[0]["a"]["num_shards"] == 2
    assert rows[0]["b"]["num_shards"] == 4
    # resume over the complete roots is a clean no-op
    rc, rows = _run(capsys, "build-many", "--input", src,
                    "--out-base", base, "--index-col", "ix",
                    "--shards", "a=2,b=4", "--partitions", "2",
                    "--routing", "b=org:2", "--resume")
    assert rc == 0
    assert all(s["built_shards"] == [] for s in rows[0].values())


def test_cli_ann_build_query(spark, tmp_path, capsys):
    rng = np.random.default_rng(5)
    rows = [(int(i), [float(x) for x in rng.standard_normal(8)])
            for i in range(80)]
    src = str(tmp_path / "emb.parquet")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .write.parquet(src)
    root = str(tmp_path / "ann")
    rc, meta = _run(capsys, "ann-build", "--input", src, "--out", root,
                    "--kind", "ivf", "--n-centroids", "4")
    assert rc == 0 and meta[0]["dim"] == 8
    assert os.path.exists(os.path.join(root, "meta.json"))
    rc, hits = _run(capsys, "ann-query", "--index", root,
                    "--input", src, "--query-id", "3", "--k", "5")
    assert rc == 0 and hits[0]["vec_id"] == 3   # self is nearest
    rc, lhits = _run(capsys, "ann-query", "--index", root,
                     "--input", src, "--query-id", "3", "--k", "5",
                     "--local")
    assert [h["vec_id"] for h in lhits] == [h["vec_id"] for h in hits]


def test_cli_highlight_filter_delete(tr_parquet, tmp_path, capsys):
    """r5 CLI: --highlight fragments, --filter restriction, and the
    delete command tombstoning across base + deltas."""
    root = str(tmp_path / "idx5")
    _run(capsys, "build", "--input", tr_parquet, "--out", root,
         "--num-shards", "2", "--partitions", "2")
    rc, hl = _run(capsys, "query", "--index", root,
                  "--q", "alpha query", "--k", "3", "--highlight",
                  "--local")
    assert rc == 0 and hl
    assert all("<em>" in h["fragment"] for h in hl)
    rc, fh = _run(capsys, "query", "--index", root,
                  "--q", "alpha query", "--k", "3",
                  "--filter", "role = 'user'")
    assert rc == 0
    rc, dels = _run(capsys, "delete", "--base", root,
                    "--docids", str(hl[0]["docid"]))
    assert rc == 0 and dels[0]["deleted"] == 1
    from sparkfts.streaming import read_tombstones
    assert read_tombstones(root).tolist() == [hl[0]["docid"]]
