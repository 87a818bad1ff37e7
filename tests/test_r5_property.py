"""Randomized property sweep for the round-5 surfaces: filtered
search, facet counts, and deletes — each against the brute-force BM25
oracle (global stats) plus pandas recomputes, on seeded-random corpora
with empty/punct docs and random metadata. Interactions (filter after
deletes, facets over deletes, compact after deletes) are exactly where
example-based tests go blind."""
import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.oracle import BM25Oracle

VOCAB = ([f"w{i}" for i in range(25)]
         + ["the", "and", "alpha", "beta", "gamma"])
ROLES = np.array(["user", "assistant", "tool"])


def _random_corpus(rng, n_docs):
    rows = []
    for i in range(n_docs):
        roll = rng.random()
        if roll < 0.05:
            text = ""
        elif roll < 0.10:
            text = "!!! ... ???"
        else:
            n = int(rng.integers(1, 40))
            ids = (rng.zipf(1.3, size=n) - 1) % len(VOCAB)
            text = " ".join(VOCAB[j] for j in ids)
        rows.append((f"c{i // 3:04d}", i % 3,
                     str(ROLES[int(rng.integers(0, 3))]), text,
                     None, None))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                       "text", "tool", "ts"])


def _random_query(rng):
    n = int(rng.integers(1, 4))
    return " ".join(rng.choice(VOCAB + ["zzznothere"], size=n))


FILTERS = [
    ("role = 'user'", lambda s: s["role"] == "user"),
    ("turn_idx >= 1", lambda s: s["turn_idx"] >= 1),
    ("role <> 'tool' AND turn_idx < 2",
     lambda s: (s["role"] != "tool") & (s["turn_idx"] < 2)),
]


@pytest.mark.parametrize("seed", [101, 202])
def test_filter_facets_deletes_match_oracle(spark, tmp_path_factory,
                                            seed):
    rng = np.random.default_rng(seed)
    pdf = _random_corpus(rng, n_docs=40)
    root = str(tmp_path_factory.mktemp(f"r5prop_{seed}"))
    cfg = BuildConfig(num_shards=3, partitions=3)
    build_index(spark, spark.createDataFrame(pdf), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    idx = FTSIndex(spark, root)
    store = idx._docstore.toPandas()
    srt = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle = BM25Oracle(np.arange(len(srt), dtype=np.int64),
                        srt["text"])

    # --- filtered search: global stats, predicate restriction -------
    for _ in range(4):
        q = _random_query(rng)
        fsql, fpy = FILTERS[int(rng.integers(0, len(FILTERS)))]
        mode = "and" if rng.random() < 0.5 else "or"
        keep = set(store.loc[fpy(store), "docid"])
        full = oracle.topk(q, k=10 ** 6, mode=mode)
        want = (full[full["docid"].isin(keep)].head(7)
                .reset_index(drop=True))
        got = idx.topk_pandas(q, k=7, mode=mode, filter=fsql)
        assert got["docid"].tolist() == want["docid"].tolist(), (q, fsql)
        np.testing.assert_allclose(got["score"], want["score"],
                                   rtol=0, atol=1e-9,
                                   err_msg=f"{q} / {fsql}")

    # --- facet counts vs pandas recompute ----------------------------
    for _ in range(3):
        q = _random_query(rng)
        mode = "and" if rng.random() < 0.5 else "or"
        matched = set(idx.match_docids(q, mode=mode)
                      .toPandas()["docid"])
        sub = store[store["docid"].isin(matched)]
        vc = sub["role"].dropna().astype(str).value_counts()
        exp = (pd.DataFrame({"value": vc.index,
                             "doc_count": vc.to_numpy()})
               .sort_values(["doc_count", "value"],
                            ascending=[False, True]).head(5)
               .reset_index(drop=True))
        got = idx.facet_counts(q, by="role", k=5, mode=mode).toPandas()
        assert got["value"].tolist() == exp["value"].tolist(), q
        assert got["doc_count"].tolist() == exp["doc_count"].tolist(), q

    # --- deletes: stale-stats exclusion, then fresh-stats compact ---
    from sparkfts.streaming import CombinedIndex, compact
    ci = CombinedIndex(spark, root)
    q0 = "alpha the w0 w1"
    full0 = oracle.topk(q0, k=10 ** 6, mode="or")
    pool = (full0["docid"].tolist() or store["docid"].tolist())
    dead = sorted({int(pool[int(rng.integers(0, len(pool)))]
                       ) for _ in range(min(6, len(pool)))})
    ci.delete_docs(dead)
    for _ in range(3):
        q = _random_query(rng)
        mode = "and" if rng.random() < 0.5 else "or"
        full = oracle.topk(q, k=10 ** 6, mode=mode)   # STALE stats
        want = (full[~full["docid"].isin(dead)].head(6)
                .reset_index(drop=True))
        got = ci.topk(q, k=6, mode=mode).reset_index(drop=True)
        assert got["docid"].tolist() == want["docid"].tolist(), (q, dead)
        np.testing.assert_allclose(got["score"], want["score"],
                                   rtol=0, atol=1e-9, err_msg=q)
        gotl = ci.topk_local(q, k=6, mode=mode)
        assert gotl["docid"].tolist() == want["docid"].tolist()
        # filter composes with deletes
        fsql, fpy = FILTERS[int(rng.integers(0, len(FILTERS)))]
        keep = set(store.loc[fpy(store), "docid"]) - set(dead)
        wantf = (full[full["docid"].isin(keep)].head(6)
                 .reset_index(drop=True))
        gotf = ci.topk(q, k=6, mode=mode, filter=fsql) \
            .reset_index(drop=True)
        assert gotf["docid"].tolist() == wantf["docid"].tolist(), \
            (q, fsql, dead)

    out = str(tmp_path_factory.mktemp(f"r5prop_c_{seed}"))
    compact(spark, root, out, order_cols=["conv_id", "turn_idx"],
            cfg=cfg)
    idx2 = FTSIndex(spark, out)
    live = srt[~srt.index.isin(dead)].reset_index(drop=True)
    oracle2 = BM25Oracle(np.arange(len(live), dtype=np.int64),
                         live["text"])                # FRESH stats
    assert idx2.N == len(live)
    for _ in range(3):
        q = _random_query(rng)
        want = oracle2.topk(q, k=6, mode="or").reset_index(drop=True)
        got = idx2.topk_pandas(q, k=6, mode="or")
        assert got["docid"].tolist() == want["docid"].tolist(), q
        np.testing.assert_allclose(got["score"], want["score"],
                                   rtol=0, atol=1e-9, err_msg=q)
