"""BPE trainer/encoder: the incremental-index trainer must match a
naive recount-everything reference exactly (same merges, same order),
and distributed encoding must be lossless and deterministic."""
import re


def _naive_merges(hist, num_merges):
    """Independent reference: recount all pairs each round."""
    words = {}
    for w, c in hist:
        sym = tuple(w)
        words[sym] = words.get(sym, 0) + c
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for sym, c in words.items():
            for p in zip(sym, sym[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        mx = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == mx)
        merges.append(best)
        out = {}
        for sym, c in words.items():
            ns, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1
                        and (sym[i], sym[i + 1]) == best):
                    ns.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    ns.append(sym[i])
                    i += 1
            out[tuple(ns)] = out.get(tuple(ns), 0) + c
        words = out
    return merges


def test_learn_merges_matches_naive_reference():
    from datapipe.bpe import learn_merges
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    for k in (1, 3, 8, 50):
        assert learn_merges(hist, k) == _naive_merges(hist, k), k


def test_learn_merges_randomized_vs_naive():
    import numpy as np
    from datapipe.bpe import learn_merges
    rng = np.random.default_rng(5)
    letters = list("abcdef")
    hist = [("".join(rng.choice(letters, rng.integers(1, 9))),
             int(rng.integers(1, 40))) for _ in range(120)]
    assert learn_merges(hist, 40) == _naive_merges(hist, 40)


def test_learn_merges_exhausts_gracefully():
    from datapipe.bpe import learn_merges
    # single-char words: nothing to merge
    assert learn_merges([("a", 3), ("b", 1)], 10) == []
    # finite merge space: stops early, no crash
    m = learn_merges([("aa", 2)], 10)
    assert m == [("a", "a")]


def test_encode_word_sequential_merge_order():
    from datapipe.bpe import _encode_word
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    assert _encode_word("lowest", merges) == ["lo", "w", "est"]
    assert _encode_word("xyz", merges) == ["x", "y", "z"]
    # left-to-right non-overlapping within one pass
    assert _encode_word("aaa", [("a", "a")]) == ["aa", "a"]
    assert _encode_word("aaaa", [("a", "a")]) == ["aa", "aa"]


def test_train_and_encode_spark(spark):
    from datapipe.bpe import bpe_encode, train_bpe
    rows = [(i, t) for i, t in enumerate(
        ["the merge rate", "the merge", "rate the merge rate",
         "Merge, THE rate!", ""])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, num_merges=20)
    assert merges == train_bpe(df, num_merges=20)   # deterministic
    got = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    for i, t in rows:
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        assert "".join(got[i]["bpe_tokens"]) == "".join(toks), i
        assert got[i]["n_bpe_tokens"] == len(got[i]["bpe_tokens"])
    # trained merges compress the training words below char count
    n_chars = sum(len(w) for _, t in rows
                  for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    n_bpe = sum(r["n_bpe_tokens"] for r in got.values())
    assert n_bpe < n_chars


def test_max_word_types_cap_is_deterministic(spark):
    from datapipe.bpe import train_bpe
    rows = [(i, f"w{i % 7} common common") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = train_bpe(df, num_merges=10, max_word_types=3)
    b = train_bpe(df, num_merges=10, max_word_types=3)
    assert a == b


def test_fixed_oracle_sql_matches_encoder_on_adversarial_words():
    """The chained-replace SQL oracle must equal the Python encoder on
    words where a merge's second member is a PREFIX of the following
    symbol (e.g. 'bath': pair (ba,t) must NOT fire inside 'ba th') and
    on odd/even homogeneous runs — the cases a boundary-less replace
    form gets wrong."""
    import duckdb
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry_bpe_test", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from datapipe.bpe import _encode_word
    words = ["bath", "bathe", "the", "ther", "query", "batch",
             "thth", "ththth", "erer", "erbat", "tth", "bbat"]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, w in enumerate(words):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, w])
    # the fixed-merge oracle now rides the consolidated
    # dp_bpe_train_encode gate as its 'fixed' leg — use the builder
    # directly (same SQL the gate's fixed leg wraps)
    got = con.execute(m._bpe_encode_fixed_sql()).fetchall()
    for (doc_id, bpe_text, n), w in zip(sorted(got), words):
        py = _encode_word(w, m.BPE_FIXED_MERGES)
        assert bpe_text == " ".join(py), (w, bpe_text, py)
        assert n == len(py), w


def test_vocab_ids_roundtrip_and_persistence(spark, tmp_path):
    from datapipe.bpe import (bpe_encode, bpe_encode_ids, bpe_vocab,
                              load_merges, save_merges, train_bpe)
    rows = [(0, "the rate the rate merge"), (1, "merge the rate")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, num_merges=12)
    p = str(tmp_path / "merges.json")
    save_merges(p, merges)
    assert load_merges(p) == merges
    vocab = bpe_vocab(merges)
    assert vocab[:3] == ["a", "b", "c"] and len(vocab) == 36 + len(merges)
    toks = {r["doc_id"]: r["bpe_tokens"]
            for r in bpe_encode(df, merges).collect()}
    ids = {r["doc_id"]: r["bpe_ids"]
           for r in bpe_encode_ids(df, merges).collect()}
    for d in (0, 1):
        assert [vocab[i] for i in ids[d]] == toks[d]
        assert all(i >= 0 for i in ids[d])   # nothing fell to unk
