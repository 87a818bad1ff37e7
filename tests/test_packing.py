"""Sequence packing + repetition signals: unit semantics the sf-scale
SQL gates can't isolate (empty docs, budget boundaries, gram edges)."""
import numpy as np


def test_pack_sequences_semantics(spark):
    from datapipe.packing import pack_sequences
    rows = [
        (0, "a b c"),           # 3 tokens  -> start 0, seqs 0..0
        (1, ""),                # 0 tokens  -> start 3, seqs 0..0 (empty)
        (2, "d e f g"),         # 4 tokens  -> start 3, crosses 4-boundary
        (3, "h i"),             # 2 tokens  -> start 7, seq 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           pack_sequences(df, budget=4).collect()}
    assert (got[0]["tok_start"], got[0]["seq_first"],
            got[0]["seq_last"]) == (0, 0, 0)
    assert (got[1]["n_tokens"], got[1]["tok_start"],
            got[1]["seq_first"], got[1]["seq_last"]) == (0, 3, 0, 0)
    assert (got[2]["tok_start"], got[2]["seq_first"],
            got[2]["seq_last"]) == (3, 0, 1)      # spans the cut at 4
    assert (got[3]["tok_start"], got[3]["seq_first"],
            got[3]["seq_last"]) == (7, 1, 2)      # token 8 starts seq 2
    # global stream invariant: starts are the prefix sums in id order
    starts = [got[d]["tok_start"] for d in range(4)]
    lens = [got[d]["n_tokens"] for d in range(4)]
    assert starts == list(np.concatenate(([0], np.cumsum(lens)[:-1])))


def test_pack_sequences_matches_window_oracle(spark):
    """Two-pass distributed cumsum == single-window cumsum on a corpus
    big enough to spread over several range partitions."""
    import duckdb
    import pandas as pd
    from datapipe.packing import pack_sequences
    rng = np.random.default_rng(31)
    rows = [(i, " ".join(f"w{int(x)}" for x in
                         rng.integers(0, 50, rng.integers(0, 30))))
            for i in range(800)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    got = (pack_sequences(df, budget=64, partitions=7)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = con.execute("""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(lower(text),
                     '[^a-z0-9]+'), x -> x <> '')) AS n_tokens
          FROM documents),
        c AS (SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS tok_start FROM t)
        SELECT doc_id, n_tokens, tok_start, tok_start // 64 AS seq_first,
               greatest(tok_start, tok_start + n_tokens - 1) // 64
                 AS seq_last
        FROM c ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_repetition_stats_semantics(spark):
    from datapipe.textstats import repetition_stats
    rows = [
        (0, "spam spam spam spam"),   # 4 tokens, 1 distinct
        (1, "a b a b a"),             # top 2-gram 'a b' = 2/4
        (2, "x"),                     # no grams
        (3, ""),                      # empty
        (4, "u v w"),                 # all grams unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[0]["dup_token_frac"] == 0.75
    assert got[0]["top2gram_frac"] == 1.0        # 'spam spam' x3 of 3
    assert got[0]["top3gram_frac"] == 1.0
    assert got[1]["top2gram_frac"] == 0.5        # 'a b' twice of 4
    assert got[1]["top3gram_frac"] == round(2 / 3, 6)  # 'a b a' 2 of 3
    assert (got[2]["top2gram_frac"], got[2]["top3gram_frac"]) == (0.0, 0.0)
    assert (got[3]["n_tokens"], got[3]["dup_token_frac"]) == (0, 0.0)
    assert got[4]["dup_token_frac"] == 0.0
    assert got[4]["top2gram_frac"] == 0.5        # each of 2 grams once
