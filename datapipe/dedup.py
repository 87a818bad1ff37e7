"""Deduplication operators over a (doc_id, text) corpus.

All hash primitives are md5-hex (portable: Spark `F.md5` ≡ DuckDB
`md5()` on UTF-8 bytes), and hex-string MIN compares identically to
numeric MIN because fixed-width hex is lexicographically ordered. That
keeps every operator reproducible by an ANSI-SQL oracle.

Scale notes (100 TB):
- exact_dedup: one shuffle on a 32-hex key; map-side partial min.
- minhash: explode(distinct tokens) → NUM_HASHES min-aggs in ONE
  groupBy(doc_id) pass (no per-hash shuffle); LSH banding turns the
  O(n²) pair search into an equi-join on (band_id, band_hash) — the
  classic shuffle-friendly formulation. Hot buckets are bounded by
  band width r (collision probability ~ sim^r).
- simhash: explode × 64-bit table (broadcast) → groupBy(doc_id, bit);
  constant 64× fan-out, no pairwise work.
- jaccard_pairs: exact pairwise via a shared-token equi-join, NOT a
  cross join — only docs sharing ≥1 token meet, and at scale you run it
  on LSH candidates only (pairs_from_lsh=True path).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NUM_HASHES = 12
BAND_R = 3  # rows per band → NUM_HASHES/BAND_R bands


def _tok(df: DataFrame, text_col: str) -> DataFrame:
    """Distinct (doc_id, term) token sets — same analyzer contract as
    sparkfts (lowercase, split on non-alphanumeric runs)."""
    return (df.select("doc_id",
                      F.explode(F.split(F.lower(F.col(text_col)),
                                        "[^a-z0-9]+")).alias("term"))
            .where("term <> '' AND length(term) <= 64")
            .distinct())


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on md5(text): survivor = min doc_id per hash.
    Returns (doc_id, content_hash, group_size)."""
    return (df.select("doc_id",
                      F.md5(F.encode(F.col(text_col), "UTF-8"))
                       .alias("content_hash"))
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.count("*").alias("group_size"))
            .select("doc_id", "content_hash", "group_size"))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       num_hashes: int = NUM_HASHES) -> DataFrame:
    """Per-doc MinHash signature over the token set: component i =
    min over tokens of substr(md5(i||':'||token), 1, 15) (15 hex chars
    = 60 bits, fits a signed 64-bit int in any engine).
    Returns (doc_id, mh_0 .. mh_{n-1}) — one shuffle total."""
    tok = _tok(df, text_col)
    aggs = [F.min(F.substring(F.md5(F.encode(
                F.concat(F.lit(f"{i}:"), F.col("term")), "UTF-8")), 1, 15)
            ).alias(f"mh_{i}") for i in range(num_hashes)]
    return tok.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      num_hashes: int = NUM_HASHES,
                      band_r: int = BAND_R) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 band of ``band_r``
    consecutive signature components. Returns distinct (a, b), a < b."""
    sig = minhash_signatures(df, text_col, num_hashes)
    bands = []
    for b in range(num_hashes // band_r):
        cols = [f"mh_{b * band_r + j}" for j in range(band_r)]
        bands.append(sig.select(
            "doc_id", F.lit(b).alias("band_id"),
            F.md5(F.encode(F.concat_ws("|", *cols), "UTF-8"))
             .alias("band_hash")))
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionAll(x)
    l, r = allb.alias("l"), allb.alias("r")
    return (l.join(r, ["band_id", "band_hash"])
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(F.col("l.doc_id").alias("a"),
                    F.col("r.doc_id").alias("b"))
            .distinct())


def jaccard_pairs(df: DataFrame, text_col: str = "text",
                  threshold: float = 0.9,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact token-set Jaccard pairs ≥ threshold via shared-token
    equi-join (ndocs² never materializes). If ``candidates`` (a, b) is
    given — e.g. from minhash_lsh_pairs — verify only those."""
    tok = _tok(df, text_col)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    l, r = tok.alias("l"), tok.alias("r")
    inter = (l.join(r, "term")
             .where(F.col("l.doc_id") < F.col("r.doc_id"))
             .groupBy(F.col("l.doc_id").alias("a"),
                      F.col("r.doc_id").alias("b"))
             .agg(F.count("*").alias("i")))
    if candidates is not None:
        inter = inter.join(candidates, ["a", "b"], "left_semi")
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    return (inter.join(sa, "a").join(sb, "b")
            .withColumn("jaccard",
                        F.col("i") / (F.col("sza") + F.col("szb") - F.col("i")))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


_HEX = "0123456789abcdef"


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over token md5s, tf-weighted, returned as a 16-char
    hex string (engine-portable: no 64-bit unsigned anywhere).

    Vote for bit j = +tf if bit j of md5(token) is 1 else -tf; simhash
    bit = 1 iff the vote sum > 0. Bit j lives in hex nibble j//4 at
    position 3 - j%4. Pure built-ins: explode × broadcast 64-row bit
    table → one groupBy.
    """
    spark = df.sparkSession
    tf = (df.select("doc_id",
                    F.explode(F.split(F.lower(F.col(text_col)),
                                      "[^a-z0-9]+")).alias("term"))
          .where("term <> '' AND length(term) <= 64")
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
          .withColumn("h", F.md5(F.encode(F.col("term"), "UTF-8"))))
    bits = spark.range(64).select(F.col("id").cast("int").alias("bit"))
    nib = F.substring(F.col("h"), (F.col("bit") / 4 + 1).cast("int"), 1)
    nibval = F.instr(F.lit(_HEX), nib) - 1
    bitval = F.floor(nibval / F.pow(F.lit(2.0),
                                    3 - (F.col("bit") % 4))).cast("int") % 2
    votes = (tf.crossJoin(F.broadcast(bits))
             .withColumn("vote", F.when(bitval == 1, F.col("tf"))
                                  .otherwise(-F.col("tf")))
             .groupBy("doc_id", "bit")
             .agg(F.sum("vote").alias("v"))
             .withColumn("sbit", (F.col("v") > 0).cast("int")))
    # assemble: nibble n = sum over its 4 bits of sbit << (3 - bit%4)
    nibs = (votes.withColumn("nibble", (F.col("bit") / 4).cast("int"))
            .withColumn("w", F.col("sbit")
                        * F.pow(F.lit(2.0), 3 - (F.col("bit") % 4)).cast("int"))
            .groupBy("doc_id", "nibble").agg(F.sum("w").alias("nv")))
    return (nibs.groupBy("doc_id")
            .agg(F.concat_ws("", F.array_sort(F.collect_list(
                F.struct("nibble", F.substring(F.lit(_HEX),
                                               (F.col("nv") + 1).cast("int"),
                                               1).alias("c"))))
                 .getField("c")).alias("simhash")))


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold. Exact pairwise via
    JVM-side F.aggregate/zip_with dot products over a self-join; at
    scale, feed LSH-bucketed candidates instead (similarity.lsh_buckets).
    Returns (a, b, cos)."""
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    l = emb.select(F.col(id_col).alias("a"), dbl.alias("va"))
    r = emb.select(F.col(id_col).alias("b"), dbl.alias("vb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda a, x: a + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda a, x: a + x * x))
    return (l.crossJoin(r).where(F.col("a") < F.col("b"))
            .withColumn("cos", dot / (na * nb))
            .where(F.col("cos") >= threshold)
            .select("a", "b", F.round("cos", 6).alias("cos")))
