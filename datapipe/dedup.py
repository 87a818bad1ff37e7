"""Deduplication operators over a (doc_id, text) corpus.

All hash primitives are md5-hex (portable: Spark `F.md5` ≡ DuckDB
`md5()` on UTF-8 bytes), and hex-string MIN compares identically to
numeric MIN because fixed-width hex is lexicographically ordered. That
keeps every operator reproducible by an ANSI-SQL oracle.

Scale notes (100 TB):
- exact_dedup: one shuffle on a 32-hex key; map-side partial min.
- minhash: raw exploded tokens → NUM_HASHES min-aggs in ONE
  groupBy(doc_id) pass (min over a multiset == min over the set, so no
  distinct() pre-shuffle); LSH banding turns the O(n²) pair search into
  an equi-join on (band_id, band_hash) — band rows explode from a
  struct array so the signature aggregation is evaluated once. Hot
  buckets are bounded by band width r (collision probability ~ sim^r).
- simhash: 64 inline bit-vote SUM aggregates in ONE groupBy(doc_id)
  (map-side combined) — no fan-out join, no pairwise work.
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
    Returns (doc_id, mh_0 .. mh_{n-1}) — ONE shuffle total: min over a
    token MULTISET equals min over the set, so the raw exploded tokens
    feed the groupBy directly (no distinct() pre-shuffle; map-side
    combine reduces each partition to one row of mins per doc)."""
    tok = (df.select("doc_id",
                     F.explode(F.split(F.lower(F.col(text_col)),
                                       "[^a-z0-9]+")).alias("term"))
           .where("term <> '' AND length(term) <= 64"))
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
    # ONE evaluation of the signature aggregation: every band row comes
    # from a single explode over a struct array (a union of per-band
    # selects re-evaluated the tokenize+groupBy subtree once PER BAND —
    # at corpus scale that is num_bands full scans)
    bands = []
    for b in range(num_hashes // band_r):
        cols = [f"mh_{b * band_r + j}" for j in range(band_r)]
        bands.append(F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.encode(F.concat_ws("|", *cols), "UTF-8"))
             .alias("band_hash")))
    allb = (sig.select("doc_id", F.explode(F.array(*bands)).alias("e"))
            .select("doc_id", F.col("e.band_id").alias("band_id"),
                    F.col("e.band_hash").alias("band_hash")))
    l, r = allb.alias("l"), allb.alias("r")
    return (l.join(r, ["band_id", "band_hash"])
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(F.col("l.doc_id").alias("a"),
                    F.col("r.doc_id").alias("b"))
            .distinct())


def jaccard_pairs(df: DataFrame, text_col: str = "text",
                  threshold: float = 0.9,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact token-set Jaccard pairs ≥ threshold via PREFIX FILTERING
    (the AllPairs/PPJoin family, Bayardo et al. WWW'07 — public
    algorithm): under a global token order by ascending document
    frequency, any pair with J ≥ t must share a token among the first
    ``sz - ceil(t*sz) + 1`` tokens of each side, so ONLY prefix tokens
    enter the pair-generating equi-join. A 90%-df stopword sorts last
    and lands in a doc's prefix only when the doc has almost no rarer
    tokens, so hot tokens no longer fan out df² join rows (the r01
    skew-killer). Candidate pairs are then verified EXACTLY against the
    full sorted token arrays (array_intersect), so results are identical
    to the naive all-shared-token join.

    If ``candidates`` (a, b) is given — e.g. from minhash_lsh_pairs —
    tokens are semi-joined down to candidate docs BEFORE any join and
    pairs are restricted to the candidate set."""
    from pyspark.sql import Window
    tok = _tok(df, text_col)
    if candidates is not None:
        cd = (candidates.select(F.col("a").alias("doc_id"))
              .union(candidates.select(F.col("b").alias("doc_id")))
              .distinct())
        tok = tok.join(cd, "doc_id", "left_semi")
    dfreq = tok.groupBy("term").agg(F.count("*").alias("tdf"))
    w_doc = Window.partitionBy("doc_id")
    ranked = (tok.join(dfreq, "term")
              .withColumn("rnk", F.row_number().over(
                  w_doc.orderBy("tdf", "term")))
              .withColumn("sz", F.count("*").over(w_doc)))
    # round before ceil: 0.9*20 → 18.000000000000004 must ceil to 18, not
    # 19 (fp error may only LENGTHEN the prefix, never shorten it)
    plen = (F.col("sz")
            - F.ceil(F.round(F.lit(float(threshold)) * F.col("sz"), 6)) + 1)
    prefix = ranked.where(F.col("rnk") <= plen).select("doc_id", "term")
    l, r = prefix.alias("l"), prefix.alias("r")
    cand = (l.join(r, "term")
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(F.col("l.doc_id").alias("a"),
                    F.col("r.doc_id").alias("b"))
            .distinct())
    if candidates is not None:
        cand = cand.join(candidates, ["a", "b"], "left_semi")
    arrs = tok.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("term")).alias("toks"),
        F.count("*").alias("sz"))
    ta = arrs.select(F.col("doc_id").alias("a"), F.col("toks").alias("ta"),
                     F.col("sz").alias("sza"))
    tb = arrs.select(F.col("doc_id").alias("b"), F.col("toks").alias("tb"),
                     F.col("sz").alias("szb"))
    i = F.size(F.array_intersect("ta", "tb"))
    return (cand.join(ta, "a").join(tb, "b")
            .withColumn("jaccard",
                        i / (F.col("sza") + F.col("szb") - i))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def dup_groups(pairs: DataFrame, max_iters: int = 50,
               check_every: int = 2) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, group_id)
    with group_id = min doc_id in the component (the canonical
    cluster-dedup step after LSH+verify).

    Min-label propagation with POINTER DOUBLING: each round every node
    takes the min label in its neighborhood (one shuffle join), then
    labels are re-mapped through themselves (label(x) <- label(label(x)),
    a second join), so a chain of diameter d converges in O(log d)
    rounds — 50 rounds covers any graph that fits on disk.

    Scale hygiene (100 TB):
    - ``edges`` is persisted and materialized ONCE, so the (typically
      expensive) upstream pairs pipeline — LSH + Jaccard verify — is
      never re-evaluated by the iteration lineage.
    - labels are localCheckpoint'ed every round (lineage stays O(1)
      deep, no exponential re-plan).
    - the driver-side convergence probe runs every ``check_every``
      rounds, not every round (extra no-op rounds are cheaper than
      per-round driver latency at cluster scale).
    Warns if ``max_iters`` is exhausted before convergence (the result
    would under-merge); with doubling that needs diameter > 2^max_iters.
    """
    import warnings
    # both edge directions from ONE read of pairs (a union of two
    # selects over `pairs` would evaluate its pipeline twice even in a
    # single job)
    edges = (pairs.select(F.explode(F.array(
                F.struct(F.col("a").cast("long").alias("x"),
                         F.col("b").cast("long").alias("y")),
                F.struct(F.col("b").cast("long").alias("x"),
                         F.col("a").cast("long").alias("y")))).alias("e"))
             .select("e.x", "e.y").distinct()
             .persist())
    edges.count()  # evaluate the upstream pairs DAG exactly once
    lab = (edges.groupBy("x")
           .agg(F.least(F.min("y"), F.first("x")).alias("g"))
           .withColumnRenamed("x", "doc_id")
           .withColumn("g", F.least("g", "doc_id"))
           .localCheckpoint())
    converged, it = False, 0
    while it < max_iters and not converged:
        it += 1
        # neighbor-min: label(x) <- min(label(x), min over neighbors y of label(y))
        nb = (edges.join(lab.withColumnRenamed("doc_id", "y"), "y")
              .groupBy("x").agg(F.min("g").alias("ng")))
        new = (lab.join(nb.withColumnRenamed("x", "doc_id"), "doc_id",
                        "left")
               .select("doc_id",
                       F.least("g", F.coalesce("ng", "g")).alias("g")))
        # pointer doubling: label(x) <- label(label(x))
        ptr = new.select(F.col("doc_id").alias("g"), F.col("g").alias("g2"))
        new = (new.join(ptr, "g", "left")
               .select("doc_id",
                       F.least("g", F.coalesce("g2", "g")).alias("g"))
               .localCheckpoint())
        if it % check_every == 0 or it == max_iters:
            changed = (new.join(lab.withColumnRenamed("g", "og"), "doc_id")
                       .where(F.col("g") != F.col("og")).limit(1).count())
            converged = changed == 0
        lab = new
    edges.unpersist()
    if not converged:
        warnings.warn(
            f"dup_groups: not converged after {max_iters} iterations — "
            "group ids may be under-merged; raise max_iters",
            RuntimeWarning)
    return lab.select("doc_id", F.col("g").alias("group_id"))


def dedup_corpus(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus after exact dedup: keep the min-doc_id survivor of every
    content_hash group (the end-to-end 'deduplicate my training set'
    operation)."""
    keep = exact_dedup(df, text_col).select("doc_id")
    return df.join(keep, "doc_id", "left_semi")


_HEX = "0123456789abcdef"


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over token md5s, tf-weighted, returned as a 16-char
    hex string (engine-portable: no 64-bit unsigned anywhere).

    Vote for bit j = +tf if bit j of md5(token) is 1 else -tf; simhash
    bit = 1 iff the vote sum > 0. Bit j lives in hex nibble j//4 at
    position 3 - j%4.

    Scale shape (r3 rewrite): ONE groupBy(doc_id) carrying 64 SUM
    aggregate expressions — each decodes its bit from the token's md5
    hex inline (substring + instr + floor, all codegen'd) — instead of
    the old crossJoin with a 64-row bit table, which pushed 64× the
    token rows through the shuffle and needed two more aggregations to
    reassemble nibbles. Map-side combine reduces each partition to one
    row of 64 longs per doc; bit-identical output (dp_simhash gate)."""
    tf = (df.select("doc_id",
                    F.explode(F.split(F.lower(F.col(text_col)),
                                      "[^a-z0-9]+")).alias("term"))
          .where("term <> '' AND length(term) <= 64")
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
          .withColumn("h", F.md5(F.encode(F.col("term"), "UTF-8"))))
    votes = []
    for j in range(64):
        nibval = F.instr(F.lit(_HEX),
                         F.substring(F.col("h"), j // 4 + 1, 1)) - 1
        bit = F.floor(nibval / (1 << (3 - j % 4))).cast("int") % 2
        votes.append(F.sum(F.when(bit == 1, F.col("tf"))
                            .otherwise(-F.col("tf"))).alias(f"v{j}"))
    agg = tf.groupBy("doc_id").agg(*votes)
    nib_chars = []
    for n in range(16):
        val = sum(((F.col(f"v{4 * n + jj}") > 0).cast("int")
                   * (1 << (3 - jj))) for jj in range(4))
        nib_chars.append(F.substring(F.lit(_HEX), val + 1, 1))
    return agg.select("doc_id",
                      F.concat(*nib_chars).alias("simhash"))


def _pair_cos():
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda a, x: a + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda a, x: a + x * x))
    return dot / (na * nb)


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        method: str | None = None,
                        n_grid: int = 8,
                        lsh_bands: int = 16,
                        lsh_rows: int = 4) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold. Returns (a, b, cos).

    method (default auto):
      'lsh'   threshold ≥ 0.7 — banded sign-LSH candidates (pairs
              sharing ≥1 band of lsh_rows hyperplane signs, an equi-join
              on (band, sig)) + exact cosine verify. The 100-TB path for
              near-dup thresholds; recall < 1 by LSH nature (≈1 for
              near-identical vectors; raise lsh_bands to push it up).
      'grid'  threshold < 0.7 — EXACT all-pairs, but blocked onto an
              n_grid × n_grid cell grid and executed as an equi-join on
              the cell id: work is still O(n²) (a low-threshold exact
              cosine join fundamentally is) yet it shuffle-partitions
              evenly across executors with NO CartesianProduct node and
              no single fat task.
      'brute' the r01 crossJoin — tiny inputs/tests only.
    """
    if method is None:
        method = "lsh" if threshold >= 0.7 else "grid"
        if method == "lsh":
            import warnings
            warnings.warn(
                "embedding_dup_pairs auto-selected method='lsh' "
                f"(threshold={threshold} >= 0.7): candidate recall < 1 — "
                "pairs can be missed. Pass method='grid' (exact, blocked "
                "O(n^2)) or method='lsh' explicitly to silence this.",
                UserWarning)
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    l = emb.select(F.col(id_col).alias("a"), dbl.alias("va"))
    r = emb.select(F.col(id_col).alias("b"), dbl.alias("vb"))

    if method == "brute":
        pairs = l.crossJoin(r)
    elif method == "grid":
        cells = F.sequence(F.lit(0), F.lit(int(n_grid) - 1))
        le = (l.withColumn("ga", F.pmod(F.xxhash64("a"), F.lit(n_grid)))
               .withColumn("gb", F.explode(cells)))
        re_ = (r.withColumn("gb", F.pmod(F.xxhash64("b"), F.lit(n_grid)))
                .withColumn("ga", F.explode(cells)))
        # every (a,b) meets in exactly one cell: (cell(a), cell(b))
        pairs = le.join(re_, ["ga", "gb"]).drop("ga", "gb")
    elif method == "lsh":
        from datapipe.similarity import ann_signatures, hyperplanes
        dim = int(emb.select(F.size(vec_col)).first()[0])
        planes = hyperplanes(dim, n_planes=lsh_bands * lsh_rows)
        # banded sign signatures in ONE Arrow-batched numpy matmul
        # (planes broadcast once in the closure) — the former per-plane
        # literal-array loop was lsh_bands*lsh_rows*dim Catalyst
        # literals per plan, a codegen blowup at real embedding dims
        sig_df = ann_signatures(
            emb.select(F.col(id_col).alias("doc"),
                       F.col(vec_col).alias("embedding")),
            dim, planes=planes, band_rows=lsh_rows)
        b_ids = sig_df.select(
            "doc", F.posexplode("band_sigs").alias("band", "sig"))
        bl = b_ids.select(F.col("doc").alias("a"), "band", "sig")
        br = b_ids.select(F.col("doc").alias("b"), "band", "sig")
        cand = (bl.join(br, ["band", "sig"])
                .where(F.col("a") < F.col("b"))
                .select("a", "b").distinct())
        pairs = (cand.join(l, "a").join(r, "b"))
    else:
        raise ValueError(f"unknown method {method!r}")

    return (pairs.where(F.col("a") < F.col("b"))
            .withColumn("cos", _pair_cos())
            .where(F.col("cos") >= threshold)
            .select("a", "b", F.round("cos", 6).alias("cos")))


# --------------------------------------------------------------------
# Span-level exact substring dedup (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" — the ExactSubstr pass).
# The paper builds a corpus-wide suffix array; the Spark-native
# equivalent is gram-granular: every length-L token window is hashed,
# windows whose hash occurs >= min_count times anywhere in the corpus
# are "duplicated", and per-doc the union of their [p, p+L) intervals
# is the duplicated region. Identical duplicated-span semantics at
# L-token resolution, expressed as two bucketed shuffles (by gram hash,
# then by doc_id) — no suffix array, no driver state, no join on the
# gram hot path (the occurrence count is a window aggregate).
# --------------------------------------------------------------------

def _span_grams(df: DataFrame, text_col: str, min_len: int):
    """base=(doc_id, tl, n_tokens) and kg=(doc_id, p, h): md5 of each
    length-``min_len`` token window at start position p (0-based),
    analyzer-tokenized. Docs shorter than min_len emit no grams. kg
    carries ONLY (doc_id, p, h) — nothing else rides the gram-hash
    shuffle."""
    L = int(min_len)
    txt = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    toks = F.filter(F.split(F.lower(txt), "[^a-z0-9]+"),
                    lambda t: t != "")
    base = (df.select("doc_id", toks.alias("tl"))
              .withColumn("n_tokens", F.size("tl")))
    grams = F.when(
        F.col("n_tokens") >= L,
        F.transform(F.sequence(F.lit(1), F.col("n_tokens") - L + 1),
                    lambda i: F.md5(F.encode(
                        F.concat_ws(" ", F.slice(F.col("tl"), i, L)),
                        "UTF-8")))
    ).otherwise(F.array().cast("array<string>"))
    kg = base.select("doc_id", F.posexplode(grams).alias("p", "h"))
    return base, kg


def duplicated_spans(df: DataFrame, text_col: str = "text",
                     min_len: int = 10, min_count: int = 2) -> DataFrame:
    """Per-doc duplicated-span statistics: (doc_id, dup_tokens,
    dup_spans, n_tokens, dup_frac) where dup_tokens is the number of
    token positions covered by at least one duplicated length-L window
    (merged-interval union), and dup_spans the number of maximal
    contiguous duplicated runs.

    Scale: one shuffle by gram hash (occurrence count as a window
    aggregate — no join), one by doc_id (interval union via lead/lag
    over sorted starts: covered = sum(min(L, next_p - p)) + L for the
    last start). Gram fan-out is ~n_tokens rows/doc, same budget as the
    inverted-index build itself."""
    from pyspark.sql import Window as W
    L = int(min_len)
    base, kg = _span_grams(df, text_col, L)
    cnt = F.count("*").over(W.partitionBy("h"))
    dup = kg.withColumn("c", cnt).where(F.col("c") >= int(min_count))
    w2 = W.partitionBy("doc_id").orderBy("p")
    nxt = F.lead("p").over(w2)
    prv = F.lag("p").over(w2)
    contrib = F.when(nxt.isNull(), F.lit(L)).otherwise(
        F.least(F.lit(L), nxt - F.col("p")))
    new_span = F.when(prv.isNull() | (F.col("p") - prv > L), 1).otherwise(0)
    agg = (dup.select("doc_id", contrib.alias("ct"), new_span.alias("ns"))
              .groupBy("doc_id")
              .agg(F.sum("ct").alias("dup_tokens"),
                   F.sum("ns").alias("dup_spans")))
    return (base.select("doc_id", "n_tokens").join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
                    F.coalesce("dup_spans", F.lit(0)).alias("dup_spans"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.round(F.coalesce("dup_tokens", F.lit(0))
                            / F.greatest("n_tokens", F.lit(1)), 6)
                     .alias("dup_frac")))


def strip_duplicate_spans(df: DataFrame, text_col: str = "text",
                          min_len: int = 10,
                          min_count: int = 2) -> DataFrame:
    """ExactSubstr cleaning: for every duplicated length-L window keep
    the FIRST occurrence in (doc_id, p) order and delete the token
    range [p, p+L) of every later occurrence, then rebuild each doc's
    text from the surviving tokens (whitespace/punctuation normalized —
    the output is analyzer-token text, space-joined).

    Returns (doc_id, clean_text, kept_tokens, n_tokens). Removal-
    coverage is computed without an interval join: token positions and
    removal starts merge-sort into one doc-ordered stream, and a
    running last-non-null start (window `last(ignorenulls)`) marks a
    token q deleted iff last_start + L > q — O(1) state per row, one
    doc_id shuffle."""
    from pyspark.sql import Window as W
    L = int(min_len)
    base, kg = _span_grams(df, text_col, L)
    # global first-occurrence rank per gram hash (deterministic order:
    # doc_id then position); rn >= 2 → delete this occurrence
    wh = W.partitionBy("h").orderBy("doc_id", "p")
    marked = (kg.withColumn("c", F.count("*").over(W.partitionBy("h")))
                .withColumn("rn", F.row_number().over(wh))
                .where((F.col("c") >= int(min_count)) & (F.col("rn") >= 2))
                .select("doc_id", "p"))
    toks_pos = base.select(
        "doc_id", F.posexplode("tl").alias("q", "tok"))
    ev = toks_pos.unionByName(
        marked.select("doc_id", F.col("p").alias("q"),
                      F.lit(None).cast("string").alias("tok"))
              .withColumn("sp", F.col("q")),
        allowMissingColumns=True)
    # at equal position, the start event must precede the token event so
    # a window starting AT q deletes the token at q: sp asc_nulls_last
    we = (W.partitionBy("doc_id")
           .orderBy(F.col("q"), F.col("sp").asc_nulls_last())
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = F.last("sp", ignorenulls=True).over(we)
    kept = (ev.withColumn("run_sp", run)
              .where(F.col("tok").isNotNull()
                     & (F.col("run_sp").isNull()
                        | (F.col("run_sp") + L <= F.col("q")))))
    out = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct(F.col("q"), F.col("tok")))),
                            lambda s: s["tok"]), " ").alias("clean_text"),
                    F.count("*").alias("kept_tokens")))
    return (base.select("doc_id", F.col("n_tokens").cast("long")
                        .alias("n_tokens"))
            .join(out, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
                    "n_tokens"))
