"""Exact-placement repartitioning: the Python Murmur3 must match
Spark's F.hash bit-for-bit (placement correctness never depends on it,
but balance does), and the repartition must land each shard on exactly
its intended task with the contiguous rangepartition layout — without
the range-sampling job."""
import random

from pyspark.sql import functions as F

from sparkfts.placement import (murmur3_int32, partition_keys,
                                repartition_exact)


def test_murmur3_matches_spark_hash(spark):
    rng = random.Random(7)
    vals = ([rng.randint(-2**31, 2**31 - 1) for _ in range(300)]
            + list(range(-8, 64)))
    rows = spark.createDataFrame([(v,) for v in vals], "x int") \
        .select("x", F.hash("x").alias("h")).collect()
    for r in rows:
        assert murmur3_int32(r["x"]) == r["h"], r["x"]


def test_partition_keys_land_on_their_partition():
    for p in (1, 2, 7, 8, 32, 200):
        keys = partition_keys(p)
        assert len(keys) == p
        for pid, k in enumerate(keys):
            assert murmur3_int32(k) % p == pid


def test_repartition_exact_layout(spark):
    rows = [(s, i) for s in range(32) for i in range(10)]
    d = spark.createDataFrame(rows, "shard int, v int")
    out = repartition_exact(d, list(range(32)), 8)
    assert out.columns == ["shard", "v"]          # helper key dropped
    got = {r["shard"]: r["pids"] for r in
           out.withColumn("pid", F.spark_partition_id())
              .groupBy("shard").agg(F.collect_set("pid").alias("pids"))
              .collect()}
    for s in range(32):
        assert got[s] == [s * 8 // 32], (s, got[s])
    # sparse shard set (resume): ranks spread contiguously
    sparse = [3, 11, 19, 30]
    d2 = spark.createDataFrame([(s, 0) for s in sparse],
                               "shard int, v int")
    got2 = {r["shard"]: r["pids"] for r in
            repartition_exact(d2, sparse, 2)
            .withColumn("pid", F.spark_partition_id())
            .groupBy("shard").agg(F.collect_set("pid").alias("pids"))
            .collect()}
    assert got2[3] == got2[11] and got2[19] == got2[30]
    assert got2[3] != got2[19]


def test_no_range_sampling_job(spark):
    """The whole point: an exact-placement repartition of a plan must
    not add a sampling job. Count jobs for a write-less action over a
    shuffle: hash path = 1 job, rangepartition path = 2 (sampling +
    run)."""
    sc = spark.sparkContext
    d = spark.createDataFrame([(s % 16, s) for s in range(4000)],
                              "shard int, v long")

    def njobs(df, group):
        sc.setJobGroup(group, group)
        try:
            df.foreach(lambda r: None)
        finally:
            sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    n_exact = njobs(repartition_exact(d, list(range(16)), 4), "pl-exact")
    n_range = njobs(d.repartitionByRange(4, "shard"), "pl-range")
    assert n_range == n_exact + 1, (n_exact, n_range)
