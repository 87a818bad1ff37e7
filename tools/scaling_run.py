"""One pinned build for the scaling experiment: meant to be launched as
    taskset -c 0-(N-1) python tools/scaling_run.py <cores> <src> <root>
so the WHOLE process tree (JVM + Python UDF workers) is limited to N
physical CPUs — the honest emulation of an N-core cluster. Without
pinning, pandas-UDF worker processes run outside Spark's local[N] task
slots and a "2-core" run quietly uses 4+ cores, corrupting the
efficiency measurement.

Shuffle dirs and the output index live on tmpfs (/dev/shm) when
available: on a real cluster, disk bandwidth scales with the number of
executors, but a single box has ONE disk — holding storage constant-fast
isolates the compute-scaling question the N-vs-4N criterion asks about.

Prints one JSON line {"cores": N, "wall_sec": ..., "n_docs": ...,
"phases": {...}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(cores: int, src: str, root: str, warmup_src: str | None) -> None:
    import shutil
    import tempfile
    from pyspark.sql import SparkSession
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if shm:
        base = tempfile.mkdtemp(prefix="sparkfts_scale_", dir=shm)
        root = os.path.join(base, os.path.basename(root))
        local_dir = os.path.join(base, "spark-local")
    else:
        base, local_dir = None, None
    spark = (SparkSession.builder
             .master(f"local[{cores}]")
             .appName(f"sparkfts-scaling-{cores}")
             .config("spark.local.dir", local_dir or "/tmp")
             .config("spark.sql.shuffle.partitions",
                     os.environ.get("SPARKFTS_SCALE_PARTS", "8"))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
             .config("spark.sql.files.maxPartitionBytes", "16m")
             .config("spark.hadoop.mapreduce.fileoutputcommitter"
                     ".algorithm.version", "2")
             .config("spark.driver.memory",
                     os.environ.get("SPARKFTS_DRIVER_MEM", "24g"))
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from sparkfts import BuildConfig, build_index
    if warmup_src:
        build_index(spark, spark.read.parquet(warmup_src), root + "_warm",
                    order_cols=["conv_id", "turn_idx"],
                    cfg=BuildConfig(num_shards=4, partitions=4))
    df = spark.read.parquet(src)
    t0 = time.perf_counter()
    s = build_index(spark, df, root, order_cols=["conv_id", "turn_idx"],
                    cfg=BuildConfig(num_shards=32,
                                    partitions=int(os.environ.get(
                                        "SPARKFTS_SCALE_PARTS", "8"))))
    wall = time.perf_counter() - t0
    print(json.dumps({"cores": cores, "wall_sec": round(wall, 2),
                      "n_docs": s["n_docs"], "phases": s["phases"]}))
    spark.stop()
    if base:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3],
         sys.argv[4] if len(sys.argv) > 4 else None)
