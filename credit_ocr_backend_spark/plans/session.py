"""SparkSession factory with scale-appropriate defaults.

Single place where execution knobs live so tests, bench and the
spark-submit entrypoint agree:

* AQE on (runtime coalescing + skew-join splitting),
* Arrow max batch 4096 rows — re-measured in round 6 after the
  per-document core cost halved (the per-batch worker flush overhead
  became relatively bigger): 200k-doc pipeline 23.8 s at 1024 → 20.3 s
  at 4096. The giant-document skew split keeps the memory bound: bulk
  docs ≤32 KB → ≤128 MB/batch worst-case (realistic ~12 MB at ~3 KB
  avg html), and giant partitions hold ~a dozen rows each, far below
  any batch cap (SURVEY.md §7.3),
* shuffle partitions sized to the local core count (on a real cluster
  this comes from the submit conf; AQE coalesces down as needed).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 4096


def get_spark(
    app_name: str = "credit-ocr-backend-spark",
    parallelism: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    # Shuffle/spill scratch on tmpfs when available — the sandbox's /tmp
    # is a spinning-ish block device whose serialized I/O otherwise caps
    # the 32-way runs (on a real cluster this is the executors' local
    # NVMe). Falls back to the default temp dir silently.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{parallelism}]")
        .config("spark.sql.shuffle.partitions", str(parallelism))
        .config("spark.default.parallelism", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Allow shuffled-hash join where a side's per-partition build
        # fits (guide §3.1): sort-merge pays two full sorts that a hash
        # build avoids; plans that NEED sort-merge (the LSH self-joins)
        # pin it explicitly with hint("merge").
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Floor on scan parallelism (guide §6): few-row-group local
        # parquet otherwise plans 1-2 scan tasks regardless of core
        # count. Parameterised by the session's parallelism; at corpus
        # scale inputs already split far beyond the floor, so this is a
        # no-op there (it can only SHRINK split size, never inflate
        # task counts past the natural file/row-group layout).
        .config("spark.sql.files.minPartitionNum", str(parallelism))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # v2 file committer: tasks move their output into place at task
        # commit instead of the driver serially renaming every file at
        # job commit — the standard choice for many-file batch writes.
        # The pipeline's correctness never leans on v1's job-level
        # atomicity: chunk completion is decided by the lineage append,
        # never by directory existence alone.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
