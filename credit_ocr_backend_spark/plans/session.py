"""SparkSession factory with scale-appropriate defaults.

Single place where execution knobs live so tests, bench and the
spark-submit entrypoint agree:

* AQE on (runtime coalescing + skew-join splitting),
* Arrow enabled with a *small* max batch size — input rows carry
  multi-KB..MB html payloads, so the default 10k-records batch would
  balloon executor memory on the giant-document tail
  (SURVEY.md §7.3),
* shuffle partitions sized to the local core count (on a real cluster
  this comes from the submit conf; AQE coalesces down as needed).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 128


def get_spark(
    app_name: str = "credit-ocr-backend-spark",
    parallelism: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{parallelism}]")
        .config("spark.sql.shuffle.partitions", str(parallelism))
        .config("spark.default.parallelism", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
