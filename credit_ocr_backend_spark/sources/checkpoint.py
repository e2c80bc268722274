"""Per-partition checkpoint, lineage and resume.

The reference checkpoints every stage as a blob per document and keeps
a job-status row per document (``Stage`` buckets,
/root/reference/src/creditsystem/storage.py:25-31; ``Extraktionsauftrag``
/root/reference/schema.sql:26-33). At 10^12 documents a per-document
status row is itself a big-data problem, so this engine coarsens the
unit of recovery to a **url-hash bucket** (stable
``pmod(xxhash64(url), n_buckets)``) and a **chunk** = contiguous bucket
range processed as one Spark job + one commit:

* results tables are written ``partitionBy("bucket")`` with dynamic
  partition overwrite → re-running a chunk is idempotent (the
  ``overwrite=True`` blob semantics of storage.py:152);
* after each chunk commits, one lineage parquet fragment is appended
  with per-bucket doc counts / failure counts / cpu-ms (the
  Extraktionsauftrag analogue, plus the throughput metrics the north
  rule requires);
* resume = anti-join of the bucket domain against lineage buckets with
  status ``done`` — a failed chunk re-runs alone, committed chunks are
  never recomputed.

On Iceberg the same layout is ``bucket(url, N)`` hidden partitioning +
``overwritePartitions()``; plain parquet directories reproduce the
mechanics faithfully for this sandbox.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import List, Optional, Set

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "bucket int, stage string, status string, n_docs long, n_failed long, "
    "cpu_ms double, wall_ms long, run_id string, finished_at string"
)


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    """Stable url-hash bucket — identical across runs, the resume key."""
    return df.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))


class CheckpointManager:
    """Filesystem layout: ``{root}/results``, ``{root}/docs``,
    ``{root}/lineage/part-*.parquet`` (append-only fragments)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self.lineage_dir = f"{self.root}/lineage"

    # -- lineage ----------------------------------------------------------

    def lineage(self) -> Optional[DataFrame]:
        if not os.path.isdir(self.lineage_dir) or not any(
            name.endswith(".parquet") or not name.startswith("_")
            for name in os.listdir(self.lineage_dir)
        ):
            return None
        try:
            return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_dir)
        except Exception:
            return None

    def done_buckets(self, stage: str) -> Set[int]:
        lineage = self.lineage()
        if lineage is None:
            return set()
        rows = (
            lineage.where((F.col("stage") == stage) & (F.col("status") == "done"))
            .select("bucket")
            .distinct()
            .collect()
        )
        return {r["bucket"] for r in rows}

    def append_lineage(
        self,
        stage: str,
        per_bucket: List[dict],
        wall_ms: int,
        run_id: str,
    ) -> None:
        """One fragment per commit — append-only, crash-safe (a fragment
        is only visible once fully written; written via a temp name)."""
        os.makedirs(self.lineage_dir, exist_ok=True)
        finished_at = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        rows = [
            {
                "bucket": int(b["bucket"]),
                "stage": stage,
                "status": "done",
                "n_docs": int(b["n_docs"]),
                "n_failed": int(b["n_failed"]),
                "cpu_ms": float(b["cpu_ms"]),
                "wall_ms": int(wall_ms),
                "run_id": run_id,
                "finished_at": finished_at,
            }
            for b in per_bucket
        ]
        (
            self.spark.createDataFrame(rows, schema=LINEAGE_SCHEMA)
            .coalesce(1)
            .write.mode("append")
            .parquet(self.lineage_dir)
        )

    # -- stage tables -------------------------------------------------------

    def write_partitioned(self, df: DataFrame, name: str) -> None:
        """Idempotent per-bucket commit (dynamic partition overwrite)."""
        (
            df.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{self.root}/{name}")
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/{name}")

    def path(self, name: str) -> str:
        return f"{self.root}/{name}"


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]
