"""Per-chunk checkpoint, per-bucket lineage, and resume.

The reference checkpoints every stage as a blob per document and keeps
a job-status row per document (``Stage`` buckets,
/root/reference/src/creditsystem/storage.py:25-31; ``Extraktionsauftrag``
/root/reference/schema.sql:26-33). At 10^12 documents a per-document
status row is itself a big-data problem, so this engine coarsens the
unit of recovery:

* **bucket** — stable ``pmod(xxhash64(url), B)``: the lineage/metrics
  grain (doc counts, failures, cpu-ms per bucket);
* **chunk** — contiguous bucket range processed as one Spark job and
  committed as one ``chunk=NNNN`` partition directory with plain
  overwrite. Re-running a chunk is idempotent (the ``overwrite=True``
  blob semantics of storage.py:152); a crashed chunk leaves committed
  chunks untouched.

After each chunk commits, one lineage parquet fragment is appended
(pyarrow, driver-side — one row per bucket; no Spark job for metadata).
Resume = skip chunks whose lineage rows exist with status done.

On Iceberg the same layout is ``bucket(url, N)`` hidden partitioning +
``overwritePartitions()``; plain parquet directories reproduce the
mechanics faithfully for this sandbox.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import List, Optional, Set

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "chunk int, bucket int, stage string, status string, n_docs long, "
    "n_failed long, cpu_ms double, wall_ms long, run_id string, "
    "finished_at string"
)


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    """Stable url-hash bucket — identical across runs, the lineage key."""
    return df.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))


class CheckpointManager:
    """Filesystem layout:
    ``{root}/{table}/chunk=NNNN/part-*.parquet`` for stage tables and
    ``{root}/lineage/part-*.parquet`` (append-only fragments)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        # Lineage/manifest I/O uses driver-local filesystem APIs; an
        # object-store root would silently split data (s3) from resume
        # state (a junk local 's3:/...' dir). Fail fast until lineage is
        # routed through fsspec/Hadoop FileSystem.
        scheme = root.split("://", 1)[0] if "://" in root else ""
        if scheme and scheme != "file":
            raise ValueError(
                f"CheckpointManager requires a local out_root (got scheme "
                f"'{scheme}://'): lineage/manifest are written with local "
                f"filesystem APIs. Mount the store or use a file:// path."
            )
        self.spark = spark
        self.root = root[len("file://"):] if root.startswith("file://") else root
        self.root = self.root.rstrip("/")
        self.lineage_dir = f"{self.root}/lineage"
        self.manifest_path = f"{self.root}/run_manifest.json"

    # -- run manifest -------------------------------------------------------

    def write_manifest(self, params: dict) -> None:
        """Persist the run parameters that define chunk identity
        (n_buckets, n_chunks, ts window, mode). Resuming under different
        parameters would silently skip chunk ids whose bucket ranges or
        input window differ from the committed run."""
        import json

        os.makedirs(self.root, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(params, f, sort_keys=True, indent=2)
        os.replace(tmp, self.manifest_path)

    def read_manifest(self) -> Optional[dict]:
        import json

        if not os.path.isfile(self.manifest_path):
            return None
        with open(self.manifest_path, encoding="utf-8") as f:
            return json.load(f)

    def check_manifest(self, params: dict) -> None:
        """Refuse a resume whose parameters differ from the committed
        run (ADVICE round 1: silent chunk-identity drift)."""
        committed = self.read_manifest()
        if committed is None:
            # legacy run without a manifest: record it now
            self.write_manifest(params)
            return
        diffs = {
            k: (committed.get(k), params.get(k))
            for k in set(committed) | set(params)
            if committed.get(k) != params.get(k)
        }
        if diffs:
            raise ValueError(
                f"resume parameter mismatch vs committed run manifest "
                f"{self.manifest_path}: {diffs} — committed chunks were "
                f"built under different chunk-identity parameters; rerun "
                f"fresh (resume=False) or restore the original parameters."
            )

    # -- lineage ----------------------------------------------------------

    def lineage(self) -> Optional[DataFrame]:
        if not os.path.isdir(self.lineage_dir) or not any(
            name.endswith(".parquet") for name in os.listdir(self.lineage_dir)
        ):
            return None
        try:
            return (
                self.spark.read.schema(LINEAGE_SCHEMA)
                .option("pathGlobFilter", "*.parquet")  # skip crashed .tmp files
                .parquet(self.lineage_dir)
            )
        except Exception:
            return None

    def done_chunks(self, stage: str) -> Set[int]:
        lineage = self.lineage()
        if lineage is None:
            return set()
        rows = (
            lineage.where((F.col("stage") == stage) & (F.col("status") == "done"))
            .select("chunk")
            .distinct()
            .collect()
        )
        return {r["chunk"] for r in rows}

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
        chunk: int,
        per_bucket: List[dict],
        wall_ms: int,
        run_id: str,
    ) -> None:
        """One fragment per commit — append-only, crash-safe (written to
        a temp name, renamed into place). Lineage is driver-side
        metadata (one row per bucket), written directly with pyarrow
        instead of paying a Spark job per commit.

        An empty chunk (e.g. everything pruned by the warc_ts filter)
        still records one sentinel row (bucket = -1) so resume can skip
        it instead of re-running a no-op forever."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not per_bucket:
            per_bucket = [{"bucket": -1, "n_docs": 0, "n_failed": 0, "cpu_ms": 0.0}]
        os.makedirs(self.lineage_dir, exist_ok=True)
        finished_at = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        table = pa.table(
            {
                "chunk": pa.array([int(chunk)] * len(per_bucket), pa.int32()),
                "bucket": pa.array([int(b["bucket"]) for b in per_bucket], pa.int32()),
                "stage": pa.array([stage] * len(per_bucket)),
                "status": pa.array(["done"] * len(per_bucket)),
                "n_docs": pa.array([int(b["n_docs"]) for b in per_bucket], pa.int64()),
                "n_failed": pa.array([int(b["n_failed"]) for b in per_bucket], pa.int64()),
                "cpu_ms": pa.array([float(b["cpu_ms"]) for b in per_bucket], pa.float64()),
                "wall_ms": pa.array([int(wall_ms)] * len(per_bucket), pa.int64()),
                "run_id": pa.array([run_id] * len(per_bucket)),
                "finished_at": pa.array([finished_at] * len(per_bucket)),
            }
        )
        fragment = f"{self.lineage_dir}/part-{run_id}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = fragment + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, fragment)

    # -- stage tables -------------------------------------------------------

    def write_chunk(self, df: DataFrame, name: str, chunk: int) -> None:
        """Atomic idempotent chunk commit: plain overwrite of the
        chunk's own partition directory (one file per task, no extra
        shuffle, no per-bucket sliver files)."""
        df.write.mode("overwrite").parquet(self._chunk_path(name, chunk))

    def read_chunk(self, name: str, chunk: int) -> DataFrame:
        return self.spark.read.parquet(self._chunk_path(name, chunk))

    def upsert_chunk(
        self, df: DataFrame, name: str, chunk: int, keys: List[str]
    ) -> None:
        """MERGE-INTO-shaped upsert into one chunk directory (S10, the
        reference's ON CONFLICT DO UPDATE,
        /root/reference/src/ocr/extraction.py:524-548): matched keys are
        replaced by the update rows, unmatched existing rows survive,
        new keys insert. On Iceberg this is exactly

            MERGE INTO t USING u ON <keys>
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *

        ; on plain parquet the merged relation is recomputed and swapped
        in atomically (staging dir + rename), so readers never observe a
        half-written chunk."""
        import shutil

        path = self._chunk_path(name, chunk)
        if not os.path.isdir(path):
            df.write.mode("overwrite").parquet(path)
            return
        merged = merge_upsert(self.spark.read.parquet(path), df, keys)
        staging = path + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        retired = path + ".old"
        os.rename(path, retired)
        os.rename(staging, path)
        shutil.rmtree(retired)

    def read(self, name: str) -> DataFrame:
        """Whole stage table across chunks; ``chunk`` becomes a
        discovered partition column usable for pruning."""
        return self.spark.read.option("basePath", f"{self.root}/{name}").parquet(
            f"{self.root}/{name}"
        )

    def path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def _chunk_path(self, name: str, chunk: int) -> str:
        return f"{self.root}/{name}/chunk={chunk:04d}"


def merge_upsert(existing: DataFrame, updates: DataFrame, keys: List[str]) -> DataFrame:
    """The MERGE relation: updates win on key match, unmatched existing
    rows survive, new keys insert. One anti-join (shuffle on the key) +
    a union — at scale the anti-join's update side is usually tiny and
    broadcasts; never a full rewrite of unmatched data beyond the
    touched partitions when paired with partition-scoped upsert_chunk."""
    survivors = existing.join(updates.select(*keys).distinct(), keys, "left_anti")
    return updates.unionByName(survivors)


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]
