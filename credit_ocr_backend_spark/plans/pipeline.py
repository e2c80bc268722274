"""The end-to-end extraction pipeline (the engine's flagship job).

Logical plan, all declarative until the Arrow-batched stages:

    pages (parquet/Iceberg, pruned by warc_date)
      → filter warc_ts range                      # partition pruning
      → bucket = pmod(xxhash64(url), B)           # stable resume key
      → anti-join done buckets (resume)
      → giant/normal split on length(html)        # size-skew defuse
      → repartition (url-hash / round-robin)      # salting
      → fused|staged Arrow UDF stages             # core semantics
      → docs + exploded field rows, partitionBy(bucket), dynamic overwrite
      → lineage append per chunk (bucket metrics + throughput)

Scale notes (100 TB / 10^12 rows):
* the html column is only read by the parse stage; every downstream
  projection drops it immediately (column pruning keeps the heavy
  bytes out of later scans);
* chunking bounds the blast radius of a failure to one bucket range —
  a re-run anti-joins lineage and recomputes only missing chunks;
  on Iceberg the pages table would additionally be bucket(url, B)
  partitioned so each chunk scan prunes at the file level;
* giant documents (heavy right tail of html size) are routed to a
  round-robin repartition so each lands in its own task instead of
  queueing behind url-hash neighbors; AQE handles residual shuffle
  skew.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from credit_ocr_backend_spark.core.config import DocumentTypeConfig, default_config
from credit_ocr_backend_spark.operators.stages import (
    EXTRACTED_SCHEMA,
    NORMALIZED_SCHEMA,
    PARSED_SCHEMA,
    make_extract_stage,
    make_fused_stage,
    make_normalize_stage,
    make_parse_stage,
)
from credit_ocr_backend_spark.sources.checkpoint import (
    CheckpointManager,
    new_run_id,
    with_bucket,
)

GIANT_HTML_BYTES = 32 * 1024  # size-skew routing threshold


@dataclass
class PipelineResult:
    out_root: str
    n_docs: int = 0
    n_failed: int = 0
    chunks_run: int = 0
    chunks_skipped: int = 0
    wall_sec: float = 0.0
    buckets_done: List[int] = field(default_factory=list)

    @property
    def docs_per_sec(self) -> float:
        return self.n_docs / self.wall_sec if self.wall_sec else 0.0


def _input_slice(
    pages: DataFrame,
    n_buckets: int,
    bucket_lo: int,
    bucket_hi: int,
    ts_min: Optional[str],
    ts_max: Optional[str],
) -> DataFrame:
    """Projection + pruning + bucketing for one chunk. Only url/html
    survive — everything else is pruned before the heavy stage."""
    df = pages
    # Partition pruning: warc_date is the physical partition column; the
    # warc_ts predicate lands on it so only matching day-directories scan.
    if ts_min is not None:
        df = df.where(F.col("warc_date") >= F.lit(ts_min))
    if ts_max is not None:
        df = df.where(F.col("warc_date") < F.lit(ts_max))
    df = with_bucket(df.select("url", "html"), n_buckets)
    return df.where(
        (F.col("bucket") >= bucket_lo) & (F.col("bucket") < bucket_hi)
    ).select("url", "html", "bucket")


def _defuse_skew(df: DataFrame, parallelism: int) -> DataFrame:
    """Salted repartition on url-hash for the bulk; giants round-robin so
    one task never carries two of them (SURVEY.md §7.3 giant-doc skew)."""
    bulk = (
        df.where(F.length("html") <= GIANT_HTML_BYTES)
        .repartition(parallelism, F.xxhash64("url"))
    )
    giants = (
        df.where(F.length("html") > GIANT_HTML_BYTES)
        .repartition(max(parallelism // 2, 1))  # round-robin: no key
    )
    return bulk.unionByName(giants)


def run_pipeline(
    spark: SparkSession,
    pages_path: str,
    out_root: str,
    *,
    doc_config: Optional[DocumentTypeConfig] = None,
    mode: str = "fused",  # "fused" (scale mode) | "staged" (stage checkpoints)
    n_buckets: int = 64,
    n_chunks: int = 4,
    parallelism: Optional[int] = None,
    resume: bool = False,
    ts_min: Optional[str] = None,
    ts_max: Optional[str] = None,
    fail_buckets: Optional[set] = None,  # test hook: inject a chunk failure
) -> PipelineResult:
    """Run the extraction pipeline, chunk by chunk, committing results +
    lineage per chunk. ``resume=True`` skips buckets whose lineage says
    done and recomputes only the rest; output is unchanged vs a clean
    run (tested)."""
    cfg = doc_config or default_config()
    par = parallelism or spark.sparkContext.defaultParallelism
    ckpt = CheckpointManager(spark, out_root)
    run_id = new_run_id()
    pages = spark.read.parquet(pages_path)

    done = ckpt.done_buckets("extracted") if resume else set()
    result = PipelineResult(out_root=out_root)
    t_start = time.perf_counter()

    bounds = [
        (c * n_buckets // n_chunks, (c + 1) * n_buckets // n_chunks)
        for c in range(n_chunks)
    ]
    for lo, hi in bounds:
        chunk_buckets = set(range(lo, hi))
        if chunk_buckets <= done:
            result.chunks_skipped += 1
            continue

        chunk_df = _input_slice(pages, n_buckets, lo, hi, ts_min, ts_max)
        if resume and (chunk_buckets & done):
            chunk_df = chunk_df.where(~F.col("bucket").isin([int(b) for b in done]))
        chunk_df = _defuse_skew(chunk_df, par)

        if fail_buckets and (chunk_buckets & set(fail_buckets)):
            raise RuntimeError(
                f"injected failure for buckets {sorted(chunk_buckets & set(fail_buckets))}"
            )

        t0 = time.perf_counter()
        if mode == "fused":
            extracted = chunk_df.mapInPandas(
                make_fused_stage(cfg), schema=EXTRACTED_SCHEMA
            )
        elif mode == "staged":
            parsed = chunk_df.mapInPandas(make_parse_stage(), schema=PARSED_SCHEMA)
            ckpt.write_partitioned(parsed, "parsed")
            normalized = ckpt.read("parsed").mapInPandas(
                make_normalize_stage(), schema=NORMALIZED_SCHEMA
            )
            ckpt.write_partitioned(normalized, "normalized")
            extracted = ckpt.read("normalized").mapInPandas(
                make_extract_stage(cfg), schema=EXTRACTED_SCHEMA
            )
        else:
            raise ValueError(f"unknown mode: {mode}")

        ckpt.write_partitioned(extracted, "docs")
        docs = ckpt.read("docs").where(F.col("bucket").isin(list(chunk_buckets)))

        # Long-format results: explode AFTER the heavy stage, from the
        # committed docs table (html long gone — narrow scan).
        results = docs.select(
            "url", "bucket", F.explode_outer("fields").alias("f")
        ).select(
            "url",
            "bucket",
            F.col("f.field_name").alias("field_name"),
            F.col("f.value").alias("value"),
            F.col("f.confidence").alias("confidence"),
            F.col("f.page").alias("page"),
            F.col("f.bounding_box").alias("bounding_box"),
            F.col("f.is_valid").alias("is_valid"),
            F.col("f.errors").alias("errors"),
        ).where(F.col("field_name").isNotNull())
        ckpt.write_partitioned(results, "results")

        # Lineage: per-bucket doc counts, failures, cpu-ms (A8 metrics).
        per_bucket = [
            row.asDict()
            for row in docs.groupBy("bucket").agg(
                F.count("*").alias("n_docs"),
                F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias(
                    "n_failed"
                ),
                F.sum("proc_ms").alias("cpu_ms"),
            ).collect()
        ]
        wall_ms = int((time.perf_counter() - t0) * 1000)
        ckpt.append_lineage("extracted", per_bucket, wall_ms, run_id)

        result.chunks_run += 1
        result.n_docs += sum(b["n_docs"] for b in per_bucket)
        result.n_failed += sum(b["n_failed"] for b in per_bucket)
        result.buckets_done.extend(b["bucket"] for b in per_bucket)

    result.wall_sec = time.perf_counter() - t_start
    return result
