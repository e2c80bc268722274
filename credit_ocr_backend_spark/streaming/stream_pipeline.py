"""Streaming extraction: the batch stages under Structured Streaming.

Two entry points:

* ``stream_extract`` — file-source stream over a pages directory →
  the fused extraction stage (stateless mapInPandas works identically
  on micro-batches) → parquet sink with checkpointing. Exactly-once
  per micro-batch via the streaming commit log, the streaming analogue
  of the batch pipeline's bucket-chunk commits.
* ``windowed_field_counts`` — watermarked sliding-window aggregation
  over the extraction results stream (late data beyond the watermark
  dropped) — the canonical stateful-streaming operator the engine
  exposes for monitoring extraction throughput/quality over event time.

Run with ``trigger(availableNow=True)`` for catch-up batch semantics or
a processing-time trigger for continuous ingest.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from credit_ocr_backend_spark.core.config import DocumentTypeConfig, default_config
from credit_ocr_backend_spark.operators.stages import EXTRACTED_SCHEMA, make_fused_stage
from credit_ocr_backend_spark.sources.checkpoint import with_bucket

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "warc_date date"
)


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    doc_config: Optional[DocumentTypeConfig] = None,
    n_buckets: int = 64,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
):
    """pages stream → fused extraction → parquet docs sink.

    Returns the started StreamingQuery (caller awaits/stops)."""
    cfg = doc_config or default_config()
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    extracted = with_bucket(stream.select("url", "html"), n_buckets).mapInPandas(
        make_fused_stage(cfg), schema=EXTRACTED_SCHEMA
    )
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_field_counts(
    results_stream: DataFrame,
    *,
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
    window_len: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per field over a stream of
    extraction result rows — late rows beyond the watermark are dropped
    (the streaming-only operator surface: event-time window + state)."""
    return (
        results_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len).alias("win"), F.col("field_name"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("n_valid"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "field_name",
            "n",
            "n_valid",
        )
    )
