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
* ``sessionize_stream`` — CUSTOM stateful operator via
  ``applyInPandasWithState``: per-user gap sessionization with exactly
  the batch ``sessionize`` contract-query semantics (gap > 30 min ⇒ new
  session), Arrow-batched, state = one open session per key, event-time
  timeout closes idle sessions when the watermark passes last_ts + gap.

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


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long, closed boolean"
)
SESSION_STATE_SCHEMA = "start_ms long, last_ms long, n_events long"

SESSION_GAP_S = 1800  # 30 min — same contract as the batch `sessionize`


def _sessionize_fn(key, pdf_iter, state):
    """applyInPandasWithState body: fold this trigger's events for one
    user into the open-session state; emit a row per CLOSED session
    (gap exceeded or event-time timeout). Runs Arrow-batched per key —
    no per-row Python outside this generator.

    Ordering contract (ADVICE round 2): a key's trigger data may arrive
    split across Arrow batches, and the watermark only bounds how OLD an
    event can be — it does not order events relative to the open-session
    state. So all batches are concatenated and sorted globally, then
    merged with the state explicitly:

    * ts within [start, last] of the open session → densifies it (n+1);
    * ts before the open session within the gap → extends session_start
      backward;
    * ts before the open session beyond the gap → folds into its own
      earlier session(s), emitted closed (chronologically they precede
      the open session and are gap-separated from it);
    * ts after last → the usual forward fold.

    Known approximation (inherent to O(1) per-user state): an earlier
    session emitted closed this trigger cannot merge with even-later
    stragglers in a FUTURE trigger; such stragglers fragment into their
    own session. The window for this is bounded by the watermark.
    """
    import pandas as pd

    (user_id,) = key
    gap_ms = SESSION_GAP_S * 1000

    def row(start_ms, end_ms, n, closed):
        return {
            "user_id": user_id,
            "session_start": pd.Timestamp(start_ms, unit="ms"),
            "session_end": pd.Timestamp(end_ms, unit="ms"),
            "n_events": n,
            "closed": closed,
        }

    if state.hasTimedOut:
        start_ms, last_ms, n = state.get
        state.remove()
        yield pd.DataFrame([row(start_ms, last_ms, n, True)])
        return

    start_ms = last_ms = None
    n = 0
    if state.exists:
        start_ms, last_ms, n = state.get

    # one global sort across ALL batches for this key
    all_ts = []
    for pdf in pdf_iter:
        all_ts.extend(int(ts.value // 1_000_000) for ts in pdf["ts"])
    all_ts.sort()

    out = []
    if start_ms is not None and all_ts:
        pre = [t for t in all_ts if t < start_ms]
        n += sum(1 for t in all_ts if start_ms <= t <= last_ms)
        rest = [t for t in all_ts if t > last_ms]
        if pre:
            p_start = p_last = pre[0]
            p_n = 1
            for t in pre[1:]:
                if t - p_last > gap_ms:
                    out.append(row(p_start, p_last, p_n, True))
                    p_start, p_n = t, 0
                p_last = t
                p_n += 1
            if start_ms - p_last <= gap_ms:
                start_ms, n = p_start, n + p_n  # extend backward
            else:
                out.append(row(p_start, p_last, p_n, True))
    else:
        rest = all_ts

    for ts_ms in rest:
        if last_ms is not None and ts_ms - last_ms > gap_ms:
            out.append(row(start_ms, last_ms, n, True))
            start_ms, n = ts_ms, 0
        if start_ms is None:
            start_ms = ts_ms
        last_ms = ts_ms
        n += 1

    if last_ms is not None:
        state.update((start_ms, last_ms, n))
        # close the session once the watermark passes last_ts + gap
        state.setTimeoutTimestamp(last_ms + SESSION_GAP_S * 1000)
    if out:
        yield pd.DataFrame(out)


def sessionize_stream(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom stateful streaming operator (SURVEY §2.8 forward surface):
    per-user session windows with the batch ``sessionize`` semantics.
    Open sessions live in the state store (one tuple per user) and are
    emitted with ``closed=true`` either when a later event exceeds the
    gap or when the event-time timeout fires; the state store size is
    O(active users), never O(events)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


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


def dedup_stream(
    pages: DataFrame,
    *,
    ts_col: str = "warc_ts",
    content_col: str = "html",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop re-crawled identical payloads as
    they arrive. State is one row per (sha256(content), event-time
    window key); the watermark bounds it — a duplicate arriving later
    than ``watermark`` after the first copy is NOT caught (it will be
    caught by the batch dedup pass; the stream guards the ingest path).
    ``dropDuplicatesWithinWatermark`` keys the state store on the hash
    only and ages entries out with the watermark, so state size is
    O(distinct payloads per watermark horizon), never O(stream).

    NULL payloads never dedup against each other: sha2(NULL) is NULL
    and the operator treats NULL keys as equal, which would silently
    drop every NULL-html document after the first — the batch path
    records those as failed, so the stream must pass them through
    (keyed by url instead; a NULL-html + NULL-url row falls through to
    a per-row uuid so it can never collide with anything — without
    that final fallback the url fallback itself re-creates the NULL-key
    collapse it exists to avoid, ADVICE round 3)."""
    content_sha = F.coalesce(
        F.sha2(F.col(content_col), 256),
        F.concat(F.lit("null:"), F.col("url")),
        F.concat(F.lit("anon:"), F.expr("uuid()")),
    )
    hashed = pages.withColumn("content_sha", content_sha)
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_sha"]
    )
