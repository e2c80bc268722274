"""Structured Streaming surface tests: the same Arrow stages under
readStream produce byte-identical results, and the watermarked window
operator aggregates by event time."""

from __future__ import annotations

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from credit_ocr_backend_spark.plans.session import get_spark  # noqa: E402
from credit_ocr_backend_spark.sources.pages import write_pages  # noqa: E402
from credit_ocr_backend_spark.streaming.stream_pipeline import (  # noqa: E402
    _sessionize_fn,
    sessionize_stream,
    stream_extract,
    windowed_field_counts,
)


@pytest.fixture(scope="module")
def spark():
    return get_spark("streaming-tests", parallelism=4)


def test_stream_extract_available_now(spark, tmp_path):
    pages = str(tmp_path / "pages")
    write_pages(spark, pages, n_docs=40, partitions=4)

    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    query = stream_extract(spark, pages, out, ckpt, max_files_per_trigger=4)
    query.awaitTermination(120)

    docs = spark.read.parquet(out)
    assert docs.count() == 40
    assert docs.where(F.col("status") != "done").count() == 0

    # restart with no new files → no duplicates (exactly-once per batch)
    query2 = stream_extract(spark, pages, out, ckpt, max_files_per_trigger=4)
    query2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 40


def test_windowed_field_counts_batch_semantics(spark):
    # The window operator is testable on a batch frame (same expression).
    rows = [
        ("a", "vat_id", True, "2025-01-01 10:01:00"),
        ("b", "vat_id", False, "2025-01-01 10:02:00"),
        ("c", "vat_id", True, "2025-01-01 10:07:00"),
        ("d", "term", True, "2025-01-01 10:01:30"),
    ]
    df = spark.createDataFrame(
        rows, "url string, field_name string, is_valid boolean, ts string"
    ).withColumn("event_ts", F.to_timestamp("ts"))
    out = windowed_field_counts(df.drop("ts")).collect()
    by_key = {(r["field_name"], str(r["window_start"])): r for r in out}
    first_win = by_key[("vat_id", "2025-01-01 10:00:00")]
    assert first_win["n"] == 2 and first_win["n_valid"] == 1
    second_win = by_key[("vat_id", "2025-01-01 10:05:00")]
    assert second_win["n"] == 1 and second_win["n_valid"] == 1
    assert by_key[("term", "2025-01-01 10:00:00")]["n"] == 1


def test_sessionize_stream_gap_close(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): a >30 min gap
    closes the open session and emits it; open sessions stay in state."""
    events_dir = str(tmp_path / "events")
    rows = [
        (1, "2025-01-01 10:00:00"),
        (1, "2025-01-01 10:10:00"),
        (1, "2025-01-01 11:30:00"),  # 80 min gap → closes session 1
        (2, "2025-01-01 10:05:00"),  # single open session, never closed
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(events_dir)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(events_dir)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sess_out").collect()
    closed = {(r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
              for r in out if r["closed"]}
    # user 1 session 1 closes via the gap; user 2's closes via the
    # event-time TIMEOUT (final watermark 11:00 > 10:05 + 30 min).
    # User 1's open session (11:30, timeout 12:00 > watermark) stays in
    # state — correctly NOT emitted.
    assert closed == {
        (1, "2025-01-01 10:00:00", "2025-01-01 10:10:00", 2),
        (2, "2025-01-01 10:05:00", "2025-01-01 10:05:00", 1),
    }
    assert all(r["closed"] for r in out)


def test_sessionize_fn_timeout_branch():
    """The event-time timeout path emits the open session and clears
    state (unit-tested with a fake GroupState — the only branch a
    finite availableNow stream can't reach deterministically)."""
    class FakeState:
        hasTimedOut = True
        exists = True
        get = (3_600_000, 3_660_000, 5)
        removed = False

        def remove(self):
            self.removed = True

    st = FakeState()
    frames = list(_sessionize_fn((7,), iter([]), st))
    assert st.removed and len(frames) == 1
    row = frames[0].iloc[0]
    assert row["user_id"] == 7 and row["n_events"] == 5 and bool(row["closed"])
    assert str(row["session_start"]) == "1970-01-01 01:00:00"
    assert str(row["session_end"]) == "1970-01-01 01:01:00"


def _fake_open_state(start_ms, last_ms, n):
    class FakeState:
        hasTimedOut = False
        exists = True
        get = (start_ms, last_ms, n)

        def __init__(self):
            self.updated = None
            self.timeout = None

        def update(self, t):
            self.updated = t

        def setTimeoutTimestamp(self, t):
            self.timeout = t

    return FakeState()


def test_sessionize_fn_cross_batch_and_late_events():
    """ADVICE round 2: events split across Arrow batches and arriving
    out of order relative to the open-session state must be merged
    globally — no regressed last_ms, no spurious session splits."""
    import pandas as pd

    def pdf(ts_list):
        return pd.DataFrame({"ts": [pd.Timestamp(t, unit="ms") for t in ts_list]})

    GAP = 1800 * 1000

    # Open session [100_000, 160_000], 3 events.
    # Batch A carries a LATE event inside the span (120_000 → densify)
    # and a forward event; batch B carries an even later-timestamped
    # event that belongs BETWEEN them — only a global sort folds these
    # correctly.
    st = _fake_open_state(100_000, 160_000, 3)
    frames = list(
        _sessionize_fn((1,), iter([pdf([120_000, 200_000]), pdf([180_000])]), st)
    )
    assert frames == []  # nothing closed
    assert st.updated == (100_000, 200_000, 6)
    assert st.timeout == 200_000 + GAP

    # Late event within the gap BEFORE session start → extends backward.
    st = _fake_open_state(10 * GAP, 10 * GAP + 1000, 2)
    list(_sessionize_fn((1,), iter([pdf([10 * GAP - 5000])]), st))
    assert st.updated == (10 * GAP - 5000, 10 * GAP + 1000, 3)

    # Late events gap-separated from the open session → their own
    # CLOSED earlier session; open session untouched.
    st = _fake_open_state(10 * GAP, 10 * GAP + 1000, 2)
    frames = list(_sessionize_fn((1,), iter([pdf([1000])]), st))
    assert len(frames) == 1
    r = frames[0].iloc[0]
    assert int(r["n_events"]) == 1 and bool(r["closed"])
    assert st.updated == (10 * GAP, 10 * GAP + 1000, 2)

    # Regression guard: a later batch with an older-but-in-gap event
    # must NOT regress last_ms (the original bug: last_ms followed raw
    # batch order).
    st = _fake_open_state(0, 60_000, 2)
    list(_sessionize_fn((1,), iter([pdf([90_000]), pdf([70_000])]), st))
    assert st.updated == (0, 90_000, 4)
    assert st.timeout == 90_000 + GAP


def test_stream_extract_matches_batch_pipeline_bytes(spark, tmp_path):
    """Stream ≡ batch: the same pages through stream_extract and through
    the batch run_pipeline must produce byte-identical extracted_text
    and fields_json per url — the per-row invariant holds regardless of
    execution mode (micro-batch vs chunked batch)."""
    from credit_ocr_backend_spark.plans.pipeline import run_pipeline

    pages = str(tmp_path / "pages")
    write_pages(spark, pages, n_docs=40, partitions=4)

    query = stream_extract(
        spark, pages, str(tmp_path / "sout"), str(tmp_path / "sckpt"),
        max_files_per_trigger=4,
    )
    query.awaitTermination(120)
    run_pipeline(spark, pages, str(tmp_path / "bout"), n_chunks=2, parallelism=4)

    cols = ["url", "status", "extracted_text", "fields_json"]
    streamed = {r["url"]: r for r in spark.read.parquet(str(tmp_path / "sout")).select(cols).collect()}
    batched = {r["url"]: r for r in spark.read.parquet(f"{tmp_path}/bout/docs").select(cols).collect()}
    assert set(streamed) == set(batched) and len(streamed) == 40
    for url, srow in streamed.items():
        brow = batched[url]
        assert (srow["status"], srow["extracted_text"], srow["fields_json"]) == (
            brow["status"], brow["extracted_text"], brow["fields_json"]
        ), url


def test_dedup_stream_drops_recrawls(spark, tmp_path):
    """Streaming exact dedup: identical payloads within the watermark
    horizon are dropped; distinct payloads all survive."""
    from credit_ocr_backend_spark.streaming.stream_pipeline import dedup_stream

    pages_dir = str(tmp_path / "pages")
    rows = [
        ("u://a", "2025-01-01 10:00:00", b"<html>A</html>"),
        ("u://a2", "2025-01-01 10:05:00", b"<html>A</html>"),  # re-crawl of A
        ("u://b", "2025-01-01 10:10:00", b"<html>B</html>"),
        ("u://b2", "2025-01-01 10:12:00", b"<html>B</html>"),  # re-crawl of B
        ("u://c", "2025-01-01 10:20:00", b"<html>C</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, ts_s string, html binary").select(
        "url", F.to_timestamp("ts_s").alias("warc_ts"), "html"
    )
    df.coalesce(1).write.mode("overwrite").parquet(pages_dir)

    stream = spark.readStream.schema("url string, warc_ts timestamp, html binary").parquet(pages_dir)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(out) == 3
    # exactly one survivor per distinct payload
    payloads = sorted(bytes(r["html"]).decode() for r in out)
    assert payloads == ["<html>A</html>", "<html>B</html>", "<html>C</html>"]


def test_dedup_stream_null_payloads_all_pass(spark, tmp_path):
    """NULL html rows must NOT dedup against each other (sha2(NULL) is
    NULL; the operator treats NULL keys as equal) — the batch path
    records them as failed, so the stream must let every one through."""
    from credit_ocr_backend_spark.streaming.stream_pipeline import dedup_stream

    pages_dir = str(tmp_path / "pages")
    rows = [
        ("u://n1", "2025-01-01 10:00:00", None),
        ("u://n2", "2025-01-01 10:01:00", None),
        ("u://ok", "2025-01-01 10:02:00", b"<html>X</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, ts_s string, html binary").select(
        "url", F.to_timestamp("ts_s").alias("warc_ts"), "html"
    )
    df.coalesce(1).write.mode("overwrite").parquet(pages_dir)
    stream = spark.readStream.schema("url string, warc_ts timestamp, html binary").parquet(pages_dir)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_null_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT url FROM dedup_null_out").collect()
    assert {r["url"] for r in out} == {"u://n1", "u://n2", "u://ok"}


def test_dedup_stream_null_html_null_url_rows_all_pass(spark, tmp_path):
    """ADVICE round 3: when BOTH html and url are NULL the key must
    fall through to a per-row uuid — otherwise the url fallback itself
    produces a NULL key and every such row after the first is silently
    dropped (the exact failure mode the fallback documents avoiding)."""
    from credit_ocr_backend_spark.streaming.stream_pipeline import dedup_stream

    pages_dir = str(tmp_path / "pages")
    rows = [
        (None, "2025-01-01 10:00:00", None),
        (None, "2025-01-01 10:01:00", None),
        (None, "2025-01-01 10:02:00", None),
        ("u://ok", "2025-01-01 10:03:00", b"<html>X</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, ts_s string, html binary").select(
        "url", F.to_timestamp("ts_s").alias("warc_ts"), "html"
    )
    df.coalesce(1).write.mode("overwrite").parquet(pages_dir)

    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, html binary"
    ).parquet(pages_dir)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_null_null_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_null_null_out").collect()
    assert len(out) == 4


def _near_dup_corpus():
    """Texts with exact twins (Hamming 0 by construction), mild
    perturbations (may or may not clear the radius — parity must hold
    either way), and unrelated noise."""
    words = [f"w{i}" for i in range(40)]
    base_a = " ".join(words)
    base_b = " ".join(words[::-1][:30])
    rows = [
        ("u://a1", "2025-01-01 10:00:00", base_a),
        ("u://a2", "2025-01-01 10:01:00", base_a),           # exact twin
        ("u://a3", "2025-01-01 10:02:00", base_a + " extra"),  # near twin
        ("u://b1", "2025-01-01 10:03:00", base_b),
        ("u://b2", "2025-01-01 10:30:00", base_b),           # exact twin
        ("u://n1", "2025-01-01 10:05:00", "completely different words here kaleidoscope"),
        ("u://n2", "2025-01-01 10:06:00", "unrelated payload of tokens zeppelin quartz"),
        ("u://nul", "2025-01-01 10:07:00", None),            # NULL text: both paths skip
    ]
    return rows


def test_simhash_row_expression_matches_batch_operator(spark):
    """simhash_token_votes + simhash_from_votes (the shuffle-free
    per-row shape the stream needs) produce byte-identical fingerprints
    to the explode+groupBy batch simhash(), at 16 and 64 bits."""
    from credit_ocr_backend_spark.operators.dedup import (
        simhash,
        simhash_from_votes,
        simhash_token_votes,
    )

    df = spark.createDataFrame(
        [(u, t) for u, _, t in _near_dup_corpus() if t is not None],
        "url string, text string",
    )
    for bits in (16, 64):
        n_words = (bits + 15) // 16
        voted = df.select(
            "url",
            *[simhash_token_votes("text", w).alias(f"_v{w}") for w in range(n_words)],
        )
        per_row = voted.select(
            "url",
            simhash_from_votes([f"_v{w}" for w in range(n_words)], bits).alias("fp"),
        )
        batch = simhash(df, "url", "text", bits)
        merged = per_row.join(batch, per_row["url"] == batch["doc"]).select(
            "url", "fp", "simhash"
        )
        rows = merged.collect()
        assert len(rows) == 7
        for r in rows:
            assert r["fp"] == r["simhash"], (bits, r["url"])


@pytest.mark.parametrize("bits,bands", [(16, 4), (64, 4)])
def test_simhash_dedup_stream_matches_batch_pairs(spark, tmp_path, bits, bands):
    """Stream ≡ batch parity for the near-dup guard: one availableNow
    pass over a static corpus emits exactly the batch
    simhash_near_dupes pair set (after per-band distinct) — at the
    16-bit default AND the documented at-scale 64-bit/16-bit-band
    config."""
    from credit_ocr_backend_spark.operators.dedup import simhash_near_dupes
    from credit_ocr_backend_spark.streaming.stream_pipeline import (
        simhash_dedup_pairs_stream,
    )

    rows = _near_dup_corpus()
    pages_dir = str(tmp_path / f"pages{bits}")
    df = spark.createDataFrame(
        rows, "url string, ts_s string, text string"
    ).select("url", F.to_timestamp("ts_s").alias("warc_ts"), "text")
    df.coalesce(1).write.mode("overwrite").parquet(pages_dir)

    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, text string"
    ).parquet(pages_dir)
    q = (
        simhash_dedup_pairs_stream(stream, bits=bits, bands=bands)
        .writeStream.format("memory")
        .queryName(f"simdup_out{bits}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in spark.sql(f"SELECT * FROM simdup_out{bits}").collect()
    }

    batch = simhash_near_dupes(
        df.where(F.col("text").isNotNull()), "url", "text", bits=bits, bands=bands
    ).collect()
    want = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in batch}

    assert got == want
    # the exact twins guarantee at least two Hamming-0 pairs exist
    assert {("u://a1", "u://a2", 0), ("u://b1", "u://b2", 0)} <= want


def test_simhash_dedup_stream_horizon(spark, tmp_path):
    """A re-crawl arriving beyond the watermark horizon is NOT paired
    (state pruned) — the stream guards ingest; the batch pass owns the
    full-corpus sweep."""
    from credit_ocr_backend_spark.streaming.stream_pipeline import (
        simhash_dedup_pairs_stream,
    )

    text = " ".join(f"tok{i}" for i in range(30))
    early = [("u://x1", "2025-01-01 10:00:00", text)]
    late = [
        ("u://x2", "2025-01-01 13:00:00", text),  # 3h later, 1h horizon
        ("u://x3", "2025-01-01 13:01:00", text),  # within horizon of x2
    ]
    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(
        early, "url string, ts_s string, text string"
    ).select("url", F.to_timestamp("ts_s").alias("warc_ts"), "text").coalesce(
        1
    ).write.mode("overwrite").parquet(pages_dir)

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "pairs_out")

    def run_once():
        # file sink: the memory sink cannot recover from a checkpoint,
        # and the horizon semantics only show across two runs
        stream = spark.readStream.schema(
            "url string, warc_ts timestamp, text string"
        ).parquet(pages_dir)
        q = (
            simhash_dedup_pairs_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    spark.createDataFrame(
        late, "url string, ts_s string, text string"
    ).select("url", F.to_timestamp("ts_s").alias("warc_ts"), "text").coalesce(
        1
    ).write.mode("append").parquet(pages_dir)
    run_once()

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(sink).select("doc_a", "doc_b").distinct().collect()
    }
    # x2↔x3 pair within horizon; x1 pairs pruned away by the watermark
    assert ("u://x2", "u://x3") in pairs
    assert not any("u://x1" in p for p in pairs)


def test_simhash_dedup_stream_no_self_pairs(spark, tmp_path):
    """A same-url re-crawl must not emit a degenerate (x, x) pair —
    the batch operator's doc_a < doc_b join can never produce one, and
    same-url payload dedup is dedup_stream's job."""
    from credit_ocr_backend_spark.streaming.stream_pipeline import (
        simhash_dedup_pairs_stream,
    )

    text = " ".join(f"tok{i}" for i in range(30))
    rows = [
        ("u://same", "2025-01-01 10:00:00", text),
        ("u://same", "2025-01-01 10:05:00", text),   # re-crawl, same url
        ("u://other", "2025-01-01 10:10:00", text),  # distinct url, twin text
    ]
    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, ts_s string, text string").select(
        "url", F.to_timestamp("ts_s").alias("warc_ts"), "text"
    ).coalesce(1).write.mode("overwrite").parquet(pages_dir)

    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, text string"
    ).parquet(pages_dir)
    q = (
        simhash_dedup_pairs_stream(stream)
        .writeStream.format("memory")
        .queryName("simdup_self")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pairs = {(r["doc_a"], r["doc_b"]) for r in spark.sql(
        "SELECT DISTINCT doc_a, doc_b FROM simdup_self").collect()}
    assert ("u://same", "u://same") not in pairs
    # the cross-url twin IS caught (both copies of u://same pair with it)
    assert ("u://other", "u://same") in pairs
