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
