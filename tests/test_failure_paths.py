"""End-to-end failure semantics: per-document failure isolation (the
reference's handle_extraction_error analogue) and empty-chunk resume."""

from __future__ import annotations

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from credit_ocr_backend_spark.plans.pipeline import run_pipeline  # noqa: E402
from credit_ocr_backend_spark.plans.session import get_spark  # noqa: E402
from credit_ocr_backend_spark.sources.pages import build_page  # noqa: E402

# A layout-words payload with explicit-null confidences: line confidence
# becomes None, and the geometric pairing pass hits the reference's
# min(None, ...) TypeError (preserved quirk) → the document must fail in
# isolation, not the job.
_POISON_HTML = (
    '<html><body><main><script type="application/x-layout-words">'
    '[{"t": "Firmenname", "p": 1, "x": 0.5, "y": 1.0, "w": 0.5, "h": 0.01, "c": null},'
    ' {"t": "DemoTech", "p": 1, "x": 3.0, "y": 1.01, "w": 0.4, "h": 0.01, "c": null}]'
    "</script></main></body></html>"
).encode("utf-8")


@pytest.fixture(scope="module")
def spark():
    return get_spark("failure-tests", parallelism=4)


def _write_mixed_corpus(spark, path: str) -> None:
    rows = []
    for k in range(20):
        p = build_page(k)
        rows.append((p["url"], p["warc_ts"], p["html"], "", p["lang"]))
    rows.append(("https://poison.example/doc/x", build_page(0)["warc_ts"], _POISON_HTML, "", "de"))
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).withColumn("warc_date", F.to_date("warc_ts"))
    df.write.mode("overwrite").partitionBy("warc_date").parquet(path)


def test_poison_document_fails_in_isolation(spark, tmp_path):
    pages = str(tmp_path / "pages")
    _write_mixed_corpus(spark, pages)
    out = str(tmp_path / "out")
    res = run_pipeline(spark, pages, out, n_buckets=4, n_chunks=1)
    assert res.n_docs == 21
    assert res.n_failed == 1

    docs = spark.read.parquet(f"{out}/docs")
    poison = docs.where(F.col("url") == "https://poison.example/doc/x").collect()[0]
    assert poison["status"] == "failed"
    assert "TypeError" in poison["error"]
    # healthy docs unaffected
    assert docs.where(F.col("status") == "done").count() == 20
    # lineage accounts for the failure
    lineage = spark.read.parquet(f"{out}/lineage")
    assert lineage.agg(F.sum("n_failed")).collect()[0][0] == 1
    # failed docs contribute no field rows
    results = spark.read.parquet(f"{out}/results")
    assert results.where(F.col("url") == "https://poison.example/doc/x").count() == 0


def test_empty_chunk_is_resumable(spark, tmp_path):
    pages = str(tmp_path / "pages2")
    _write_mixed_corpus(spark, pages)
    out = str(tmp_path / "out2")
    # Prune everything out: empty chunks must still commit lineage...
    res1 = run_pipeline(
        spark, pages, out, n_buckets=4, n_chunks=2,
        ts_min="2030-01-01", ts_max="2030-01-02",
    )
    assert res1.n_docs == 0 and res1.chunks_run == 2
    # ...so a resume run skips them instead of re-running no-ops forever.
    res2 = run_pipeline(
        spark, pages, out, n_buckets=4, n_chunks=2, resume=True,
        ts_min="2030-01-01", ts_max="2030-01-02",
    )
    assert res2.chunks_skipped == 2 and res2.chunks_run == 0


def test_resume_refuses_mismatched_parameters(spark, tmp_path):
    """Chunk identity = (n_buckets, n_chunks, ts window, mode); resuming
    under different values must fail fast, not silently skip chunk ids
    whose bucket ranges changed (ADVICE round 1)."""
    pages = str(tmp_path / "pages3")
    _write_mixed_corpus(spark, pages)
    out = str(tmp_path / "out3")
    run_pipeline(spark, pages, out, n_buckets=4, n_chunks=2)
    with pytest.raises(ValueError, match="resume parameter mismatch"):
        run_pipeline(spark, pages, out, n_buckets=8, n_chunks=2, resume=True)
    # matching parameters resume fine
    res = run_pipeline(spark, pages, out, n_buckets=4, n_chunks=2, resume=True)
    assert res.chunks_skipped == 2 and res.chunks_run == 0


def test_object_store_out_root_fail_fast_without_connector(spark, tmp_path):
    """Metadata I/O is scheme-generic (Hadoop FileSystem), but a scheme
    with no loadable implementation on the classpath must still fail
    fast at construction — never silently split resume state from
    data. This sandbox has no s3 connector jars, so s3:// exercises
    exactly that path."""
    from credit_ocr_backend_spark.sources.checkpoint import CheckpointManager

    with pytest.raises(ValueError, match="no usable Hadoop FileSystem"):
        CheckpointManager(spark, "s3://bucket/extract")


def test_checkpoint_file_scheme_roundtrip(spark, tmp_path):
    """The Hadoop-FS code path end-to-end on an explicit file:// scheme
    URI (the scheme-generic route an hdfs:///s3a:// out_root takes):
    manifest write/read/check, lineage append + done_chunks, chunk
    write/read and MERGE upsert all through one CheckpointManager."""
    from credit_ocr_backend_spark.sources.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, f"file://{tmp_path}/ckpt")
    assert mgr.root == f"file://{tmp_path}/ckpt"

    params = {"n_buckets": 4, "n_chunks": 2, "mode": "test"}
    mgr.write_manifest(params)
    assert mgr.read_manifest() == params
    mgr.check_manifest(params)  # same params: ok
    with pytest.raises(ValueError, match="parameter mismatch"):
        mgr.check_manifest({**params, "n_buckets": 8})

    mgr.append_lineage("extracted", 0, [{"bucket": 0, "n_docs": 3, "n_failed": 0, "cpu_ms": 1.0}], 10, "runA")
    mgr.append_lineage("extracted", 1, [], 5, "runA")  # empty-chunk sentinel
    assert mgr.done_chunks("extracted") == {0, 1}
    assert -1 in mgr.done_buckets("extracted")

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    mgr.write_chunk(base, "docs", 0)
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    mgr.upsert_chunk(upd, "docs", 0, ["k"])
    got = {r["k"]: r["v"] for r in mgr.read_chunk("docs", 0).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_upsert_crash_window_recovery(spark, tmp_path):
    """ADVICE round 2: a crash between the two swap renames leaves the
    chunk directory absent while lineage says done. _recover_chunk must
    repair every window before the next read/upsert."""
    import os
    import shutil

    from credit_ocr_backend_spark.sources.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "rec"))
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    mgr.write_chunk(base, "docs", 0)
    path = mgr._chunk_path("docs", 0)

    # window 1: staging complete, live retired, swap not finished
    upd = spark.createDataFrame([(1, "A"), (2, "b")], "k long, v string")
    from credit_ocr_backend_spark.sources.checkpoint import merge_upsert

    merge_upsert(spark.read.parquet(path), upd, ["k"]).write.mode("overwrite").parquet(path + ".staging")
    os.rename(path, path + ".old")  # simulate crash right here
    got = {r["k"]: r["v"] for r in mgr.read_chunk("docs", 0).collect()}
    assert got == {1: "A", 2: "b"}
    assert not os.path.exists(path + ".staging") and not os.path.exists(path + ".old")

    # window 2: crash after swap, retired not yet dropped
    shutil.copytree(path, path + ".old")
    got = {r["k"]: r["v"] for r in mgr.read_chunk("docs", 0).collect()}
    assert got == {1: "A", 2: "b"}
    assert not os.path.exists(path + ".old")

    # window 3: incomplete staging (no _SUCCESS), live retired → restore original
    os.makedirs(path + ".staging")
    open(path + ".staging/part-broken.parquet", "w").close()
    os.rename(path, path + ".old")
    got = {r["k"]: r["v"] for r in mgr.read_chunk("docs", 0).collect()}
    assert got == {1: "A", 2: "b"}


def test_null_html_recorded_as_failed(spark, tmp_path):
    """A NULL html row must reach the stage and land as status=failed in
    docs + lineage — not vanish from the accounting (ADVICE round 1:
    both length(html) skew predicates are NULL for it)."""
    pages = str(tmp_path / "pages4")
    rows = []
    for k in range(4):
        p = build_page(k)
        rows.append((p["url"], p["warc_ts"], p["html"], "", p["lang"]))
    rows.append(("https://null.example/doc", build_page(0)["warc_ts"], None, "", "de"))
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).withColumn("warc_date", F.to_date("warc_ts"))
    df.write.mode("overwrite").partitionBy("warc_date").parquet(pages)

    out = str(tmp_path / "out4")
    res = run_pipeline(spark, pages, out, n_buckets=2, n_chunks=1)
    assert res.n_docs == 5 and res.n_failed == 1
    docs = spark.read.parquet(f"{out}/docs")
    row = docs.where(F.col("url") == "https://null.example/doc").collect()[0]
    assert row["status"] == "failed" and "null html" in row["error"]


def test_ts_bounds_are_timestamp_precise(spark, tmp_path):
    """A mid-day ts_max must include that day's partition but cut rows
    at the exact timestamp (round-1 behavior excluded the whole day)."""
    pages = str(tmp_path / "pages5")
    base = build_page(0)["warc_ts"]
    day = base.strftime("%Y-%m-%d")
    rows = []
    for k, hour in enumerate([3, 9, 15, 21]):
        p = build_page(k)
        ts = base.replace(hour=hour, minute=0, second=0)
        rows.append((p["url"], ts, p["html"], "", p["lang"]))
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).withColumn("warc_date", F.to_date("warc_ts"))
    df.write.mode("overwrite").partitionBy("warc_date").parquet(pages)

    out = str(tmp_path / "out5")
    res = run_pipeline(
        spark, pages, out, n_buckets=2, n_chunks=1,
        ts_min=f"{day}T06:00:00", ts_max=f"{day}T18:00:00",
    )
    docs = spark.read.parquet(f"{out}/docs")
    assert res.n_docs == 2 == docs.count()  # 09:00 and 15:00 only


def test_malformed_ts_bound_fails_fast(spark, tmp_path):
    """ADVICE round 2: a bound to_timestamp can't parse must raise at
    submit time — never NULL out the predicate and commit empty chunks
    as done. Coarse bounds (YYYY-MM / YYYY) are padded, not rejected."""
    pages = str(tmp_path / "pages_ts")
    p = build_page(0)
    spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], "", p["lang"])],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("warc_date", F.date_format("warc_ts", "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy("warc_date").parquet(pages)

    with pytest.raises(ValueError, match="does not parse as a timestamp"):
        run_pipeline(
            spark, pages, str(tmp_path / "o_bad"), n_buckets=2, n_chunks=1,
            ts_min="not-a-date",
        )

    # coarse month bound: padded to the month's first instant, still runs
    res = run_pipeline(
        spark, pages, str(tmp_path / "o_coarse"), n_buckets=2, n_chunks=1,
        ts_min="2020-01", ts_max="2030-01",
    )
    assert res.n_docs == 1


def test_manifest_crash_window_recovery(spark, tmp_path):
    """A crash between write_manifest's delete and rename strands a
    complete .tmp while the manifest is gone; read_manifest must finish
    the swap instead of mistaking the committed run for a fresh one
    (which would silently re-enable parameter drift)."""
    import json
    import os

    from credit_ocr_backend_spark.sources.checkpoint import CheckpointManager

    root = str(tmp_path / "mrec")
    mgr = CheckpointManager(spark, root)
    params = {"n_buckets": 4, "n_chunks": 2, "mode": "test"}
    mgr.write_manifest(params)

    # simulate the window: tmp fully written, manifest deleted
    local = os.path.join(root, "run_manifest.json")
    with open(local + ".tmp", "w") as f:
        json.dump(params, f)
    os.remove(local)
    assert mgr.read_manifest() == params  # recovered from .tmp
    assert os.path.exists(local) and not os.path.exists(local + ".tmp")

    # a corrupt .tmp (crash DURING the tmp write, nothing committed)
    # is dropped, not adopted
    os.remove(local)
    with open(local + ".tmp", "w") as f:
        f.write("{truncated")
    assert mgr.read_manifest() is None
    assert not os.path.exists(local + ".tmp")


def test_lineage_without_manifest_refuses_resume(spark, tmp_path):
    """Committed lineage with no manifest means the committed chunk
    identity is unknowable — check_manifest must refuse instead of
    adopting the caller's current parameters."""
    from credit_ocr_backend_spark.sources.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "orphan"))
    mgr.append_lineage(
        "extracted", 0, [{"bucket": 0, "n_docs": 1, "n_failed": 0, "cpu_ms": 1.0}], 10, "runX"
    )
    with pytest.raises(ValueError, match="no run manifest"):
        mgr.check_manifest({"n_buckets": 4})


def test_lineage_fragment_upload_is_atomic(spark, tmp_path):
    """Fragments are uploaded under a .tmp name and renamed into place:
    no final-named partial file can exist, and stranded .tmp debris from
    a crashed upload is invisible to lineage readers."""
    import os

    from credit_ocr_backend_spark.sources.checkpoint import CheckpointManager

    root = str(tmp_path / "atomic")
    mgr = CheckpointManager(spark, root)
    mgr.append_lineage(
        "extracted", 0, [{"bucket": 0, "n_docs": 1, "n_failed": 0, "cpu_ms": 1.0}], 10, "runY"
    )
    names = os.listdir(os.path.join(root, "lineage"))
    assert all(n.endswith(".parquet") for n in names if not n.startswith(".")), names

    # a truncated upload (crash mid-copy) only ever exists under .tmp —
    # readers must keep working with the debris present
    with open(os.path.join(root, "lineage", "part-crashed.parquet.tmp"), "wb") as f:
        f.write(b"PAR1garbage")
    assert mgr.done_chunks("extracted") == {0}


def test_whole_table_read_sweeps_upsert_debris(spark, tmp_path):
    """read() must repair chunk=NNNN.old/.staging debris before
    partition discovery: a leftover .old directory would otherwise be
    listed as its own partition value and double-count the chunk."""
    import os
    import shutil

    from credit_ocr_backend_spark.sources.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, str(tmp_path / "sweep"))
    mgr.write_chunk(spark.createDataFrame([(1, "a")], "k long, v string"), "docs", 0)
    mgr.write_chunk(spark.createDataFrame([(2, "b")], "k long, v string"), "docs", 1)

    # crash window: swap finished but retired copy not yet dropped
    path1 = mgr._chunk_path("docs", 1)
    local1 = path1.replace("file://", "")
    shutil.copytree(local1, local1 + ".old")

    got = mgr.read("docs")
    assert got.count() == 2  # not 3: the .old copy must not double-count
    assert {r["k"] for r in got.collect()} == {1, 2}
    assert not os.path.exists(local1 + ".old")


def test_resume_accepts_legacy_raw_ts_spelling(spark, tmp_path):
    """Manifests written before ts canonicalization pinned the raw
    bound spelling; resuming with an equal-instant spelling must
    migrate the manifest instead of refusing."""
    import json
    import os

    from credit_ocr_backend_spark.sources.pages import write_pages

    pages = str(tmp_path / "pages")
    write_pages(spark, pages, n_docs=20, partitions=2)
    out = str(tmp_path / "legacy")
    run_pipeline(spark, pages, out, n_chunks=1, parallelism=2, ts_min="2024-01-01")

    # simulate a legacy manifest: rewrite the pinned bound to raw form
    # (through the same Hadoop FS the manager uses - a direct local
    # write would orphan the .crc checksum sidecar)
    from credit_ocr_backend_spark.sources.checkpoint import CheckpointManager

    mgr = CheckpointManager(spark, out)
    m = mgr.read_manifest()
    assert m["ts_min"] == "2024-01-01 00:00:00"
    m["ts_min"] = "2024-01-01"
    mgr.write_manifest(m)

    res = run_pipeline(
        spark, pages, out, n_chunks=1, parallelism=2,
        ts_min="2024-01-01", resume=True,
    )
    assert res.chunks_skipped == 1 and res.chunks_run == 0
