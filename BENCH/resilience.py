#!/usr/bin/env python
"""Resumability evidence: SIGKILL the extraction job mid-run, restart
with --resume, verify committed chunks are not recomputed and the final
output is byte-identical to an uninterrupted run.

Usage: python BENCH/resilience.py [--docs 4000]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN = r"""
import sys
sys.path.insert(0, {repo!r})
from credit_ocr_backend_spark.plans.session import get_spark
from credit_ocr_backend_spark.plans.pipeline import run_pipeline
spark = get_spark("resilience", parallelism=8)
res = run_pipeline(spark, {pages!r}, {out!r}, n_buckets=16, n_chunks=4,
                   parallelism=8, resume={resume})
import json
print(json.dumps({{"chunks_run": res.chunks_run,
                   "chunks_skipped": res.chunks_skipped,
                   "n_docs": res.n_docs}}))
spark.stop()
"""


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=4000)
    args = parser.parse_args()

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="resilience_", dir=scratch)
    pages = f"{workdir}/pages"
    subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {REPO!r});"
         f"from credit_ocr_backend_spark.plans.session import get_spark;"
         f"from credit_ocr_backend_spark.sources.pages import write_pages;"
         f"s = get_spark('gen', parallelism=8);"
         f"write_pages(s, {pages!r}, n_docs={args.docs}, partitions=8); s.stop()"],
        check=True, cwd=REPO,
    )

    # 1. clean reference run
    clean_out = f"{workdir}/clean"
    subprocess.run(
        [sys.executable, "-c",
         RUN.format(repo=REPO, pages=pages, out=clean_out, resume="False")],
        check=True, capture_output=True, text=True, cwd=REPO,
    )

    # 2. start a run and SIGKILL it once the first chunk has committed
    victim_out = f"{workdir}/victim"
    proc = subprocess.Popen(
        [sys.executable, "-c",
         RUN.format(repo=REPO, pages=pages, out=victim_out, resume="False")],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    lineage_dir = f"{victim_out}/lineage"
    deadline = time.time() + 300
    while time.time() < deadline:
        frags = (
            [f for f in os.listdir(lineage_dir) if f.endswith(".parquet")]
            if os.path.isdir(lineage_dir)
            else []
        )
        if frags:
            break
        if proc.poll() is not None:
            print("job finished before kill — increase --docs", file=sys.stderr)
            return 1
        time.sleep(0.25)
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    committed_before = len(
        [f for f in os.listdir(lineage_dir) if f.endswith(".parquet")]
    )

    # 3. resume
    out = subprocess.run(
        [sys.executable, "-c",
         RUN.format(repo=REPO, pages=pages, out=victim_out, resume="True")],
        check=True, capture_output=True, text=True, cwd=REPO,
    )
    resumed = json.loads(out.stdout.strip().splitlines()[-1])

    # 4. compare outputs byte-for-byte per url
    cmp = subprocess.run(
        [sys.executable, "-c", f"""
import sys
sys.path.insert(0, {REPO!r})
from credit_ocr_backend_spark.plans.session import get_spark
spark = get_spark("cmp", parallelism=8)
a = spark.read.parquet({clean_out!r} + "/docs").select("url", "extracted_text", "fields_json")
b = spark.read.parquet({victim_out!r} + "/docs").select("url", "extracted_text", "fields_json")
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
print("DIFF=" + str(diff) + " N=" + str(a.count()))
spark.stop()
"""],
        check=True, capture_output=True, text=True, cwd=REPO,
    )
    tail = [l for l in cmp.stdout.splitlines() if l.startswith("DIFF=")][0]
    diff = int(tail.split()[0].split("=")[1])
    n = int(tail.split()[1].split("=")[1])

    summary = {
        "metric": "resume_after_sigkill",
        "committed_chunks_before_kill": committed_before // 1,  # fragments ≈ chunks
        "chunks_skipped_on_resume": resumed["chunks_skipped"],
        "chunks_recomputed": resumed["chunks_run"],
        "row_diff_vs_clean_run": diff,
        "n_docs": n,
        "ok": diff == 0 and resumed["chunks_skipped"] >= 1,
    }
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
