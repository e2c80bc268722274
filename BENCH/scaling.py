#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule: the same extraction
job on the same input at two parallelism levels (local[8] vs local[32]
— the sandbox proxy for N vs 4N executors; single machine, so local[8]
genuinely leaves 24 cores idle).

Each measurement runs in a fresh subprocess (own JVM) so the two levels
can't share executor state. Results → stdout JSON + BENCH/BASELINE.md.

Usage: python BENCH/scaling.py [--docs 40000] [--levels 8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from credit_ocr_backend_spark.plans.session import get_spark
from credit_ocr_backend_spark.plans.pipeline import run_pipeline

par = {par}
spark = get_spark("scaling-{par}", parallelism=par)
# Warm-up: run the full pipeline once on a tiny corpus so Python
# workers, whole-stage codegen and JIT are steady-state — on a real
# cluster executors are long-lived and chunks run back-to-back; we
# measure job throughput, not JVM boot.
import tempfile as _tf
run_pipeline(spark, {warm_pages!r}, _tf.mkdtemp(prefix="warm_out"),
             n_buckets=8, n_chunks=1, parallelism=par)
t0 = time.perf_counter()
res = run_pipeline(spark, {pages!r}, {out!r}, n_buckets=64, n_chunks=1,
                   parallelism=par)
wall = time.perf_counter() - t0
print(json.dumps({{"parallelism": par, "wall_sec": round(wall, 2),
                   "n_docs": res.n_docs, "n_failed": res.n_failed,
                   "docs_per_sec": round(res.n_docs / wall, 1)}}))
spark.stop()
"""

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from credit_ocr_backend_spark.plans.session import get_spark
from credit_ocr_backend_spark.sources.pages import write_pages
spark = get_spark("scaling-gen", parallelism=32)
write_pages(spark, {pages!r}, n_docs={docs}, partitions=32)
write_pages(spark, {warm_pages!r}, n_docs=2000, partitions=8)
spark.stop()
"""


def _burn(_):
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < 3.0:
        x += 1
    return x


_CAL_TEXT = "Finanzierung Antrag Unterlagen Objekt Prüfung Bank Kredit " * 200


def _burn_string(_):
    """Engine-like memory traffic (string split + hash) — scales worse
    than the ALU loop on shared hosts; the tighter ceiling."""
    import hashlib

    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 3.0:
        toks = _CAL_TEXT.lower().split()
        hashlib.md5(" ".join(toks[:50]).encode()).hexdigest()
        n += 1
    return n


def hardware_calibration(levels: list[int]) -> dict[int, float]:
    """Aggregate pure-Python throughput of N busy processes — measures
    what the *machine* gives N-way CPU-bound Python (shared-vCPU
    frequency/steal effects), independent of Spark or the engine.
    Returns {parallelism: M iterations/sec}."""
    import multiprocessing as mp

    out = {}
    for n in levels:
        with mp.Pool(n) as pool:
            alu = sum(pool.map(_burn, range(n)))
        with mp.Pool(n) as pool:
            stringy = sum(pool.map(_burn_string, range(n)))
        out[n] = {"alu": alu / 3.0 / 1e6, "string": stringy / 3.0}
    return out


def run_child(code: str, cpus: int | None = None) -> dict:
    """Run in a fresh process; when ``cpus`` is given, pin the ENTIRE
    process tree (JVM + shuffle threads + Python workers) to that many
    cores with taskset. Without pinning, local[8] only limits task
    slots — the JVM's parquet/arrow/shuffle threads still use all 32
    cores, which flatters the low-parallelism run and understates
    scaling efficiency."""
    cmd = [sys.executable, "-c", code]
    if cpus is not None and os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=80_000)
    parser.add_argument("--levels", default="8,32")
    parser.add_argument("--repeats", type=int, default=3,
                        help="runs per level; best (min wall) kept — the "
                             "least-noise estimator on a shared-host VM")
    parser.add_argument("--out-md", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = parser.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    # Corpus + outputs on tmpfs: the bench measures the engine, not the
    # sandbox's block device (real clusters read/write object storage
    # with per-executor bandwidth).
    scratch_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="scaling_", dir=scratch_root)
    pages = f"{workdir}/pages"
    warm_pages = f"{workdir}/warm_pages"
    print(f"generating {args.docs} docs → {pages}", file=sys.stderr)
    subprocess.run(
        [sys.executable, "-c", GEN.format(repo=REPO, pages=pages, warm_pages=warm_pages, docs=args.docs)],
        check=True, cwd=REPO,
    )

    print("calibrating hardware ceiling …", file=sys.stderr)
    hw = hardware_calibration(levels)

    # Interleave levels across repeats so host-load drift hits both
    # levels equally; keep the best (min wall) run per level.
    best: dict[int, dict] = {}
    for rep in range(args.repeats):
        for par in levels:
            out = f"{workdir}/out_{par}_{rep}"
            print(f"rep {rep}: extraction at local[{par}] …", file=sys.stderr)
            r = run_child(
                CHILD.format(repo=REPO, par=par, pages=pages, warm_pages=warm_pages, out=out), cpus=par
            )
            print(json.dumps(r), file=sys.stderr)
            if par not in best or r["wall_sec"] < best[par]["wall_sec"]:
                best[par] = r
    results = [best[par] for par in levels]

    lo, hi = results[0], results[-1]
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    ideal = hi["parallelism"] / lo["parallelism"]
    efficiency = speedup / ideal
    hw_speedup = hw[hi["parallelism"]]["string"] / hw[lo["parallelism"]]["string"]
    hw_alu_speedup = hw[hi["parallelism"]]["alu"] / hw[lo["parallelism"]]["alu"]
    hw_efficiency = hw_speedup / ideal
    normalized = speedup / hw_speedup
    summary = {
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "n_docs": args.docs,
        "levels": results,
        "speedup": round(speedup, 2),
        "ideal_speedup": ideal,
        "hardware_speedup": round(hw_speedup, 2),
        "hardware_alu_speedup": round(hw_alu_speedup, 2),
        "hardware_efficiency": round(hw_efficiency, 3),
        "efficiency_vs_hardware_ceiling": round(normalized, 3),
    }
    print(json.dumps(summary))

    stamp = time.strftime("%Y-%m-%d %H:%M", time.gmtime())
    row = (
        f"| {args.docs // 1000}k docs | {stamp} | "
        f"{lo['wall_sec']} / {hi['wall_sec']} | {speedup:.2f}\u00d7 | "
        f"{efficiency:.3f} | {hw_speedup:.2f}\u00d7 string / "
        f"{hw_alu_speedup:.2f}\u00d7 ALU ({hw_efficiency:.2f}) | "
        f"{normalized:.3f} vs string ceiling |"
    )
    # APPEND to the curated run-history table instead of rewriting the
    # file (a full rewrite once clobbered the skew-A/B and resilience
    # sections — keep BASELINE.md curated, machine-append only here).
    with open(args.out_md, encoding="utf-8") as f:
        doc = f.read()
    marker = "### Run history (host CPU throughput drifts between epochs)"
    if marker in doc:
        head, rest = doc.split(marker, 1)
        table_end = rest.index("\n\n", rest.index("|---"))
        rest = rest[:table_end] + "\n" + row + rest[table_end:]
        doc = head + marker + rest
    else:
        doc += f"\n{marker}\n\n| corpus | epoch (UTC) | best wall 8 / 32 (s) | speedup | raw eff | hw ceiling | engine vs ceiling |\n|---|---|---|---|---|---|---|\n{row}\n"
    with open(args.out_md, "w", encoding="utf-8") as f:
        f.write(doc)
    print(f"appended run-history row to {args.out_md}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
