#!/usr/bin/env python
"""Per-document core probes — the round-6 optimization sessions'
measurement instrument for Python-core changes.

Two modes:

* single (default): one process warms the operator caches on docs
  [0, warm), then times three DISTINCT unseen 5k-doc ranges (mirrors
  pipeline steady state: every doc unseen, cache vocabulary warm).
  Stable to ~±3% on this host where Spark-leg walls swing ±20-100%.
* wide: N worker processes (multiprocessing, no Spark), each warming
  then timing its own unseen range — the Spark executor's compute
  environment minus Spark. ``--freeze`` additionally applies the fused
  stage's one-shot gc.freeze, matching the worker heap state exactly.

Usage:
    python BENCH/core_probe.py                 # single-process
    python BENCH/core_probe.py --wide 32       # 32-process probe
    python BENCH/core_probe.py --wide 32 --freeze
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TIME = 4000


def _process_range(lo: int, n: int, freeze_after_warm: bool = False) -> float:
    from credit_ocr_backend_spark.core.config import default_config
    from credit_ocr_backend_spark.core.document import process_document
    from credit_ocr_backend_spark.operators.stages import _extracted_row
    from credit_ocr_backend_spark.sources.pages import build_page

    cfg = default_config()

    def run(start: int, count: int) -> None:
        for k in range(start, start + count):
            p = build_page(k)
            r = process_document(p["url"], p["html"], cfg)
            _extracted_row(p["url"], 0, r["status"], r["error"],
                           r["extracted_text"], r["extraction"], 0.0)

    run(0, 2000)  # warm the operator caches
    if freeze_after_warm:
        from credit_ocr_backend_spark.operators.stages import _freeze_worker_heap
        _freeze_worker_heap()
    pages = [build_page(k) for k in range(lo, lo + n)]
    t0 = time.perf_counter()
    for p in pages:
        r = process_document(p["url"], p["html"], cfg)
        _extracted_row(p["url"], 0, r["status"], r["error"],
                       r["extracted_text"], r["extraction"], 0.0)
    return (time.perf_counter() - t0) * 1000 / n


def _wide_worker(args) -> float:
    proc_id, freeze = args
    return _process_range(10_000 + proc_id * N_TIME, N_TIME, freeze)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--wide", type=int, default=0,
                        help="process count for the multiprocessing probe")
    parser.add_argument("--freeze", action="store_true",
                        help="apply the stage's one-shot gc.freeze after warm")
    args = parser.parse_args()

    if args.wide:
        from multiprocessing import Pool

        with Pool(args.wide) as pool:
            res = pool.map(_wide_worker,
                           [(i, args.freeze) for i in range(args.wide)])
        mean = sum(res) / len(res)
        print(f"{args.wide}-proc per-proc mean {mean:.3f} ms/doc "
              f"(min {min(res):.3f} max {max(res):.3f})")
    else:
        vals = [_process_range(lo, 5000) for lo in (3000, 8000, 13000)]
        print(" ".join(f"{v:.3f}" for v in vals), "ms/doc over 3 unseen ranges")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
