#!/usr/bin/env python
"""Regenerate the _TRAINED_CENTS_SF001 literals in plans/contract.py.

The ivf_topk_trained oracle pins the k-means|| trainer's deterministic
output as inline DuckDB literals (valid only at the sf it was computed
from — the driver's correctness gate runs at sf0.01). Re-run this after
ANY change to ivf_centroids_trained / quantize / the md5 draw scheme:

    python tools/gen_trained_centroids.py [sf_dir]

It retrains on the given corpus (default /root/testdata/sf0.01),
rewrites the literal block in place, and prints the diff summary.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from credit_ocr_backend_spark.operators.similarity import ivf_centroids_trained
    from credit_ocr_backend_spark.plans.session import get_spark

    spark = get_spark("gen-trained-cents", parallelism=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = sorted(
        (r["centroid_id"], list(r["cvec"]))
        for r in ivf_centroids_trained(emb).collect()
    )
    spark.stop()

    path = os.path.join(REPO, "credit_ocr_backend_spark", "plans", "contract.py")
    src = open(path, encoding="utf-8").read()
    start = src.index("_TRAINED_CENTS_SF001 = [")
    end = src.index("\n]", start) + 2  # keep the trailing newline in src
    lines = ["_TRAINED_CENTS_SF001 = ["]
    for cid, v in cents:
        lines.append(f"    ({cid}, {v}),")
    lines.append("]")
    new_block = "\n".join(lines)
    changed = src[start:end] != new_block
    open(path, "w", encoding="utf-8").write(src[:start] + new_block + src[end:])
    print(f"{len(cents)} centroids from {sf_dir} → contract.py "
          f"({'UPDATED' if changed else 'unchanged'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
