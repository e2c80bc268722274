"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count, column names, and an order-insensitive value hash.

Usage: python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    # Type-FAITHFUL rendering (round-2 fix): the driver's hash distinguishes
    # None vs '', Decimal vs float, and int-valued floats vs int.  Round 1
    # normalized those away and masked 4 driver hash-fails — this mirror must
    # fail exactly when the driver fails, so every type gets a distinct tag.
    if v is None:
        return "\x00null"
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, Decimal):
        return "d:" + str(v)
    if isinstance(v, float):
        return "f:" + repr(v)
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def frame_digest(cols, rows):
    import hashlib

    cols = list(cols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode("utf-8")).hexdigest()
    return sorted(cols), len(rows), h


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from credit_ocr_backend_spark.plans.session import get_spark

    spark = get_spark("oracle-check", parallelism=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    # Oracles that embed corpus-derived literals are only valid at the
    # pinned sf (the driver's correctness gate runs at sf0.01); at any
    # other sf the comparison fails BY CONSTRUCTION, so skip with a
    # visible note instead of reporting a spurious red.
    from credit_ocr_backend_spark.plans.contract import ORACLE_SF_PINNED

    sf_name = os.path.basename(sf.rstrip("/"))
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        pinned = ORACLE_SF_PINNED.get(name)
        if pinned is not None and pinned != sf_name:
            print(f"skip  {name}: oracle literals pinned to {pinned}, running {sf_name}")
            continue
        try:
            sdf = fn(spark, sf)
            # The driver's canonicalizer (pandas sort_values over all
            # columns) crashes on list/struct/map cells — round-2's only
            # red rows.  Hard-fail here so the local gate fails exactly
            # when the driver does.
            from pyspark.sql.types import ArrayType, MapType, StructType

            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                print(
                    f"FAIL  {name}: complex-typed output columns {complex_cols} "
                    "(driver canonicalizer cannot hash list/struct cells — "
                    "emit scalars, e.g. viz.rgb_csv)"
                )
                failures += 1
                continue
            srows = sdf.collect()
            scols = sdf.columns
            s_sig = frame_digest(scols, [[r[c] for c in scols] for r in srows])
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue

        if name not in oracles:
            print(f"ok*   {name}: rows-only rows={s_sig[1]} (no oracle)")
            continue

        try:
            # .arrow() (not .fetchall()) so un-CAST DuckDB sums surface as
            # Decimal(hugeint) instead of being silently collapsed to Python
            # int — the exact divergence the driver's stricter hash catches.
            tbl = con.execute(oracles[name]).arrow()
            dcols = tbl.schema.names
            drows = [[row[c] for c in dcols] for row in tbl.to_pylist()]
            d_sig = frame_digest(dcols, drows)
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {str(exc)[:200]}")
            failures += 1
            continue

        if s_sig == d_sig:
            print(f"ok    {name}: rows={s_sig[1]}")
        else:
            failures += 1
            print(f"FAIL  {name}: spark(cols={s_sig[0]}, n={s_sig[1]}, h={s_sig[2][:8]})"
                  f" vs duck(cols={d_sig[0]}, n={d_sig[1]}, h={d_sig[2][:8]})")
    print(f"\n{failures} failures / {len(only) if only else len(qs)} checked")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
