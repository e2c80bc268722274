"""In-suite Spark↔DuckDB oracle comparison for a representative subset
of contract queries at sf0.001 (the full 40-query sweep is
tests/oracle_check.py; this keeps the pytest gate itself sensitive to
cross-engine drift)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_check import TABLES, frame_digest  # noqa: E402

from credit_ocr_backend_spark.plans.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

SUBSET = [
    "filter_project",
    "lang_counts",
    "latest_order_per_customer",
    "missing_langs",
    "exact_dups",
    "simhash_fingerprints",
    "embedding_topk",
    "customers_without_orders",
    "pricing_summary",
    # round-2 additions
    "sessionize",
    "scalar_functions",
    "merge_upsert",
    "extraction_docs",
    # round-3 additions
    "ivf_topk",
    "simhash_near_dupes",
    "dedup_clusters",
    "corpus_curation",
    "deterministic_sample",
    # round-4 additions
    "multimodal_pipeline",
    "simhash_near_dupes64",
]


@pytest.fixture(scope="module")
def spark():
    return get_spark("oracle-subset", parallelism=4)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    sdf = fn(spark, SF)
    scols = sdf.columns
    s_sig = frame_digest(scols, [[r[c] for c in scols] for r in sdf.collect()])

    res = duck.execute(sql)
    d_sig = frame_digest([d[0] for d in res.description], res.fetchall())

    assert s_sig == d_sig, f"{name}: spark {s_sig} != duckdb {d_sig}"
