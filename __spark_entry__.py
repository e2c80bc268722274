"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship training-data-curation query on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                dedup/similarity/text-analysis training-data ops).
oracle_sql()  — matching DuckDB SQL per query (omitted only for the
                extraction-pipeline rows-only checks, whose per-document
                Python semantics are byte-verified by the pytest golden
                suite instead).

Implementations live in credit_ocr_backend_spark.plans.contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from credit_ocr_backend_spark.plans import contract

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-source curation summary (dedup + quality + language
    + fingerprint stats) over the documents corpus."""
    return contract.flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
