"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship training-data-curation query on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                dedup/similarity/text-analysis training-data ops).
oracle_sql()  — matching DuckDB SQL for EVERY query (round 2: the
                extraction-pipeline rows read reference-generated
                expected parquet — tools/gen_expected_extraction.py —
                so their hash match is reference parity, not
                self-agreement).

Implementations live in credit_ocr_backend_spark.plans.contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Import-location safety: the engine package lives next to this file.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from credit_ocr_backend_spark.plans import contract  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-source curation summary (dedup + quality + language
    + fingerprint stats) over the documents corpus."""
    return contract.flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
