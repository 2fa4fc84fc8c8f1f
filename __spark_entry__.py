"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over corrie_spark.queries.registry: every implemented
operator from SURVEY.md §2 (plus the beyond-parity dedup/similarity/
text operators) registers a Spark callable and, where SQL-expressible,
a DuckDB oracle with identical column names.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from corrie_spark.queries.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from corrie_spark.queries.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
