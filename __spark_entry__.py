"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`end_to_end_data_lakehouse_pipeline_spark.plans` — the
query registry where every declared operator carries both a Spark callable
and a DuckDB oracle SQL string (see plans/registry.py for the parity
conventions that keep the two sides hash-identical).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from end_to_end_data_lakehouse_pipeline_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.queries()["orders_enriched"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return plans.oracles()
