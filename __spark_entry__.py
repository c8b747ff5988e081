"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`gvcf_hbase_spark.registry` — the operator inventory
(SURVEY.md §2B) lives next to the operator implementations; this file just
re-exports it in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gvcf_hbase_spark.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    specs = load_all()
    return specs["agg_group"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return {k: spec.fn for k, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key; rows-only ops are omitted."""
    return {k: spec.oracle for k, spec in load_all().items() if spec.oracle is not None}
