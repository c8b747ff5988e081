"""Query registry — the single source of truth for the engine's operator
inventory (SURVEY §2B).

Each operator module registers its queries with :func:`register`; the
driver contract file ``__spark_entry__.py`` re-exports the registry as
``queries()`` / ``oracle_sql()``. Keeping the Spark plan and its DuckDB
oracle SQL side by side in the operator module is deliberate: the §5.4
determinism rules (identical aliases, identical rounding, µs-or-coarser
timestamps) are much easier to hold when both sides are written together.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: str | None  # None => driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}

# Operator modules that register queries on import, in SURVEY §7.1
# milestone order.
_MODULES = [
    "gvcf_hbase_spark.operators.relational",
    "gvcf_hbase_spark.operators.joins",
    "gvcf_hbase_spark.operators.windows",
    "gvcf_hbase_spark.operators.setops",
    "gvcf_hbase_spark.operators.subqueries",
    "gvcf_hbase_spark.operators.scalar_fns",
    "gvcf_hbase_spark.operators.dedup",
    "gvcf_hbase_spark.operators.similarity",
    "gvcf_hbase_spark.operators.text",
    "gvcf_hbase_spark.operators.multimodal",
    "gvcf_hbase_spark.operators.curation",
    "gvcf_hbase_spark.operators.udfs",
    "gvcf_hbase_spark.streaming.batch_twins",
    "gvcf_hbase_spark.streaming.stream_ops",
    "gvcf_hbase_spark.sources.gvcf_text",
]


def register(key: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add ``fn(spark, sf_dir) -> DataFrame`` to the inventory."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = QuerySpec(key=key, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


_loaded = False


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the inventory."""
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            importlib.import_module(mod)
        _loaded = True
    return QUERIES
