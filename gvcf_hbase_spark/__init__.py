"""gvcf_hbase_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of tomwhite/gvcf-hbase, rebuilt Spark-first.

The reference (tomwhite/gvcf-hbase, a Java/HBase/Spark proof-of-concept for
storing per-sample gVCF variant records in one HBase table and combining
them per genomic position) is a storage/ETL engine; see SURVEY.md §2A for
its operator surface. This package re-expresses that surface — plus the
relational / windowed / streaming / LLM-data-pipeline operator families a
100 TB training-data pipeline needs — as idiomatic PySpark DataFrame plans
optimized by Catalyst.

Layout:
- ``session``    — SparkSession factory with the required configs
- ``sources``    — parquet table loaders (dtype-branching event time),
                   gVCF text parser
- ``operators``  — relational / join / window / dedup / similarity / text ops
- ``functions``  — reusable column expressions (vector math, text norms)
- ``plans``      — 100 TB layout patterns (range partitioning ≙ HBase
                   regions, ``bulk_put`` connector facade)
- ``streaming``  — Structured Streaming twins of the batch operators
- ``registry``   — the query inventory exported through __spark_entry__.py

The reusable operator functions are re-exported flat (lazily, PEP 562) so
engine users can ``from gvcf_hbase_spark import asof_join, bulk_put, ...``
without knowing the module layout.
"""

from __future__ import annotations

import importlib

__version__ = "0.2.0"

# name -> defining module, resolved on first attribute access
_API = {
    # session
    "get_spark": "gvcf_hbase_spark.session",
    "apply_runtime_confs": "gvcf_hbase_spark.session",
    # sources
    "load_table": "gvcf_hbase_spark.sources.tables",
    "spread": "gvcf_hbase_spark.sources.tables",
    "with_event_time": "gvcf_hbase_spark.sources.tables",
    "read_gvcf": "gvcf_hbase_spark.sources.gvcf_text",
    "parse_gvcf_lines": "gvcf_hbase_spark.sources.gvcf_text",
    # gVCF block semantics (A4/A8/A9)
    "combine_positions": "gvcf_hbase_spark.operators.gvcf",
    "expand_blocks": "gvcf_hbase_spark.operators.gvcf",
    "carry_forward": "gvcf_hbase_spark.operators.gvcf",
    # join operators
    "asof_join": "gvcf_hbase_spark.operators.joins",
    "salted_join": "gvcf_hbase_spark.operators.joins",
    # dedup / similarity building blocks
    "minhash_signatures": "gvcf_hbase_spark.operators.dedup",
    "lsh_candidate_pairs": "gvcf_hbase_spark.operators.dedup",
    "simhash_near_pairs": "gvcf_hbase_spark.operators.dedup",
    "knn_topk_ivf": "gvcf_hbase_spark.operators.similarity",
    # layout / sink (A5/A12)
    "HBaseTarget": "gvcf_hbase_spark.plans.layout",
    "bulk_put": "gvcf_hbase_spark.plans.layout",
    "bulk_write_range_sorted": "gvcf_hbase_spark.plans.layout",
    "write_hive_partitioned": "gvcf_hbase_spark.plans.layout",
    "write_bucketed": "gvcf_hbase_spark.plans.layout",
    # streaming
    "read_events_stream": "gvcf_hbase_spark.streaming.stream_ops",
    "run_available_now": "gvcf_hbase_spark.streaming.stream_ops",
    "carry_forward_stateful": "gvcf_hbase_spark.streaming.stream_ops",
    # inventory
    "load_all": "gvcf_hbase_spark.registry",
}

__all__ = sorted(_API) + ["__version__"]


def __getattr__(name: str):
    if name in _API:
        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return __all__
