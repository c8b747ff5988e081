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
- ``sources``    — parquet table loaders (ns-timestamp recipe) + bulk sink
- ``operators``  — relational / join / window / dedup / similarity / text ops
- ``functions``  — reusable column expressions (vector math, text norms)
- ``plans``      — 100 TB layout patterns (range partitioning ≙ HBase regions)
- ``streaming``  — Structured Streaming twins of the batch operators
- ``registry``   — the query inventory exported through __spark_entry__.py
"""

__version__ = "0.1.0"
