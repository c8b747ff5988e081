"""Set operations (SURVEY §2B.7). New surface vs the reference (a storage
PoC); required for a complete engine. All four are shuffle-based hash
operations in Spark (union is shuffle-free; intersect/except plan as
aggregates/anti-joins) and scale horizontally.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS segment
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey AS custkey, c_mktsegment AS segment
    FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (unionByName: position-independent, safer across schema
    evolution than positional union)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE")
    sel = lambda df: df.select(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment"))  # noqa: E731
    return sel(a).unionByName(sel(b))


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union = bag union + distinct (hash aggregate)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("prio"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("prio"))
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct intersection (customers with both open and finished
    orders) — plans as a left-semi join after distinct."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (exceptAll): keeps surplus duplicates — the
    bag semantics EXCEPT ALL defines."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("prio"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("prio"))
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (min of multiplicities) — intersectAll; the
    multiplicity bookkeeping plans as an aggregate of per-side counts,
    one shuffle per side on the full row key."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("prio"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("prio"))
    return a.intersectAll(b)


@register(
    "set_except_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI set difference (EXCEPT DISTINCT) — completes the six-operator
    set algebra alongside the bag form (`set_except`): customers holding
    open orders but no finished ones, one row per distinct key. Plans as
    a left-anti join on the whole row after per-side dedup — duplicates
    collapse BEFORE the anti probe, so the shuffle carries distinct rows
    only (the bag form must carry multiplicities instead)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)
