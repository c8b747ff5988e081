"""Feature-engineering operator semantics (operators/features.py):
two-phase rank equivalence, standardization moments, hashing-trick
conservation, and LOO encoding identities — properties the DuckDB
hash-match can't state directly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from gvcf_hbase_spark.registry import load_all
from gvcf_hbase_spark.sources.tables import load_table
from tests.conftest import SF_DIR

SPECS = load_all()


def test_rank_bucketize_matches_naive_global_window(spark):
    """The two-phase distributed rank must be bit-identical to the
    single-partition global window it replaces, and quartile sizes can
    differ by at most one row."""
    two_phase = SPECS["feat_rank_bucketize"].fn(spark, SF_DIR)
    li = load_table(spark, SF_DIR, "lineitem")
    base = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = Window.orderBy("cents", "l_orderkey", "l_linenumber")
    n = base.count()
    naive = base.select(
        "l_orderkey",
        "l_linenumber",
        "cents",
        F.floor(((F.row_number().over(w) - 1) * 4).cast("double") / F.lit(n))
        .cast("long")
        .alias("bucket"),
    )
    a = {(r.l_orderkey, r.l_linenumber): (r.cents, r.bucket) for r in two_phase.collect()}
    b = {(r.l_orderkey, r.l_linenumber): (r.cents, r.bucket) for r in naive.collect()}
    assert a == b
    sizes = [r.c for r in two_phase.groupBy("bucket").agg(F.count("*").alias("c")).collect()]
    assert len(sizes) == 4
    assert max(sizes) - min(sizes) <= 1
    # the big per-row window must be partitioned (by the value bucket),
    # never a global sort over the fact side
    plan = two_phase._jdf.queryExecution().executedPlan().toString()
    assert "vbkt" in plan


def test_standard_scale_moments(spark):
    """Within every group the z-scores must have ~0 mean and ~1e6
    scaled stddev (quantization noise bounded well below one unit)."""
    out = SPECS["feat_standard_scale"].fn(spark, SF_DIR)
    stats = out.groupBy("l_returnflag").agg(
        F.avg("z_qty_1e6").alias("mq"),
        F.stddev_samp("z_qty_1e6").alias("sq"),
        F.avg("z_price_1e6").alias("mp"),
        F.stddev_samp("z_price_1e6").alias("sp"),
    ).collect()
    assert stats
    for r in stats:
        assert abs(r.mq) < 5 and abs(r.mp) < 5
        assert abs(r.sq - 1_000_000) < 100 and abs(r.sp - 1_000_000) < 100


def test_hashing_trick_conserves_tokens(spark):
    """Features live in [0, 64) and the sparse tf mass equals the total
    (non-empty) token count — hashing redistributes, never drops."""
    out = SPECS["feat_hashing_trick"].fn(spark, SF_DIR)
    r = out.agg(
        F.min("feature").alias("lo"),
        F.max("feature").alias("hi"),
        F.sum("tf").alias("mass"),
    ).collect()[0]
    assert 0 <= r.lo and r.hi <= 63
    from gvcf_hbase_spark.functions.textfns import normalize_text

    d = load_table(spark, SF_DIR, "documents")
    n_toks = (
        d.select(F.explode(F.split(normalize_text(F.col("text")), " ")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    assert r.mass == n_toks


def test_target_encode_loo_matches_window_form(spark):
    """The agg+broadcast-join LOO must equal the per-group window
    formulation row-multiset-for-row-multiset. (Multiset, not dict:
    (l_orderkey, l_linenumber) is NOT unique in this synthetic
    lineitem — 60000 rows / 45832 distinct pairs at sf0.01.)"""
    li = load_table(spark, SF_DIR, "lineitem")
    base = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_returnflag",
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long").alias("qc"),
    )
    w = Window.partitionBy("l_returnflag")
    naive = base.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.when(
            F.count("*").over(w) > 1,
            F.floor(
                (F.sum("qc").over(w) - F.col("qc")).cast("double")
                / (F.count("*").over(w) - 1) * 100 + F.lit(0.5)
            ).cast("long"),
        ).alias("loo_mean_1e4"),
    )
    out = SPECS["feat_target_encode_loo"].fn(spark, SF_DIR)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b


def test_frequency_encode_rank_order(spark):
    """Rank 1 is the modal category; share sums to ~1e6 over distinct
    categories; every doc keeps exactly one row."""
    out = SPECS["feat_frequency_encode"].fn(spark, SF_DIR)
    d = load_table(spark, SF_DIR, "documents")
    assert out.count() == d.count()
    cats = out.select("source", "src_count", "src_rank", "src_freq_1e6").distinct().collect()
    top = max(cats, key=lambda r: (r.src_count, -ord(r.source[0])))
    assert min(cats, key=lambda r: r.src_rank).src_count == top.src_count
    share = sum(r.src_freq_1e6 for r in cats)
    assert abs(share - 1_000_000) <= len(cats)  # floor rounding slack
