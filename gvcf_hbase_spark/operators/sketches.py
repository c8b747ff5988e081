"""Frequency / membership sketches built as plain DataFrame dataflow
(SURVEY §2B ledger, round 4): a count-min sketch and a Bloom filter,
both constructed with the engine-portable md5-prefix hash family so the
sketch TABLES themselves — not just their downstream answers — are
deterministic and replayable by the DuckDB oracle.

Why build sketches out of groupBy instead of a custom UDAF: a count-min
sketch IS a (row, cell) → count aggregation and a Bloom filter IS a
distinct-position set — both shapes Catalyst already executes with
map-side partial aggregation, so each sketch costs ONE shuffle whose
payload is bounded by the sketch size (d·w cells / m bits) per map
partition regardless of input rows. That is exactly the property that
makes sketches worth shipping at 100 TB: the exchange carries the
sketch, not the data. (`agg_hll_sketch_merge` covers the
cardinality-sketch tier with Spark's native HLL; these two cover
frequency and membership with fully oracle-checkable arithmetic.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table, spread

_CMS_D = 4  # hash rows
_CMS_W = 512  # cells per row
_BLOOM_M = 4096  # bits
_BLOOM_K = 3  # hashes per key


def _cell(j, item_col, w: int, sep: str):
    """Engine-portable cell index: md5-prefix-32 of 'j<sep>item' mod w.
    Matches the DuckDB twin CAST(concat('0x', substr(md5(...),1,8)) AS
    BIGINT) % w — same idiom as functions.textfns.stable_hash32."""
    s = F.concat(F.lit(str(j)), F.lit(sep), item_col.cast("string"))
    return (F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % w).alias("cell")


_CMS_ORACLE = f"""
    WITH items AS (SELECT l_partkey AS item FROM lineitem),
    exact AS (
      SELECT item, CAST(count(*) AS BIGINT) AS exact_cnt FROM items GROUP BY item
    ),
    cells AS (
      SELECT j,
             CAST(concat('0x', substr(md5(CAST(item AS VARCHAR)),
                  j * 8 + 1, 8)) AS BIGINT) % {_CMS_W} AS cell,
             item
      FROM items CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
    ),
    cms AS (SELECT j, cell, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY j, cell),
    probe AS (
      SELECT DISTINCT e.item, k.j,
             CAST(concat('0x', substr(md5(CAST(e.item AS VARCHAR)),
                  k.j * 8 + 1, 8)) AS BIGINT) % {_CMS_W} AS cell
      FROM exact e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) k
    ),
    est AS (
      SELECT p.item, min(cms.c) AS est_cnt
      FROM probe p JOIN cms ON cms.j = p.j AND cms.cell = p.cell
      GROUP BY p.item
    )
    SELECT e.item AS l_partkey, e.exact_cnt, est.est_cnt,
           est.est_cnt - e.exact_cnt AS overcount
    FROM exact e JOIN est ON est.item = e.item
    ORDER BY e.exact_cnt DESC, e.item
    LIMIT 25
"""


@register("agg_countmin_freq", oracle=_CMS_ORACLE, tags=("sketch", "agg"))
def agg_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4, w=512) over lineitem part keys, then point
    frequency estimates for every distinct key, reported against exact
    counts for the 25 hottest keys (overcount = collision inflation —
    the CMS one-sided error, est ≥ exact always).

    Plan shape: the build explodes each row into d=4 (j, cell) pairs and
    aggregates — partial aggregation collapses every map partition to at
    most d·w = 2048 rows BEFORE the exchange, so the build shuffle ships
    the sketch, not the table, no matter how many input rows (the whole
    point at 100 TB). The probe side joins against the ≤2048-row sketch
    — an automatic broadcast — and takes min over the d cells per key.
    Hash family is the portable md5 digest — ONE digest per row, its
    four 32-bit hex slices as the d independent hashes — so the oracle
    rebuilds the identical sketch cell-for-cell. md5 is the documented
    oracle-replayability trade (same as dedup.py's signature path): a
    production build swaps in xxhash64(item, seed=j), codegen-native
    and ~5× cheaper, changing only this hash expression. At production
    scale the probe set is whatever keys you care about; here it is all
    distinct keys so the error profile is fully visible.
    """
    # ONE md5 per row, four independent 32-bit slices of its 128-bit
    # digest as the d hash functions (slices of a cryptographic digest
    # are independent; 4× cheaper than four per-j digests — measured
    # 4.3 s → ~1 s at sf0.1 where the build-side hashing dominates).
    def slices(df):
        h = F.md5(F.col("item").cast("string"))
        arr = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    (F.conv(F.substring(h, j * 8 + 1, 8), 16, 10).cast("long") % _CMS_W).alias(
                        "cell"
                    ),
                )
                for j in range(_CMS_D)
            ]
        )
        return df.select("item", F.explode(arr).alias("h")).select(
            "item", F.col("h.j").alias("j"), F.col("h.cell").alias("cell")
        )

    # spread(): the fixture table arrives as ONE input split, which would
    # serialize 600k md5s onto one core (guarded no-op when the input is
    # already parallel — the 100 TB case).
    items = spread(
        load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("item"))
    )
    exact = items.groupBy("item").agg(F.count("*").cast("bigint").alias("exact_cnt"))
    cms = (
        slices(items)
        .groupBy("j", "cell")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    probe = slices(exact.select("item"))
    est = (
        probe.join(cms, ["j", "cell"])
        .groupBy("item")
        .agg(F.min("c").alias("est_cnt"))
    )
    return (
        exact.join(est, "item")
        .select(
            F.col("item").alias("l_partkey"),
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.col("exact_cnt").desc(), "l_partkey")
        .limit(25)
    )


_BLOOM_ORACLE = f"""
    WITH members AS (
      SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    bits AS (
      SELECT DISTINCT
             CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '#',
                  CAST(ck AS VARCHAR))), 1, 8)) AS BIGINT) % {_BLOOM_M} AS pos
      FROM members CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
    ),
    probe AS (
      SELECT c_custkey AS ck, j,
             CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '#',
                  CAST(c_custkey AS VARCHAR))), 1, 8)) AS BIGINT) % {_BLOOM_M} AS pos
      FROM customer CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
      WHERE c_custkey <= 500
    ),
    hit AS (
      SELECT p.ck, CAST(count(b.pos) AS BIGINT) AS n_hit
      FROM probe p LEFT JOIN bits b ON b.pos = p.pos
      GROUP BY p.ck
    )
    SELECT h.ck AS c_custkey,
           h.n_hit = {_BLOOM_K} AS in_bloom,
           m.ck IS NOT NULL AS in_truth,
           (h.n_hit = {_BLOOM_K}) AND m.ck IS NULL AS false_positive
    FROM hit h LEFT JOIN members m ON m.ck = h.ck
"""


@register("agg_bloom_membership", oracle=_BLOOM_ORACLE, tags=("sketch", "join"))
def agg_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (m=4096 bits, k=3) built over the urgent-order
    customer set, probed by a bounded customer slice, with ground truth
    joined back so the one-sided error is visible (false_positive rows
    exist; false negatives cannot).

    This is the MANUAL, oracle-checkable form of the runtime bloom
    pushdown `join_runtime_bloom` demonstrates natively: build = one
    distinct-position aggregation whose exchange carries ≤ m rows per
    map partition (the filter, not the fact table); probe = a broadcast
    join against the ≤ m-row bit set + a 3-of-3 match count. At 100 TB
    the build side streams any cardinality into a fixed 4096-row sketch
    and the probe is map-side — the same reason HBase/LSM stores put
    blooms in front of every file read (reference architecture analog:
    per-HFile bloom before a Get touches disk)."""
    orders = load_table(spark, sf_dir, "orders")
    members = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("ck"))
        .distinct()
    )
    js = list(range(_BLOOM_K))
    bits = (
        members.select(
            F.explode(F.array(*[_cell(j, F.col("ck"), _BLOOM_M, "#") for j in js])).alias("pos")
        )
        .distinct()
    )
    probe = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(F.col("c_custkey").alias("ck"))
        .select(
            "ck",
            F.explode(F.array(*[_cell(j, F.col("ck"), _BLOOM_M, "#") for j in js])).alias("pos"),
        )
    )
    hit = (
        probe.join(F.broadcast(bits.withColumn("b", F.lit(1))), "pos", "left")
        .groupBy("ck")
        .agg(F.count("b").cast("bigint").alias("n_hit"))
    )
    truth = members.withColumn("t", F.lit(1))
    return hit.join(F.broadcast(truth), "ck", "left").select(
        F.col("ck").alias("c_custkey"),
        (F.col("n_hit") == _BLOOM_K).alias("in_bloom"),
        F.col("t").isNotNull().alias("in_truth"),
        ((F.col("n_hit") == _BLOOM_K) & F.col("t").isNull()).alias("false_positive"),
    )


@register("agg_hll_intersection", oracle=None, tags=("sketch", "approx"))
def agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA over persisted HLL sketches: estimate the overlap
    between the urgent-order and high-priority-order customer
    populations by inclusion–exclusion — |A∩B| ≈ est(A) + est(B) −
    est(A∪B) — where the union is computed by MERGING the two sketches,
    never rescanning the fact table. This is the audience-overlap /
    cross-segment query a sketch store answers in O(sketch) after one
    pass built the per-segment sketches (`agg_hll_sketch_merge` is the
    rollup half of the same pattern; this is the set-algebra half).

    Rows-only by design (HLL binaries and estimates are engine-
    specific); the unit test bounds the estimate against the exact
    overlap. Inclusion–exclusion amplifies HLL error on small overlaps
    — the greatest(0, ...) clamp and the reported segment estimates
    make that error profile visible to the caller; theta sketches are
    the upgrade when set algebra is the primary workload."""
    o = load_table(spark, sf_dir, "orders")
    seg = o.select(
        "o_custkey",
        (F.col("o_orderpriority") == "1-URGENT").alias("in_a"),
        (F.col("o_orderpriority") == "2-HIGH").alias("in_b"),
    )
    sk = seg.agg(
        F.hll_sketch_agg(F.when(F.col("in_a"), F.col("o_custkey"))).alias("sk_a"),
        F.hll_sketch_agg(F.when(F.col("in_b"), F.col("o_custkey"))).alias("sk_b"),
    )
    est = sk.select(
        F.hll_sketch_estimate("sk_a").alias("est_a"),
        F.hll_sketch_estimate("sk_b").alias("est_b"),
        F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")).alias("est_union"),
    )
    return est.select(
        "est_a",
        "est_b",
        "est_union",
        F.greatest(
            F.lit(0).cast("bigint"),
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).cast("bigint"),
        ).alias("est_intersection"),
    )
