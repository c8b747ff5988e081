"""ML feature-engineering operators (SURVEY §2B.13 extension): the
transforms a training pipeline runs between curation and the trainer —
exact quantile bucketing, standardization, categorical encoding
(frequency and leave-one-out target), and the hashing trick. SparkML has
estimator-style versions of several of these; re-expressing them as pure
DataFrame plans keeps them inside Catalyst (pushdown, AQE, whole-stage
codegen) and makes them oracle-checkable.

Scale notes (100 TB):
- ``feat_rank_bucketize`` is the interesting one: exact global quantile
  assignment needs a global rank, and the naive ``row_number() OVER
  (ORDER BY v)`` is a single-partition sort. This uses the two-phase
  distributed rank instead (the same trick as ``curate_pack_batches``'s
  prefix sum): value-range buckets are rank-contiguous because the
  bucket key ``v div W`` is monotone in ``v``, so a per-bucket local
  rank plus an exclusive running offset over ONE ROW PER BUCKET equals
  the global rank bit-for-bit. Every sort is bounded by a bucket.
- Everything else is one map-side-combining aggregate joined back to
  the fact side on its own grouping key (broadcast-sized dims), or a
  pure map stage — no global windows anywhere.
- Determinism (SURVEY §5.4): floats enter as cent-quantized int64
  partials; downstream algebra uses only IEEE +,-,*,/ and sqrt (all
  correctly rounded => engine-identical), never exp/ln/pow; outputs are
  floor-scaled integers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from gvcf_hbase_spark.functions.textfns import normalize_text
from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table

_N_QBUCKETS = 4  # quartiles
_RANK_VBKT_W = 100_000  # cents per value-range bucket (~$1000 wide)
_HASH_DIM = 64  # hashing-trick feature dimension

_CENTS = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_QCENTS = "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"

_RANK_BUCKETIZE_ORACLE = f"""
    WITH base AS (
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             {_CENTS} AS cents
      FROM lineitem
    ),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY cents, l_orderkey, l_linenumber)
               AS rk,
             count(*) OVER () AS n
      FROM base
    )
    SELECT l_orderkey, l_linenumber, cents,
           CAST(floor(CAST((rk - 1) * {_N_QBUCKETS} AS DOUBLE) / n)
                AS BIGINT) AS bucket
    FROM r
"""


@register("feat_rank_bucketize", oracle=_RANK_BUCKETIZE_ORACLE, tags=("features", "window"))
def feat_rank_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global quantile bucketing (quartiles of extended price):
    bucket(x) = floor((rank(x) - 1) * 4 / n) with a pinned tiebreak.

    The oracle uses the naive global window; the engine computes the
    SAME rank with the two-phase distributed form — rows bucket by
    ``cents div W`` (monotone => rank-contiguous), rank locally inside
    each bucket, then add the exclusive prefix count of all earlier
    buckets (a window over one row per bucket: ~thousands of rows at
    100 TB). Proves bit-identical to the single-partition window while
    every sort stays bounded. n enters as a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    base = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        cents.alias("cents"),
    ).withColumn("vbkt", (F.col("cents") / _RANK_VBKT_W).cast("long"))
    in_bkt = Window.partitionBy("vbkt").orderBy("cents", "l_orderkey", "l_linenumber")
    local = base.withColumn("lr", F.row_number().over(in_bkt))
    counts = base.groupBy("vbkt").agg(F.count("*").alias("c"))
    off_w = Window.orderBy("vbkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "vbkt", F.coalesce(F.sum("c").over(off_w), F.lit(0)).alias("off")
    )
    n = base.agg(F.count("*").alias("n"))
    return (
        local.join(F.broadcast(offsets), "vbkt")
        .crossJoin(F.broadcast(n))
        .select(
            "l_orderkey",
            "l_linenumber",
            "cents",
            F.floor(
                ((F.col("off") + F.col("lr") - 1) * _N_QBUCKETS).cast("double")
                / F.col("n")
            ).cast("long").alias("bucket"),
        )
    )


_STANDARD_SCALE_ORACLE = f"""
    WITH base AS (
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_returnflag, {_QCENTS} AS qc, {_CENTS} AS pc
      FROM lineitem
    ),
    g AS (
      SELECT l_returnflag, count(*) AS n,
             sum(qc) AS sq, sum(CAST(qc AS DOUBLE) * CAST(qc AS DOUBLE)) AS sqq,
             sum(pc) AS sp, sum(CAST(pc AS DOUBLE) * CAST(pc AS DOUBLE)) AS spp
      FROM base GROUP BY l_returnflag
    )
    SELECT b.l_orderkey, b.l_linenumber, b.l_returnflag,
           CAST(floor((b.qc - CAST(g.sq AS DOUBLE) / g.n)
                / sqrt((g.sqq - CAST(g.sq AS DOUBLE) * g.sq / g.n) / (g.n - 1))
                * 1e6 + 0.5) AS BIGINT) AS z_qty_1e6,
           CAST(floor((b.pc - CAST(g.sp AS DOUBLE) / g.n)
                / sqrt((g.spp - CAST(g.sp AS DOUBLE) * g.sp / g.n) / (g.n - 1))
                * 1e6 + 0.5) AS BIGINT) AS z_price_1e6
    FROM base b JOIN g USING (l_returnflag)
"""


@register("feat_standard_scale", oracle=_STANDARD_SCALE_ORACLE, tags=("features", "agg"))
def feat_standard_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization of two measures in one pass:
    group sufficient statistics (n, Σx, Σx² — ints and exactly-rounded
    double squares) come from ONE collapsing aggregate, broadcast back
    onto the fact side by its own grouping key, and z = (x - μ)/σ runs
    per row map-side. The two-pass estimator beats Welford here because
    the partials are order-insensitive (map-side combine safe). sqrt is
    IEEE-correctly-rounded, so both engines agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    qc = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    pc = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    base = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_returnflag",
        qc.alias("qc"),
        pc.alias("pc"),
    )
    g = base.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("qc").alias("sq"),
        F.sum(F.col("qc").cast("double") * F.col("qc").cast("double")).alias("sqq"),
        F.sum("pc").alias("sp"),
        F.sum(F.col("pc").cast("double") * F.col("pc").cast("double")).alias("spp"),
    )

    def z(x, s, ssq):
        mean = F.col(s).cast("double") / F.col("n")
        var = (
            F.col(ssq) - F.col(s).cast("double") * F.col(s) / F.col("n")
        ) / (F.col("n") - 1)
        return F.floor((F.col(x) - mean) / F.sqrt(var) * 1e6 + F.lit(0.5)).cast("long")

    return base.join(F.broadcast(g), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        z("qc", "sq", "sqq").alias("z_qty_1e6"),
        z("pc", "sp", "spp").alias("z_price_1e6"),
    )


_FREQ_ENCODE_ORACLE = """
    WITH g AS (
      SELECT source, count(*) AS src_count FROM documents GROUP BY source
    ),
    r AS (
      SELECT source, src_count,
             CAST(dense_rank() OVER (ORDER BY src_count DESC, source)
                  AS BIGINT) AS src_rank,
             sum(src_count) OVER () AS total
      FROM g
    )
    SELECT d.doc_id, d.source, r.src_count,
           r.src_rank,
           CAST(floor(CAST(r.src_count AS DOUBLE) * 1000000 / r.total + 0.5)
                AS BIGINT) AS src_freq_1e6
    FROM documents d JOIN r USING (source)
"""


@register("feat_frequency_encode", oracle=_FREQ_ENCODE_ORACLE, tags=("features", "agg"))
def feat_frequency_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency encoding of a categorical column: each category maps to
    its corpus count, dense frequency rank (pinned tiebreak), and
    million-scaled share — the standard high-cardinality alternative to
    one-hot (dimension stays 3 no matter how many categories). One
    collapsing aggregate; the rank/share windows run over the tiny
    category dim (≤ #categories rows), then a broadcast equi-join back."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(F.count("*").alias("src_count"))
    rank_w = Window.orderBy(F.col("src_count").desc(), "source")
    tot_w = Window.partitionBy()
    r = g.select(
        "source",
        "src_count",
        F.dense_rank().over(rank_w).cast("long").alias("src_rank"),
        F.sum("src_count").over(tot_w).alias("total"),
    )
    return d.join(F.broadcast(r), "source").select(
        "doc_id",
        "source",
        "src_count",
        "src_rank",
        F.floor(F.col("src_count").cast("double") * 1_000_000 / F.col("total") + F.lit(0.5))
        .cast("long")
        .alias("src_freq_1e6"),
    )


_HASHING_TRICK_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(
               lower(trim(regexp_replace(text, ' +', ' ', 'g'))), ' ')) AS tok
      FROM documents
    )
    SELECT doc_id,
           CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)
             % {_HASH_DIM} AS feature,
           CAST(count(*) AS BIGINT) AS tf
    FROM toks
    WHERE tok <> ''
    GROUP BY 1, 2
"""


@register("feat_hashing_trick", oracle=_HASHING_TRICK_ORACLE, tags=("features", "text"))
def feat_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (feature hashing): tokens map to a fixed
    64-dim sparse count vector via the engine-portable md5-prefix-32
    hash — no vocabulary pass, no dictionary shuffle, new tokens never
    change the schema. Output is the sparse COO form (doc, feature, tf).
    One explode + one map-side-combining aggregate keyed (doc_id,
    feature); collisions are the accepted trade (documented dimension).
    At 100 TB the vocabulary-free property is the point: a dictionary
    join would shuffle the full token stream against a mutable vocab."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    feature = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long") % _HASH_DIM
    )
    return toks.groupBy("doc_id", feature.alias("feature")).agg(
        F.count("*").cast("long").alias("tf")
    )


_TARGET_ENCODE_ORACLE = f"""
    WITH base AS (
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_returnflag, {_QCENTS} AS qc
      FROM lineitem
    ),
    g AS (
      SELECT l_returnflag, count(*) AS n, sum(qc) AS s
      FROM base GROUP BY l_returnflag
    )
    SELECT b.l_orderkey, b.l_linenumber, b.l_returnflag,
           CASE WHEN g.n > 1
                THEN CAST(floor(CAST(g.s - b.qc AS DOUBLE) / (g.n - 1)
                                * 100 + 0.5) AS BIGINT)
                ELSE NULL END AS loo_mean_1e4
    FROM base b JOIN g USING (l_returnflag)
"""


@register("feat_target_encode_loo", oracle=_TARGET_ENCODE_ORACLE, tags=("features", "agg"))
def feat_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: a category encodes as the mean of
    the target over all OTHER rows in the category — (Σ - x)/(n - 1) —
    the leakage-safe variant of mean encoding. The naive formulation
    re-aggregates per row; this is one collapsing aggregate of exact
    int sufficient statistics broadcast back, with the LOO subtraction
    as pure row-local arithmetic. Singleton categories yield NULL
    (nothing to borrow) via an explicit guard, not a 0-division."""
    li = load_table(spark, sf_dir, "lineitem")
    qc = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    base = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_returnflag",
        qc.alias("qc"),
    )
    g = base.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.sum("qc").alias("s")
    )
    loo = F.when(
        F.col("n") > 1,
        F.floor(
            (F.col("s") - F.col("qc")).cast("double") / (F.col("n") - 1) * 100
            + F.lit(0.5)
        ).cast("long"),
    )
    return base.join(F.broadcast(g), "l_returnflag").select(
        "l_orderkey", "l_linenumber", "l_returnflag", loo.alias("loo_mean_1e4")
    )


_WOE_ORACLE = """
    WITH lab AS (
      SELECT o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    per_cat AS (
      SELECT cat,
             CAST(sum(y) AS BIGINT) AS pos,
             CAST(sum(1 - y) AS BIGINT) AS neg
      FROM lab GROUP BY cat
    ),
    tot AS (
      SELECT CAST(sum(pos) AS BIGINT) AS p_tot, CAST(sum(neg) AS BIGINT) AS n_tot
      FROM per_cat
    )
    SELECT cat, pos, neg,
           round(ln((CAST(pos AS DOUBLE) / p_tot)
                    / (CAST(neg AS DOUBLE) / n_tot)), 6) AS woe,
           round(((CAST(pos AS DOUBLE) / p_tot) - (CAST(neg AS DOUBLE) / n_tot))
                 * ln((CAST(pos AS DOUBLE) / p_tot)
                      / (CAST(neg AS DOUBLE) / n_tot)), 6) AS iv_term
    FROM per_cat CROSS JOIN tot
"""


@register("feat_woe_encode", oracle=_WOE_ORACLE, tags=("features", "agg"))
def feat_woe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence categorical encoding (the credit-scoring
    standard): per category, WOE = ln((pos_c/pos_total)/(neg_c/neg_total))
    with the per-category information-value term (pos_share − neg_share)
    × WOE — summing iv_term gives the feature's IV screening statistic.
    Binary target: order fully fulfilled (status 'F').

    One collapsing aggregate carries pos and neg side by side (the same
    conditional-sum trick as `curate_dsir_weights`' two LMs); totals are
    a 1-row broadcast; the encode table is category-sized and broadcast
    back wherever it is applied. Every fixture category has both classes,
    so no smoothing branch executes — production adds the usual +0.5
    half-count on both shares (one expression change, same plan)."""
    o = load_table(spark, sf_dir, "orders")
    lab = o.select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    per_cat = lab.groupBy("cat").agg(
        F.sum("y").cast("bigint").alias("pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
    )
    tot = per_cat.agg(
        F.sum("pos").cast("bigint").alias("p_tot"),
        F.sum("neg").cast("bigint").alias("n_tot"),
    )
    ps = F.col("pos").cast("double") / F.col("p_tot")
    ns = F.col("neg").cast("double") / F.col("n_tot")
    woe = F.log(ps / ns)
    return per_cat.crossJoin(F.broadcast(tot)).select(
        "cat",
        "pos",
        "neg",
        F.round(woe, 6).alias("woe"),
        F.round((ps - ns) * woe, 6).alias("iv_term"),
    )
