"""Similarity search over the ``embeddings`` table (north-star surface):
exact cosine pairs, top-k nearest neighbors, LSH-bucketed ANN, and
embedding-based near-dup pruning.

Thresholds are calibrated to the fixture (max pairwise cosine ≈ 0.51,
probe-verified), and every score is rounded to 6dp *before* thresholding /
ranking so both engines make identical keep/rank decisions.

Scale notes (100 TB / >>10^5 vectors): the exact operators are quadratic
baselines; ``sim_ann_lsh`` is the scale path — random-hyperplane buckets
(multi-table) turn the pair space into per-bucket equi-joins, trading
recall for a ~(bucket_size/n)× cost cut. IVF (k-means cells) would slot
into the same bucket-join shape.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gvcf_hbase_spark.functions.vectors import as_double, cosine
from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table

_COS_PAIR_THRESHOLD = 0.4
_NEARDUP_THRESHOLD = 0.45
_KNN_K = 5

# Random-hyperplane LSH: 10 tables × 3 planes (fixed seed). For cos≈0.4
# pairs, P(shared bucket in ≥1 table) ≈ 1-(1-0.63^3)^10 ≈ 0.94.
_LSH_TABLES = 10
_LSH_PLANES = 3
_planes = np.random.RandomState(7).normal(size=(_LSH_TABLES * _LSH_PLANES, 64))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", "label", as_double("embedding").alias("emb"))


def _scored_pairs(e: DataFrame) -> DataFrame:
    """All ordered pairs (id_a < id_b) with 6dp-rounded cosine."""
    a = e.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"))
    cos = F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6)
    return a.join(b, F.col("id_a") < F.col("id_b")).select("id_a", "id_b", cos.alias("cos_sim"))


_PAIR_ORACLE = f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= {_COS_PAIR_THRESHOLD}
"""


@register("sim_cosine_pairs", oracle=_PAIR_ORACLE, tags=("similarity",))
def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise cosine ≥ 0.4 (JVM-side zip_with/aggregate dot
    product; quadratic baseline the ANN path approximates)."""
    e = _emb(spark, sf_dir)
    return _scored_pairs(e).filter(F.col("cos_sim") >= _COS_PAIR_THRESHOLD)


_KNN_ORACLE = f"""
    WITH scored AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT vec_id, neighbor_id, cos_sim, rn FROM ranked WHERE rn <= {_KNN_K}
"""


@register("sim_knn_topk", oracle=_KNN_ORACLE, tags=("similarity",))
def sim_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbors per vector: score all ordered pairs, then the
    rank-filter window (win_topk_group pattern). Ranking uses the rounded
    score + neighbor_id tiebreak so both engines rank identically."""
    e = _emb(spark, sf_dir)
    a = e.select(F.col("vec_id"), F.col("emb").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("emb_b"))
    scored = a.join(b, F.col("vec_id") != F.col("neighbor_id")).select(
        "vec_id",
        "neighbor_id",
        F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _KNN_K)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH dup AS (
      SELECT DISTINCT b.vec_id
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 6) >= {_NEARDUP_THRESHOLD}
    )
    SELECT e.vec_id, e.label FROM embeddings e
    WHERE e.vec_id NOT IN (SELECT vec_id FROM dup)
    """,
    tags=("similarity", "dedup"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pruning: drop any vector that has a lower-id
    neighbor with cosine ≥ 0.45; survivors form the deduplicated corpus
    (greedy keep-first — deterministic, order-independent)."""
    e = _emb(spark, sf_dir)
    dups = (
        _scored_pairs(e)
        .filter(F.col("cos_sim") >= _NEARDUP_THRESHOLD)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return e.join(dups, "vec_id", "left_anti").select("vec_id", "label")


@register("sim_ann_lsh", oracle=None, tags=("similarity", "lsh"))
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest-neighbor pairs via random-hyperplane LSH:
    10 tables × 3 fixed hyperplanes → per-table sign-pattern buckets →
    per-bucket equi-join candidates → exact cosine verify ≥ 0.4.

    Rows-only check (candidate recall is probabilistic by design); tests
    assert output ⊆ sim_cosine_pairs and recall ≥ 0.7 on the fixture.
    At 10^8+ vectors this bucket-join shape is the only tractable one —
    cost scales with Σ bucket² instead of n².
    """
    e = _emb(spark, sf_dir)

    def bucket_col(t: int):
        bits = []
        for p in range(_LSH_PLANES):
            plane = _planes[t * _LSH_PLANES + p]
            proj = F.aggregate(
                F.zip_with(
                    F.col("emb"),
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
        b = bits[0]
        for extra in bits[1:]:
            b = b + extra
        return b

    tables = F.array(
        *[F.struct(F.lit(t).alias("t"), bucket_col(t).alias("bucket")) for t in range(_LSH_TABLES)]
    )
    bucketed = e.select("vec_id", "emb", F.explode(tables).alias("tb")).select(
        "vec_id", "emb", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket")
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.emb").alias("emb_a"),
            F.col("b.emb").alias("emb_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6)
    return cands.select("id_a", "id_b", cos.alias("cos_sim")).filter(
        F.col("cos_sim") >= _COS_PAIR_THRESHOLD
    )
