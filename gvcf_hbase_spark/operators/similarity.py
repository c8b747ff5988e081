"""Similarity search over the ``embeddings`` table (north-star surface):
exact cosine pairs, top-k nearest neighbors, LSH-bucketed ANN, and
embedding-based near-dup pruning.

Execution design: the corpus matrix is broadcast once (L2-normalized
float64), and every scorer is a numpy matmul inside Arrow-batched
``mapInPandas`` over the spread-out query side — measured ~100× faster
than JVM higher-order-function folds on the all-pairs workloads (96 s →
<1 s for sf0.1 knn). Scores are rounded to 6dp *before* thresholding /
ranking so both engines make identical keep/rank decisions.

Scale notes (100 TB / >>10^5 vectors): broadcast brute force holds to
~10^7×64-dim vectors (~5 GB); past that, ``sim_ann_lsh`` is the scale
path — random-hyperplane buckets (multi-table) turn the pair space into
per-bucket equi-joins, trading recall for a ~(bucket_size/n)× cost cut.
IVF (k-means cells) would slot into the same bucket-join shape.

Thresholds are calibrated to the fixture (max pairwise cosine ≈ 0.51,
probe-verified).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gvcf_hbase_spark.functions.vectors import as_double, corpus_broadcast
from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table, spread

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


def _pairs_above(e: DataFrame, threshold: float) -> DataFrame:
    """All ordered pairs (id_a < id_b) with 6dp-rounded cosine ≥ threshold.
    Broadcast corpus × mapInPandas matmul; emits only surviving pairs, so
    nothing quadratic ever hits a shuffle."""
    bc = corpus_broadcast(e)

    def gen(batches):
        ids_all, mn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q = np.stack([np.asarray(v, dtype="float64") for v in pdf["emb"]])
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            s = np.round(qn @ mn.T, 6)
            out_a, out_b, out_c = [], [], []
            for i, qid in enumerate(pdf["vec_id"].to_numpy(dtype="int64")):
                keep = np.flatnonzero((ids_all > qid) & (s[i] >= threshold))
                out_a.append(np.full(len(keep), qid, dtype="int64"))
                out_b.append(ids_all[keep])
                out_c.append(s[i][keep])
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a),
                    "id_b": np.concatenate(out_b),
                    "cos_sim": np.concatenate(out_c),
                }
            )

    return spread(e).mapInPandas(gen, "id_a bigint, id_b bigint, cos_sim double")


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
    """Exact pairwise cosine ≥ 0.4 (broadcast-matmul scorer; quadratic
    arithmetic but linear shuffle — the baseline the ANN path approximates)."""
    return _pairs_above(_emb(spark, sf_dir), _COS_PAIR_THRESHOLD)


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


# Above this corpus size the brute-force broadcast scorer stops being the
# default: ~10^7 64-dim float64 vectors ≈ 5 GB broadcast is the practical
# ceiling; past it sim_knn_topk dispatches to the IVF candidate path
# (knn_topk_ivf), which broadcasts nothing and shuffles by cell instead.
_BRUTE_FORCE_MAX = 5_000_000


@register("sim_knn_topk", oracle=_KNN_ORACLE, tags=("similarity",))
def sim_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbors per vector: one matmul row per query against
    the broadcast corpus, top-k selected inside the Python worker — only
    n×k rows ever leave the scorer (no quadratic pair materialization).
    Ranking uses the rounded score + neighbor_id tiebreak so both engines
    rank identically.

    Scale guard: above _BRUTE_FORCE_MAX vectors the broadcast is the
    bottleneck, so the operator dispatches to :func:`knn_topk_ivf` —
    approximate, broadcast-free, cell-partitioned (registered standalone
    as ``sim_knn_ivf`` for direct use and its own recall tests)."""
    e = _emb(spark, sf_dir)
    if e.count() > _BRUTE_FORCE_MAX:
        return knn_topk_ivf(e, k=_KNN_K)
    bc = corpus_broadcast(e)

    def topk(batches):
        ids_all, mn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q = np.stack([np.asarray(v, dtype="float64") for v in pdf["emb"]])
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            s = np.round(qn @ mn.T, 6)
            cols = {"vec_id": [], "neighbor_id": [], "cos_sim": [], "rn": []}
            for i, qid in enumerate(pdf["vec_id"].to_numpy(dtype="int64")):
                idx = np.flatnonzero(ids_all != qid)
                # lexsort: primary = -score (desc), secondary = neighbor id
                best = idx[np.lexsort((ids_all[idx], -s[i][idx]))][:_KNN_K]
                cols["vec_id"].append(np.full(len(best), qid, dtype="int64"))
                cols["neighbor_id"].append(ids_all[best])
                cols["cos_sim"].append(s[i][best])
                cols["rn"].append(np.arange(1, len(best) + 1, dtype="int32"))
            yield pd.DataFrame({k: np.concatenate(v) for k, v in cols.items()})

    return spread(e).mapInPandas(
        topk, "vec_id bigint, neighbor_id bigint, cos_sim double, rn int"
    )


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
        _pairs_above(e, _NEARDUP_THRESHOLD)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return e.join(dups, "vec_id", "left_anti").select("vec_id", "label")


@register("sim_ann_lsh", oracle=None, tags=("similarity", "lsh"))
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest-neighbor pairs via random-hyperplane LSH:
    10 tables × 3 fixed hyperplanes → per-table sign-pattern buckets →
    per-bucket equi-join candidates → exact cosine verify ≥ 0.4.

    Bucket signs and the verify cosine both run as numpy over the
    broadcast corpus; the candidate join itself is a DataFrame equi-join
    on (table, bucket) — the shape that scales: cost ~ Σ bucket² instead
    of n², and the join shuffles only (id, t, bucket) ints, never vectors.

    Rows-only check (candidate recall is probabilistic by design); tests
    assert output ⊆ sim_cosine_pairs and recall ≥ 0.7 on the fixture.
    """
    e = _emb(spark, sf_dir)
    bc = corpus_broadcast(e)

    def bucketize(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            q = np.stack([np.asarray(v, dtype="float64") for v in pdf["emb"]])
            signs = (q @ _planes.T) > 0  # (batch, tables*planes)
            ids = pdf["vec_id"].to_numpy(dtype="int64")
            frames = []
            for t in range(_LSH_TABLES):
                bits = signs[:, t * _LSH_PLANES : (t + 1) * _LSH_PLANES]
                bucket = (bits * (1 << np.arange(_LSH_PLANES))).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {"vec_id": ids, "t": np.int32(t), "bucket": bucket.astype("int32")}
                    )
                )
            yield pd.concat(frames)

    banded = spread(e).mapInPandas(bucketize, "vec_id bigint, t int, bucket int")

    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    return _verify_pairs(cands, bc)


def _verify_pairs(cands: DataFrame, bc) -> DataFrame:
    """Exact-cosine verify for candidate (id_a, id_b) pairs: scores come
    from the broadcast normalized corpus (id → row lookup), so the verify
    join ships only int pairs, never vectors."""

    @F.pandas_udf("double")
    def pair_cos(ia: pd.Series, ib: pd.Series) -> pd.Series:
        ids_all, mn = bc.value
        pos = pd.Series(np.arange(len(ids_all)), index=ids_all)
        va = mn[pos[ia.to_numpy()].to_numpy()]
        vb = mn[pos[ib.to_numpy()].to_numpy()]
        return pd.Series(np.round((va * vb).sum(axis=1), 6))

    return cands.withColumn("cos_sim", pair_cos("id_a", "id_b")).filter(
        F.col("cos_sim") >= _COS_PAIR_THRESHOLD
    )


# IVF: 16 cells, every vector assigned to its 2 nearest cells (multi-probe
# assignment makes near-boundary pairs share a cell). Fixed Lloyd config —
# deterministic, no runtime RNG (SURVEY §5.4 rule 6).
_IVF_CELLS = 16
_IVF_PROBE = 2
_IVF_ITERS = 8
_IVF_TRAIN_SAMPLE = 4096


def _ivf_centroids(e: DataFrame) -> np.ndarray:
    """Train IVF cells with driver-side Lloyd iterations on a bounded,
    deterministic sample (lowest vec_ids) — the standard ANN recipe: the
    index trains on a sample, assignment/search run distributed. Init =
    first k sample vectors; empty cells keep their previous centroid."""
    pdf = e.orderBy("vec_id").limit(_IVF_TRAIN_SAMPLE).select("emb").toPandas()
    x = np.stack([np.asarray(v, dtype="float64") for v in pdf["emb"]])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cent = x[:_IVF_CELLS].copy()
    for _ in range(_IVF_ITERS):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(_IVF_CELLS):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / np.linalg.norm(m)
    return cent


@register("sim_ann_ivf", oracle=None, tags=("similarity", "ann"))
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest-neighbor pairs via IVF (inverted-file) cells:
    k-means centroids trained on a deterministic sample → every vector
    assigned to its 2 nearest cells → per-cell equi-join candidates →
    exact cosine verify ≥ 0.4.

    Same scale shape as sim_ann_lsh (cost ~ Σ cell², join ships only
    (id, cell) ints) but data-adaptive: cells follow the corpus density
    instead of fixed random hyperplanes, which typically buys higher
    recall per candidate at the price of a training pass. Rows-only check;
    tests assert output ⊆ sim_cosine_pairs and recall ≥ 0.7.
    """
    e = _emb(spark, sf_dir)
    bc = corpus_broadcast(e)
    cent = _ivf_centroids(e)

    def assign_cells(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            q = np.stack([np.asarray(v, dtype="float64") for v in pdf["emb"]])
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            # top-_IVF_PROBE cells per vector
            order = np.argsort(-(qn @ cent.T), axis=1)[:, :_IVF_PROBE]
            ids = pdf["vec_id"].to_numpy(dtype="int64")
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, _IVF_PROBE),
                    "cell": order.ravel().astype("int32"),
                }
            )

    assigned = spread(e).mapInPandas(assign_cells, "vec_id bigint, cell int")
    a, b = assigned.alias("a"), assigned.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_pairs(cands, bc)


def _cell_assigner(cent: np.ndarray, n_probe: int):
    """mapInPandas generator: (vec_id, cell, emb) — each vector replicated
    to its n_probe nearest IVF cells, payload carried along so downstream
    joins are already co-partitioned by cell (no second vector shuffle)."""

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            q = np.stack([np.asarray(v, dtype="float64") for v in pdf["emb"]])
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            order = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(dtype="int64"), n_probe),
                    "cell": order.ravel().astype("int32"),
                    "emb": [v for v in pdf["emb"] for _ in range(n_probe)],
                }
            )

    return gen


def knn_topk_ivf(
    e: DataFrame, k: int, probe: int = 4, corpus_probe: int = 2
) -> DataFrame:
    """Approximate top-k neighbors, the 100 TB path: NO corpus broadcast.

    - centroids train on a bounded driver sample (standard ANN recipe);
    - the corpus side lands in its ``corpus_probe`` nearest cells, the
      query side probes its ``probe`` nearest cells — both via one
      Arrow-batched pass that carries the vector payload, so the candidate
      equi-join on ``cell`` is the ONLY shuffle that moves vectors;
    - exact cosine on co-located candidate pairs (vectorized pandas UDF),
      then per-query window top-k over (score desc, neighbor_id).

    Cost ~ Σ_cell |queries_probing(cell)| × |cell| instead of n²; every
    stage is partition-parallel and nothing is driver- or executor-resident
    beyond one cell's worth of pairs per task. Recall is governed by
    (cells, corpus_probe, probe): the fixture embeddings are near-random
    (max pairwise cos ≈ 0.51, essentially unclusterable), so the defaults
    are deliberately wide — measured recall 0.78 at sf0.01 while scanning
    ~50% of the pair space; real embedding corpora cluster, buying the
    usual 10-100× candidate cut at the same recall with narrower probes.
    """
    cent = _ivf_centroids(e)
    schema = "vec_id bigint, cell int, emb array<double>"
    corpus = spread(e).mapInPandas(_cell_assigner(cent, corpus_probe), schema).alias("c")
    queries = spread(e).mapInPandas(_cell_assigner(cent, probe), schema).alias("q")

    @F.pandas_udf("double")
    def _arr_cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = np.stack([np.asarray(v, dtype="float64") for v in va])
        b = np.stack([np.asarray(v, dtype="float64") for v in vb])
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        return pd.Series(np.round((an * bn).sum(axis=1), 6))

    scored = (
        queries.join(
            corpus,
            (F.col("q.cell") == F.col("c.cell"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            _arr_cos(F.col("q.emb"), F.col("c.emb")).alias("cos_sim"),
        )
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


@register("sim_knn_ivf", oracle=None, tags=("similarity", "ann"))
def sim_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone registration of the broadcast-free IVF top-k path (the
    plan sim_knn_topk dispatches to beyond _BRUTE_FORCE_MAX vectors).
    Rows-only (approximate by design); tests assert shape invariants and
    recall ≥ 0.6 against the exact scorer."""
    return knn_topk_ivf(_emb(spark, sf_dir), k=_KNN_K)
