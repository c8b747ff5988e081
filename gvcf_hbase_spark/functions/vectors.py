"""Vector math over ``array<float/double>`` columns.

Two tiers:

- Column expressions (``dot`` / ``norm`` / ``cosine``) built from
  F.zip_with / F.aggregate — JVM-side, fine for a handful of rows, but
  higher-order-function lambdas are *interpreted per element*, which
  measured ~1000× slower than BLAS on all-pairs workloads.
- The hot path: :func:`corpus_broadcast` ships the whole (id, L2-normalized
  matrix) corpus to executors once; scorers in operators/similarity.py then
  run numpy matmuls inside Arrow-batched ``mapInPandas``. At 64-dim doubles
  this broadcast stays practical to ~10^7 vectors (~5 GB); beyond that the
  LSH/IVF bucket-join path in operators/similarity.py is the design.

Similarity queries round scores to 6dp before thresholding/ranking so both
engines make identical keep/rank decisions (SURVEY §5.4).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def corpus_broadcast(
    e: DataFrame, id_col: str = "vec_id", vec_col: str = "emb", normalize: bool = True
):
    """Collect ``(ids int64[n], L2-normalized float64[n, d])`` to the driver
    and broadcast to executors. Row dot products of the normalized matrix
    ARE cosines. One driver collect + one broadcast per query — the
    standard Spark shape for brute-force vector search where the corpus
    fits in executor memory. ``normalize=False`` keeps raw magnitudes
    (inner-product / MIPS scoring instead of cosine).

    Contract: call ONLY behind a size guard (operators/similarity.py's
    ``_fits_broadcast``, file-listing bytes vs the broadcast ceiling) —
    every registered operator dispatches to the blocked/bucketed
    broadcast-free strategies beyond it, so no plan can reach this
    collect with an unbounded corpus."""
    pdf = e.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype="int64")
    m = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
    if normalize:
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
    return e.sparkSession.sparkContext.broadcast((ids, m))
