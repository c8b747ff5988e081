"""Property-based + invariant tests (SURVEY §5.3): the statistical and
algebraic properties the operator implementations promise, checked beyond
the single-fixture oracle comparisons.

The hypothesis tests run the production minhash constants (dedup._MINHASH_A
/_B/_P) through a numpy re-execution over arbitrary shingle-hash sets —
fast enough for many examples. Spark-level invariants (idempotence, top-k
shape, split stability) run once per property on the sf0.01 fixture.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from gvcf_hbase_spark.operators.dedup import (
    _MINHASH_A,
    _MINHASH_B,
    _P,
    minhash_premix_np,
)
from gvcf_hbase_spark.registry import load_all
from gvcf_hbase_spark.sources.tables import load_table
from tests.conftest import SF_DIR

SPECS = load_all()

_A = np.array(_MINHASH_A, dtype=np.uint64)
_B = np.array(_MINHASH_B, dtype=np.uint64)


def _sig(hashes: set[int]) -> np.ndarray:
    h = minhash_premix_np(np.array(sorted(hashes), dtype=np.uint64))[:, None]
    return ((_A[None, :] * h + _B[None, :]) % np.uint64(_P)).min(axis=0)


hash_sets = st.sets(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=60)


@given(hash_sets)
@settings(max_examples=200, deadline=None)
def test_minhash_identical_sets_estimate_one(s):
    """J(A, A) = 1 must be estimated exactly (same permutations, same min)."""
    assert (_sig(s) == _sig(set(s))).all()


@given(hash_sets, hash_sets)
@settings(max_examples=200, deadline=None)
def test_minhash_estimate_tracks_jaccard(a, b):
    """P(minhash collision) = J(A,B); with 32 permutations the estimator's
    std is sqrt(J(1-J)/32) <= 0.089, so a 6-sigma band never flakes while
    still catching a broken permutation family (which decorrelates the
    estimate entirely)."""
    est = float((_sig(a) == _sig(b)).mean())
    exact = len(a & b) / len(a | b)
    assert abs(est - exact) <= 0.55
    if a == b:
        assert est == 1.0


@given(hash_sets, hash_sets, hash_sets)
@settings(max_examples=100, deadline=None)
def test_minhash_signature_of_union_is_elementwise_min(a, b, c):
    """sig(A ∪ B) = min(sig(A), sig(B)) — the mergeability property that
    lets signatures build map-side (partial min-agg) in any partitioning."""
    del c  # reserved: keeps the strategy cache warm across the suite
    u = _sig(a | b)
    assert (u == np.minimum(_sig(a), _sig(b))).all()


def test_dedup_exact_idempotent(spark):
    """dedup(dedup(X)) = dedup(X): applying the fingerprint-keep-min rule
    to its own survivors keeps every row (all fingerprints now unique)."""
    out = SPECS["dedup_exact"].fn(spark, SF_DIR).cache()
    n1 = out.count()
    again = (
        out.groupBy("fingerprint")
        .agg(F.min("keep_id").alias("keep_id"), F.count("*").alias("n"))
    )
    assert again.count() == n1
    assert again.filter(F.col("n") > 1).count() == 0
    out.unpersist()


def test_knn_topk_shape_invariants(spark):
    """Per query vector: no self-neighbor, exactly k rows (corpus >> k),
    contiguous ranks 1..k, and scores non-increasing in rank."""
    out = SPECS["sim_knn_topk"].fn(spark, SF_DIR).cache()
    assert out.filter(F.col("vec_id") == F.col("neighbor_id")).count() == 0
    per = out.groupBy("vec_id").agg(
        F.count("*").alias("n"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
    )
    k = per.agg(F.max("n")).first()[0]
    bad = per.filter((F.col("n") != k) | (F.col("lo") != 1) | (F.col("hi") != k))
    assert bad.count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy("rn")
    drops = out.withColumn("prev", F.lag("cos_sim").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("cos_sim") > F.col("prev") + 1e-9)
    )
    assert drops.count() == 0
    out.unpersist()


def test_hash_split_stable_under_subset(spark):
    """A doc's train/val assignment must not depend on what else is in the
    corpus (the property randomSplit lacks): splitting half the corpus
    assigns every common doc identically to splitting all of it."""
    full = SPECS["curate_hash_split"].fn(spark, SF_DIR)
    d = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") % 2 == 0)
    half = (
        d.select("doc_id")
        .join(full, "doc_id")
        .withColumnRenamed("split", "split_half")
    )
    diff = half.join(full, "doc_id").filter(F.col("split") != F.col("split_half"))
    assert diff.count() == 0


def test_topk_group_ranks_contiguous(spark):
    """win_topk_group: every group's ranks are exactly 1..n with n <= k."""
    out = SPECS["win_topk_group"].fn(spark, SF_DIR)
    rank_col = next(c for c in out.columns if c in ("rn", "rank", "rnk"))
    per = out.groupBy(out.columns[0]).agg(
        F.count("*").alias("n"), F.min(rank_col).alias("lo"), F.max(rank_col).alias("hi")
    )
    assert per.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0
