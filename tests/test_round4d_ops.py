"""Semantic micro-tests for the round-4 widening batch (geo density /
trajectory, RFM quintiles, per-node clustering coefficient, mean-shift
changepoint, M4 downsample, PMI collocations, JL sign projection). Oracle
hash comparison runs in test_queries.py; these pin the closed-form
behaviors a hash match alone wouldn't localize.
"""

from __future__ import annotations

import math

import numpy as np

from tests.conftest import SF_DIR
from gvcf_hbase_spark.registry import load_all

SPECS = load_all()


def test_geo_cell_density_partitions_all_points(spark):
    """Cells tile the plane: every customer lands in exactly one cell,
    and each centroid lies inside its cell's integer bounds."""
    rows = SPECS["geo_cell_density"].fn(spark, SF_DIR).collect()
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(r.n_points for r in rows) == n_cust
    for r in rows:
        cy, cx = divmod(r.cell_id, 100)
        assert cy * 200 <= r.centroid_lat_1e2 <= (cy + 1) * 200
        assert cx * 200 <= r.centroid_lon_1e2 <= (cx + 1) * 200


def test_geo_trajectory_hops_count(spark):
    """n_hops is exactly per-user event count − 1, and the longest hop
    bounds the mean hop (path/n ≤ max)."""
    rows = SPECS["geo_trajectory_length"].fn(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    counts = {r.user_id: r.n for r in ev.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}
    assert rows
    for r in rows:
        assert r.n_hops == counts[r.user_id] - 1
        assert r.max_hop_1e6 * r.n_hops >= r.path_km_1e6


def test_rfm_scores_are_balanced_quintiles(spark):
    """Every score is in 1..5, the segment code recomposes, and ntile
    balance holds (tile sizes differ by at most 1 per dimension)."""
    rows = SPECS["analytics_rfm_segment"].fn(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    for dim in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            v = getattr(r, dim)
            assert 1 <= v <= 5
            sizes[v] = sizes.get(v, 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1
    for r in rows:
        assert r.rfm_segment == r.r_score * 100 + r.f_score * 10 + r.m_score


def test_clustering_coefficient_bounds(spark):
    """0 ≤ coefficient ≤ 1 and triangles never exceed C(d, 2)."""
    rows = SPECS["graph_clustering_coefficient"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.d >= 2
        assert 0 <= r.n_triangles <= r.d * (r.d - 1) // 2
        assert 0 <= r.clustering_1e6 <= 1_000_000


def test_changepoint_score_is_the_argmax(spark):
    """The reported split beats (or ties, with the earlier-hour
    tiebreak) every other candidate — recomputed in numpy from the
    hourly series of one event type."""
    res = {r.event_type: r for r in SPECS["ts_changepoint_meanshift"].fn(spark, SF_DIR).collect()}
    assert res
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    import pyspark.sql.functions as F

    etype = sorted(res)[0]
    hourly = (
        ev.filter(F.col("event_type") == etype)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .count()
        .orderBy("h")
        .collect()
    )
    c = np.array([r["count"] for r in hourly], dtype=np.int64)
    n, S = len(c), int(c.sum())
    L = np.cumsum(c)
    best = None
    for i in range(1, n):
        d = int(L[i - 1]) * n - S * i
        score = math.floor((float(d) * float(d)) / (float(n) * i * (n - i)) * 1e6 + 0.5)
        if best is None or score > best[0]:
            best = (score, i)
    assert res[etype].score_1e6 == best[0]
    assert res[etype].split_i == best[1]


def test_m4_points_order(spark):
    """min ≤ first/last ≤ max per bucket, and the first/last timestamps
    bracket the extremes' timestamps."""
    rows = SPECS["ts_downsample_m4"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.min_v_cents <= r.first_v_cents <= r.max_v_cents
        assert r.min_v_cents <= r.last_v_cents <= r.max_v_cents
        assert r.first_t_us <= r.min_t_us <= r.last_t_us
        assert r.first_t_us <= r.max_t_us <= r.last_t_us


def test_pmi_closed_form(spark):
    """PMI recomposes from the emitted counts (one float expr, 1e-6
    grid) and the support floor held."""
    rows = SPECS["text_collocations_pmi"].fn(spark, SF_DIR).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    toks = [d.text.lower().split(" ") for d in docs]
    nu = sum(len(t) for t in toks)
    nb = sum(len(t) - 1 for t in toks if len(t) >= 2)
    for r in rows[:50]:
        assert r.n_pair >= 5
        pmi = math.log((r.n_pair / nb) / ((r.c1 / nu) * (r.c2 / nu)))
        assert abs(r.pmi_1e6 - math.floor(pmi * 1e6 + 0.5)) <= 1

def test_rp_projection_matches_numpy(spark):
    """Each of the 16 components is the exact signed int sum of the
    1e-6-quantized embedding — recomputed in numpy for 5 vectors."""
    from gvcf_hbase_spark.operators.similarity import _RP_SIGNS

    df = SPECS["sim_rp_projection"].fn(spark, SF_DIR)
    got = {(r.vec_id, r.dim_j): r.y_1e6 for r in df.filter("vec_id < 5").collect()}
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter("vec_id < 5").collect()
    }
    assert len(got) == 16 * len(emb)
    for vid, vec in emb.items():
        q = [math.floor(float(x) * 1e6 + 0.5) for x in vec]
        for j in range(16):
            assert got[(vid, j)] == sum(s * v for s, v in zip(_RP_SIGNS[j], q))


def test_rp_projection_plan_has_no_exchange(spark):
    """The JL transform is scan → project → explode: zero shuffles."""
    from tests.test_plans import explain_str

    plan = explain_str(SPECS["sim_rp_projection"].fn(spark, SF_DIR))
    assert "Exchange" not in plan, plan


def test_m4_plan_is_single_aggregate_exchange(spark):
    """M4 is ONE map-side-combining hash aggregate: exactly one
    exchange (the group key), no Sort, no Window."""
    from tests.test_plans import explain_str

    plan = explain_str(SPECS["ts_downsample_m4"].fn(spark, SF_DIR))
    assert plan.count("Exchange") <= 2  # tree + detail header line
    assert "Window" not in plan
