"""Semantic micro-tests for the round-4 widening batch (geo density /
trajectory, RFM quintiles, per-node clustering coefficient, mean-shift
changepoint, M4 downsample, PMI collocations, JL sign projection). Oracle
hash comparison runs in test_queries.py; these pin the closed-form
behaviors a hash match alone wouldn't localize.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

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

@pytest.mark.mirror  # slow e2e (r10: default-suite budget; runs in the -m mirror tier)
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


def test_hwe_chi2_closed_form(spark):
    """χ² recomposes from the emitted genotype counts (numpy), and only
    polymorphic sites are reported."""
    rows = SPECS["gvcf_hwe_chi2"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows[:200]:
        ac, an = r.n_ra + 2 * r.n_aa, 2 * (r.n_rr + r.n_ra + r.n_aa)
        assert 0 < ac < an
        n = r.n_rr + r.n_ra + r.n_aa
        p = (2 * r.n_rr + r.n_ra) / (2 * n)
        e = [n * p * p, 2 * n * p * (1 - p), n * (1 - p) * (1 - p)]
        o = [r.n_rr, r.n_ra, r.n_aa]
        chi2 = sum((oi - ei) ** 2 / ei for oi, ei in zip(o, e))
        assert abs(r.hwe_chi2_1e6 - math.floor(chi2 * 1e6 + 0.5)) <= 1


def test_concordance_pairs_complete(spark):
    """All C(4,2)=6 sample pairs appear (every sample covers every site
    in the cohort grid), ordered, with sane ratios."""
    rows = SPECS["gvcf_genotype_concordance"].fn(spark, SF_DIR).collect()
    pairs = {(r.sample_a, r.sample_b) for r in rows}
    assert pairs == {(f"s{i}", f"s{j}") for i in range(4) for j in range(i + 1, 4)}
    for r in rows:
        assert 0 <= r.n_match <= r.n_sites
        assert 0 <= r.concordance_1e6 <= 1_000_000


def test_mendelian_brute_force(spark):
    """The violation count matches a Python recomputation of the trio
    rule from the cohort dosage grid, recomputed from the closed-form
    dosage function (k*(s+3) + 7s) mod 6."""
    res = {r.contig: r for r in SPECS["gvcf_mendelian_violations"].fn(spark, SF_DIR).collect()}
    ks = [r.o_orderkey for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey").collect()]
    dosage = {}
    for k in ks:
        for s_ in range(4):
            m = (k * (s_ + 3) + s_ * 7) % 6
            dosage.setdefault((f"chr{1 + k % 2}", k), {})[f"s{s_}"] = 0 if m < 3 else (1 if m < 5 else 2)
    expected = {}
    for (contig, _pos), by_sample in dosage.items():
        if not {"s0", "s1", "s2"} <= by_sample.keys():
            continue
        f, m, c = by_sample["s0"], by_sample["s1"], by_sample["s2"]
        lo = (1 if f == 2 else 0) + (1 if m == 2 else 0)
        hi = (1 if f >= 1 else 0) + (1 if m >= 1 else 0)
        n, v = expected.get(contig, (0, 0))
        expected[contig] = (n + 1, v + (0 if lo <= c <= hi else 1))
    assert set(expected) == set(res)
    for contig, (n, v) in expected.items():
        assert res[contig].n_trio_sites == n
        assert res[contig].n_violations == v


def test_kmeans_step_matches_numpy(spark):
    """Assignment and update recomputed in numpy from the quantized
    embeddings and the literal centroid grid."""
    from gvcf_hbase_spark.operators.similarity import _KM_CENTROIDS_1E6

    rows = SPECS["sim_kmeans_step"].fn(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    cent = np.array(_KM_CENTROIDS_1E6, dtype=np.int64)
    sums = {}
    for r in emb:
        q = np.array([math.floor(float(x) * 1e6 + 0.5) for x in r.embedding], dtype=np.int64)
        d2 = ((q[None, :] - cent) ** 2).sum(axis=1)
        c = int(np.argmin(d2))  # np.argmin takes the first min = smallest c
        n, s = sums.get(c, (0, np.zeros(64, dtype=np.int64)))
        sums[c] = (n + 1, s + q)
    got = {(r.centroid, r.dim_i): r for r in rows}
    assert len(got) == sum(64 for _ in sums)
    for c, (n, s) in sums.items():
        for i in range(64):
            r = got[(c, i)]
            assert r.n_members == n
            assert r.sum_1e6 == s[i]
            assert r.mean_1e6 == math.floor(s[i] / n + 0.5)


def test_ols_multi_matches_numpy_lstsq(spark):
    """Coefficients agree with numpy's least-squares solve on the same
    quantized design matrix (to the 1e-6 grid), and R² ∈ [0, 1]."""
    row = SPECS["analytics_ols_multi"].fn(spark, SF_DIR).collect()[0]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    x1 = np.array([round(r.l_quantity) for r in li], dtype=np.float64)
    x2 = np.array([round(r.l_discount * 100) for r in li], dtype=np.float64)
    y = np.array([round(r.l_extendedprice * 100) for r in li], dtype=np.float64)
    X = np.stack([np.ones_like(x1), x1, x2], axis=1)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row.n == len(li)
    assert abs(row.b1_1e6 / 1e6 - beta[1]) < 1e-3 * max(1, abs(beta[1]))
    assert abs(row.b2_1e6 / 1e6 - beta[2]) < 1e-3 * max(1, abs(beta[2]))
    assert abs(row.b0_1e4 / 1e4 - beta[0]) < 1e-2 * max(1, abs(beta[0]))
    assert 0 <= row.r2_1e6 <= 1_000_000


def test_chunk_dedup_accounting(spark):
    """n_dup = n_chunks − n_distinct and total chunks equal the sum of
    per-doc ceil(len/64)."""
    rows = SPECS["multimodal_chunk_dedup"].fn(spark, SF_DIR).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    expect = {}
    for d in docs:
        n = len(d.text.encode())
        if n:
            expect[d.source] = expect.get(d.source, 0) + -(-n // 64)
    got = {r.source: r for r in rows}
    assert set(got) == set(expect)
    for src, r in got.items():
        assert r.n_chunks == expect[src]
        assert r.n_dup == r.n_chunks - r.n_distinct
        assert 0 <= r.dup_ratio_1e6 <= 1_000_000


def test_cuped_reduces_variance_direction(spark):
    """ρ² ∈ [0, 1]; both cohorts present; adjusted means move toward
    each other no more than the raw gap allows when ρ² > 0 (sanity, not
    a theorem: CUPED preserves the expected treatment effect, so the
    adjusted gap should be within 50% of the raw gap on this fixture)."""
    rows = {r.cohort: r for r in SPECS["analytics_cuped"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    r0, r1 = rows[0], rows[1]
    assert 0 <= r0.rho2_1e6 <= 1_000_000
    assert r0.rho2_1e6 == r1.rho2_1e6
    raw_gap = abs(r0.mean_post_1e4 - r1.mean_post_1e4)
    adj_gap = abs(r0.mean_adj_1e4 - r1.mean_adj_1e4)
    assert adj_gap <= 2 * raw_gap + 100


def test_path_topk_sessions_brute_force(spark):
    """The top-1 path's count matches a Python sessionization of the
    raw log with the same 30-min gap rule."""
    rows = SPECS["analytics_path_topk"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    assert all(rows[i].n_sessions >= rows[i + 1].n_sessions for i in range(len(rows) - 1))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    from collections import Counter

    paths = Counter()
    for recs in by_user.values():
        recs.sort(key=lambda r: (r.ts, r.event_id))
        cur, last_us = [], None
        for r in recs:
            us = int(r.ts.timestamp() * 1e6) if hasattr(r.ts, "timestamp") else r.ts
            if last_us is not None and us - last_us > 1_800_000_000:
                paths[">".join(cur)] += 1
                cur = []
            cur.append(r.event_type)
            last_us = us
        if cur:
            paths[">".join(cur)] += 1
    top = rows[0]
    assert paths[top.path] == top.n_sessions
    assert top.n_sessions == max(paths.values())


def test_kcore_is_a_fixpoint_and_degrees_hold(spark):
    """Every survivor has in-core degree >= k, and one MORE peel round
    in Python changes nothing (the unroll reached the fixpoint)."""
    import duckdb

    rows = SPECS["graph_kcore_bounded"].fn(spark, SF_DIR).collect()
    assert rows
    core = {r.node for r in rows}
    got_deg = {r.node: r.core_degree for r in rows}
    con = duckdb.connect()
    edges = con.execute(f"""
        WITH e0 AS (SELECT DISTINCT l_partkey p, l_suppkey s
                    FROM '{SF_DIR}/lineitem.parquet'),
        pdeg AS (SELECT p, count(*) d FROM e0 GROUP BY p),
        kept AS (SELECT e0.p, e0.s FROM e0 JOIN pdeg USING (p) WHERE pdeg.d <= 50)
        SELECT DISTINCT least(a.s, b.s), greatest(a.s, b.s)
        FROM kept a JOIN kept b USING (p) WHERE a.s < b.s
    """).fetchall()
    deg = {}
    for u, v in edges:
        if u in core and v in core:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
    assert all(d >= 3 for d in deg.values())
    assert {n for n, d in deg.items() if d >= 3} == core
    assert deg == got_deg


def test_mtd_resets_at_month_boundary(spark):
    """Rank-1 days carry mtd == that day's revenue; MTD and YTD are
    non-decreasing within their calendar scopes."""
    rows = SPECS["win_mtd_ytd"].fn(spark, SF_DIR).collect()
    assert rows
    by_series = {}
    for r in rows:
        if r.day_of_month_rank == 1:
            assert r.mtd_cents == r.rev_cents
        by_series.setdefault((r.event_type, r.day.year), []).append(r)
    for (_, _), rs in by_series.items():
        rs.sort(key=lambda r: r.day)
        for a, b in zip(rs, rs[1:]):
            assert b.ytd_cents == a.ytd_cents + b.rev_cents


def test_pk_fk_probe_truths(spark):
    """TPC-H referential facts: lineitem→orders containment is total and
    non-unique; orders.o_orderkey is unique; every probe's matched set
    is bounded by the distinct set."""
    rows = {r.probe: r for r in SPECS["profile_pk_fk_inference"].fn(spark, SF_DIR).collect()}
    li = rows["lineitem.l_orderkey->orders.o_orderkey"]
    assert li.containment_1e6 == 1_000_000 and not li.child_unique
    oo = rows["orders.o_orderkey->lineitem.l_orderkey"]
    assert oo.child_unique
    for r in rows.values():
        assert r.matched_distinct <= r.child_distinct <= r.child_rows


def test_cidr_ranges_and_counts(spark):
    """Every matched IP sits inside its subnet's range (recomputed from
    the Knuth hash over the distinct user set), and counts agree."""
    rows = {r.cidr_id: r for r in SPECS["fn_cidr_match"].fn(spark, SF_DIR).collect()}
    users = {
        r.user_id
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet").select("user_id").distinct().collect()
    }
    from collections import Counter

    expect = Counter()
    for u in users:
        ip = (u * 2654435761) % 2**32
        for j in range(8):
            net, bits = j << 28, 4 + j
            if net <= ip < net + (1 << (32 - bits)):
                expect[j] += 1
    assert {j: r.n_matched for j, r in rows.items()} == dict(expect)
    for j, r in rows.items():
        net, bits = j << 28, 4 + j
        assert net <= r.min_ip <= r.max_ip < net + (1 << (32 - bits))
        assert r.min_ip_dotted == ".".join(
            str((r.min_ip >> sh) & 255) for sh in (24, 16, 8, 0)
        )


def test_roh_runs_are_maximal(spark):
    """Runs recomputed from the closed-form dosage rule: every reported
    run is homozygous throughout and flanked by het/absent sites."""
    rows = SPECS["gvcf_roh_runs"].fn(spark, SF_DIR).collect()
    assert rows
    ks = sorted(
        r.o_orderkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey").collect()
    )
    def hom(k, s):
        return (k * k + k * (s + 3) + s * 7) % 7 < 5

    by_contig = {1: [k for k in ks if k % 2 == 0], 2: [k for k in ks if k % 2 == 1]}
    expected = set()
    for s in range(4):
        for c, positions in by_contig.items():
            run = []
            for k in positions + [None]:
                if k is not None and hom(k, s):
                    run.append(k)
                else:
                    if len(run) >= 5:
                        expected.add((f"s{s}", f"chr{c}", run[0], run[-1], len(run)))
                    run = []
    got = {(r.sample_id, r.contig, r.start_pos, r.end_pos, r.n_sites) for r in rows}
    assert got == expected


def _shape(spark, key):
    from tests.test_plans import explain_str

    plan = explain_str(SPECS[key].fn(spark, SF_DIR))
    return (
        plan.count("Exchange ("),
        plan.count("Window ("),
        plan.count("BroadcastNestedLoopJoin"),
    )


def test_new_op_plan_shapes(spark):
    """Pin the 100 TB-relevant physical shapes of the widening batch:
    the trajectory op's SINGLE user exchange (window + agg share it),
    OLS's one-exchange scan→partial→final, the CIDR broadcast range
    join (no fact shuffle), and the window-op exchange budgets."""
    ex, win, _ = _shape(spark, "geo_trajectory_length")
    assert ex == 1 and win == 1
    ex, win, _ = _shape(spark, "analytics_ols_multi")
    assert ex == 1 and win == 0
    ex, _, bnlj = _shape(spark, "fn_cidr_match")
    assert bnlj >= 1 and ex <= 3  # dim broadcasts; only agg exchanges remain
    ex, win, _ = _shape(spark, "win_mtd_ytd")
    assert ex <= 3 and win == 2
    ex, win, _ = _shape(spark, "gvcf_roh_runs")
    assert ex <= 2 and win == 2  # both row_numbers share the partition key
    ex, win, _ = _shape(spark, "multimodal_chunk_dedup")
    assert ex == 2 and win == 0  # per-hash agg + per-source rollup


def test_funnel_summary_consistent_with_detail(spark):
    """Stage counts equal the per-user detail op's stage tallies, and
    counts are monotone down the funnel."""
    summary = {r.stage: r for r in SPECS["analytics_funnel_summary"].fn(spark, SF_DIR).collect()}
    detail = SPECS["funnel_time_window"].fn(spark, SF_DIR).collect()
    assert summary[0].n_users == len(detail)
    assert summary[1].n_users == sum(1 for r in detail if r.funnel_stage >= 1)
    assert summary[2].n_users == sum(1 for r in detail if r.funnel_stage >= 2)
    assert summary[3].n_users == sum(1 for r in detail if r.funnel_stage >= 3)
    assert summary[0].n_users >= summary[1].n_users >= summary[2].n_users >= summary[3].n_users
    assert summary[0].pct_of_all_1e6 == 1_000_000


def test_dataset_card_shares_sum_to_one(spark):
    """Token shares sum to ~1e6 (rounding) and masses recompose."""
    rows = SPECS["curate_dataset_card"].fn(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.token_share_1e6 for r in rows) - 1_000_000) <= len(rows)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.min_tokens <= r.max_tokens
        assert r.min_tokens * r.n_docs <= r.total_tokens <= r.max_tokens * r.n_docs
