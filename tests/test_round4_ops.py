"""Semantic micro-tests for the round-4 additions: count-min one-sided
error, Bloom no-false-negatives, toxicity/readability closed forms,
exact-integer ACF, k-hop ball size, bounded Bellman-Ford vs a Python
reference, LR-scorer decision boundary, calendar clamping, last-touch
attribution windows, and SemDeDup cluster-local dropping. Oracle hash
comparison runs in test_queries.py; these pin the closed-form behaviors
a hash match alone wouldn't localize.
"""

from __future__ import annotations

import datetime
import math

import numpy as np

from tests.conftest import SF_DIR
from gvcf_hbase_spark.registry import load_all
from tests.test_round3c_ops import _write_documents, _write_events, _write_embeddings

SPECS = load_all()


def test_countmin_one_sided_error(spark):
    """CMS estimates NEVER undercount: est ≥ exact for every probe,
    and the report carries exactly the 25 hottest keys."""
    rows = SPECS["agg_countmin_freq"].fn(spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.est_cnt >= r.exact_cnt
        assert r.overcount == r.est_cnt - r.exact_cnt


def test_bloom_no_false_negatives(spark):
    """Bloom membership is one-sided: every true member tests positive;
    false_positive is exactly in_bloom ∧ ¬in_truth."""
    rows = SPECS["agg_bloom_membership"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.in_truth:
            assert r.in_bloom, f"false negative at {r.c_custkey}"
        assert r.false_positive == (r.in_bloom and not r.in_truth)


def test_toxicity_ratio_and_flag(spark, tmp_path):
    sf = _write_documents(
        spark, tmp_path,
        [
            ("slow slow fast", "en", "s"),       # 2/3 hits -> flagged
            ("fast join merge scan", "en", "s"),  # 0 hits
            ("dup " + "ok " * 19, "en", "s"),     # 1/20 = 0.05 < 0.10
        ],
    )
    out = {r.doc_id: r for r in SPECS["text_toxicity_wordlist"].fn(spark, sf).collect()}
    assert out[0].n_hits == 2 and out[0].flagged
    assert round(out[0].tox_ratio, 6) == round(2 / 3, 6)
    assert out[1].n_hits == 0 and not out[1].flagged
    assert out[2].n_hits == 1 and not out[2].flagged


def test_readability_closed_form(spark, tmp_path):
    """'go on up': 3 words, 3 vowel groups, no terminator -> 1 sentence.
    flesch = 206.835 - 1.015*3 - 84.6*1."""
    sf = _write_documents(spark, tmp_path, [("go on up", "en", "s")])
    r = SPECS["text_readability"].fn(spark, sf).collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 1, 3)
    assert r.flesch == round(206.835 - 1.015 * 3 - 84.6 * 1, 4)


def test_autocorr_alternating_series(spark, tmp_path):
    """x = +1,-1,... (n=8): mean 0, acf_k = ±(n-k)/n exactly."""
    sf = _write_events(
        spark, tmp_path, [(i, i, 1, "a", 1.0 if i % 2 == 0 else -1.0) for i in range(8)]
    )
    r = SPECS["ts_autocorr"].fn(spark, sf).collect()[0]
    assert r.n == 8
    assert r.acf1_1e6 == -875_000
    assert r.acf2_1e6 == 750_000
    assert r.acf3_1e6 == -625_000


def test_khop_ball_size_on_ring_with_chords(spark):
    """Ring + distance-2 chords: every node reaches exactly offsets
    −6..+6 in ≤3 hops → ball size 13 for every seed (seeds are ≥97
    apart on a ≥28-node cycle, so balls never truncate)."""
    rows = SPECS["graph_khop_reach"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_reached == 13


def test_sssp_matches_python_bellman_ford(spark):
    """3-round min-plus vs an independent dict-based Bellman-Ford over
    the same deterministic edge construction."""
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM '{SF_DIR}/customer.parquet'").fetchone()[0]
    edges = set()
    for i in range(n):
        for dst in [(i + 1) % n, i // 2]:
            if i != dst:
                edges.add((i, dst, (i + dst) % 7 + 1))
    dist = {0: 0}
    for _ in range(3):
        new = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < new.get(d, math.inf):
                new[d] = dist[s] + w
        dist = new
    out = {r.node: r.dist for r in SPECS["graph_sssp_bounded"].fn(spark, SF_DIR).collect()}
    assert out == dist


def test_quality_score_lr_boundary(spark, tmp_path):
    """keep ⇔ margin z ≥ 0, recomputed independently in Python; an
    all-stopword doc scores below a diverse one."""
    docs = [("the the the the", "en", "s"), ("join hash scan merge filter", "en", "s")]
    sf = _write_documents(spark, tmp_path, docs)
    out = {r.doc_id: r for r in SPECS["curate_quality_score_lr"].fn(spark, sf).collect()}
    for i, (text, _, _) in enumerate(docs):
        toks = [t for t in text.lower().split(" ") if t]
        f_len = math.log(1 + len(toks))
        f_stop = sum(t in ("a", "the") for t in toks) / len(toks)
        f_wordlen = sum(len(t) for t in toks) / len(toks)
        f_distinct = len(set(toks)) / len(toks)
        z = 0.8 * f_len - 2.0 * f_stop - 0.3 * f_wordlen + 1.5 * f_distinct - 0.2
        assert out[i].keep == (z >= 0)
        assert abs(out[i].score - 1 / (1 + math.exp(-z))) < 1e-5
    assert out[1].score > out[0].score


def _write_orders(spark, tmp_path, dates):
    df = spark.createDataFrame(
        [(i, datetime.datetime.combine(d, datetime.time())) for i, d in enumerate(dates)],
        "o_orderkey long, o_orderdate timestamp_ntz",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    return str(tmp_path)


def test_datetime_extra_clamping_and_iso(spark, tmp_path):
    """Jan 31 + 2 months clamps to Mar 31; Dec 31 + 2m = Feb 28 (1995
    non-leap); ISO dow is 1=Monday; week truncates to Monday."""
    sf = _write_orders(
        spark, tmp_path,
        [datetime.date(1995, 1, 31), datetime.date(1994, 12, 31), datetime.date(1995, 1, 30)],
    )
    out = {r.o_orderkey: r for r in SPECS["fn_datetime_extra"].fn(spark, sf).collect()}
    assert out[0].plus_2m == datetime.datetime(1995, 3, 31)
    assert out[1].plus_2m == datetime.datetime(1995, 2, 28)
    assert out[2].iso_dow == 1  # 1995-01-30 was a Monday
    assert out[2].week_start == datetime.datetime(1995, 1, 30)
    assert out[0].week_start == datetime.datetime(1995, 1, 30)  # Tue -> same Monday
    assert out[0].o_quarter == 1 and out[0].doy == 31


def test_attribution_last_touch_semantics(spark, tmp_path):
    sf = _write_events(
        spark, tmp_path,
        [
            # u1: view@0 click@10 error@15 purchase@20 -> credited to click
            (1, 0, 1, "view", 0.0),
            (2, 10, 1, "click", 0.0),
            (3, 15, 1, "error", 0.0),
            (4, 20, 1, "purchase", 9.0),
            # u2: touch outside the 1h lookback
            (5, 0, 2, "view", 0.0),
            (6, 4000, 2, "purchase", 9.0),
            # u3: purchase with no prior touch at all
            (7, 0, 3, "purchase", 9.0),
        ],
    )
    rows = SPECS["analytics_attribution_last_touch"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.purchase_event_id == 4 and r.touch_event_id == 2
    assert r.touch_type == "click" and r.gap_us == 10_000_000


def test_semantic_dedup_drops_within_cluster_only(spark, tmp_path):
    """Vectors 0..7 are orthogonal basis directions (the centroids
    themselves — mutually cos 0, all survive). Vec 8 ≈ vec 0 and vec 9
    = 2·vec 1 land in clusters 0/1 and are dropped by their lower-id
    neighbor; vec 10 is a weak mix assigned to cluster 2 but below τ
    from everything -> survives."""
    dim = 64
    vecs = []
    for i in range(8):
        v = np.zeros(dim)
        v[i] = 1.0
        vecs.append(v)
    near0 = np.zeros(dim)
    near0[0] = 1.0
    near0[63] = 0.1
    vecs.append(near0)  # vec 8 -> cluster 0, cos~0.995 with vec 0
    vecs.append(np.eye(dim)[1] * 2.0)  # vec 9 -> cluster 1, cos 1.0 with vec 1
    mix = np.zeros(dim)
    mix[2] = 0.4
    mix[40] = 1.0  # dominated by an off-centroid axis: cos(c2)=0.371 < tau
    vecs.append(mix)  # vec 10 -> cluster 2, survives
    sf = _write_embeddings(spark, tmp_path, [list(v) for v in vecs], [0] * len(vecs))
    out = {r.vec_id: r.cluster for r in SPECS["dedup_semantic_centroid"].fn(spark, sf).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5, 6, 7, 10}
    assert out[10] == 2
    for i in range(8):
        assert out[i] == i


def test_mips_ranks_by_magnitude_not_angle(spark, tmp_path):
    """A high-norm slightly-off-axis vector must outrank a low-norm
    perfectly-aligned one under inner product (the opposite of cosine)."""
    dim = 64
    q = np.zeros(dim); q[0] = 1.0
    aligned_small = np.zeros(dim); aligned_small[0] = 0.5          # dot 0.5, cos 1.0
    off_big = np.zeros(dim); off_big[0] = 1.8; off_big[1] = 0.9    # dot 1.8, cos ~0.89
    far = np.zeros(dim); far[2] = 1.0                              # dot 0
    sf = _write_embeddings(
        spark, tmp_path, [list(q), list(aligned_small), list(off_big), list(far)], [0] * 4
    )
    rows = [r for r in SPECS["sim_mips_topk"].fn(spark, sf).collect() if r.vec_id == 0]
    order = [r.neighbor_id for r in sorted(rows, key=lambda r: r.rn)]
    assert order[:2] == [2, 1]  # big-norm off-axis first, then aligned-small
    assert rows[0].dot is not None


def test_bpe_regex_closed_form(spark, tmp_path):
    """GPT-2 split of \"it's 123 ab-c\": it | 's | ' 123' | ' ab' | '-' | 'c'."""
    sf = _write_documents(spark, tmp_path, [("it's 123 ab-c", "en", "s")])
    r = SPECS["text_bpe_regex_tokens"].fn(spark, sf).collect()[0]
    assert r.n_bpe == 6
    assert r.n_ws == 3
    assert r.chars_per_token == round(len("it's 123 ab-c") / 6, 4)


def test_scene_cut_on_byte_jump(spark, tmp_path):
    """32 'A's then 32 'z's: frame sums 2080 vs 3904 -> |delta| 1824 > 300
    is a cut; a uniform payload has deltas 0 -> no cuts."""
    sf = _write_documents(
        spark, tmp_path, [("A" * 32 + "z" * 32, "en", "s"), ("b" * 96, "en", "s")]
    )
    rows = SPECS["multimodal_scene_cuts"].fn(spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    (cut,) = by_doc[0]
    assert cut.frame_idx == 1 and cut.delta == 32 * (122 - 65) and cut.is_cut
    assert all(not r.is_cut and r.delta == 0 for r in by_doc[1])


def test_zorder_buckets_partition_z_space(spark):
    """Bucket z-ranges are disjoint and ordered, rows are conserved, and
    every bucket bounds BOTH key dimensions strictly tighter than the
    full key space (the data-skipping property)."""
    import duckdb

    rows = sorted(SPECS["sink_zorder_layout"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r.bucket)
    total = duckdb.sql(f"SELECT count(*) FROM '{SF_DIR}/lineitem.parquet'").fetchone()[0]
    assert sum(r.n_rows for r in rows) == total
    for a, b in zip(rows, rows[1:]):
        assert a.max_z < b.min_z  # disjoint, ordered z ranges
    gspan = (max(r.max_part for r in rows) - min(r.min_part for r in rows))
    assert all(r.max_part - r.min_part <= gspan for r in rows)


def test_share_of_total_invariants(spark):
    """Within each priority: shares floor-sum to ≤ 1e6 (and > 1e6 - #cells
    from flooring), rank 1 holds the max cents; grand shares likewise."""
    rows = SPECS["agg_share_of_total"].fn(spark, SF_DIR).collect()
    by_p = {}
    for r in rows:
        by_p.setdefault(r.o_orderpriority, []).append(r)
    for grp in by_p.values():
        s = sum(r.share_in_priority_1e6 for r in grp)
        assert 1_000_000 - len(grp) < s <= 1_000_000
        top = max(grp, key=lambda r: r.cents)
        assert [r for r in grp if r.rnk == 1][0].cents == top.cents
    g = sum(r.share_of_grand_1e6 for r in rows)
    assert 1_000_000 - len(rows) < g <= 1_000_000


def test_moving_slope_linear_series(spark, tmp_path):
    """value_t = t/100 dollars (c = t cents) one second apart: every full
    5-row frame has slope exactly 1 cent/row -> 1e6; a constant series
    slopes 0."""
    rows = [(i, i, 1, "a", i / 100.0) for i in range(1, 11)]
    rows += [(100 + i, i, 2, "a", 7.0) for i in range(1, 8)]
    sf = _write_events(spark, tmp_path, rows)
    out = {r.event_id: r.slope_1e6 for r in SPECS["win_moving_slope"].fn(spark, sf).collect()}
    assert all(out[i] == 1_000_000 for i in range(5, 11))
    assert all(out[100 + i] == 0 for i in range(5, 8))
    assert 4 not in out and 104 not in out  # partial frames filtered


def test_simhash_recall_confusion_consistency(spark):
    r = SPECS["dedup_simhash_recall"].fn(spark, SF_DIR).collect()[0]
    assert r.n_truth > 0, "fixture must contain exact near-dup pairs"
    assert r.n_hit <= min(r.n_truth, r.n_pred)
    assert 0 <= r.recall_1e6 <= 1_000_000
    assert 0 <= r.precision_1e6 <= 1_000_000


def test_hll_intersection_tracks_exact_overlap(spark):
    """Inclusion-exclusion over HLL sketches: the overlap estimate must
    land within 10% + small-absolute slack of the exact overlap (HLL
    default rsd amplified ~3x by the subtraction)."""
    import duckdb

    r = SPECS["agg_hll_intersection"].fn(spark, SF_DIR).collect()[0]
    exact = duckdb.sql(f"""
        SELECT count(*) FROM (
          SELECT o_custkey FROM read_parquet('{SF_DIR}/orders.parquet')
          WHERE o_orderpriority = '1-URGENT'
          INTERSECT
          SELECT o_custkey FROM read_parquet('{SF_DIR}/orders.parquet')
          WHERE o_orderpriority = '2-HIGH'
        )""").fetchone()[0]
    assert abs(r.est_intersection - exact) <= 0.10 * exact + 30, (r, exact)


def test_period_growth_formula_and_nulls(spark):
    rows = sorted(SPECS["win_period_growth"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r.month_start)
    assert rows[0].prev_cents is None and rows[0].mom_growth_1e6 is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur.prev_cents == prev.cents
        expect = math.floor((cur.cents - prev.cents) * 1_000_000.0 / prev.cents + 0.5)
        assert cur.mom_growth_1e6 == expect
    for i, r in enumerate(rows):
        if i >= 12:
            assert r.yoy_cents == rows[i - 12].cents
        else:
            assert r.yoy_cents is None


def test_interleave_positions_unique_and_round_robin(spark):
    rows = SPECS["curate_interleave_roundrobin"].fn(spark, SF_DIR).collect()
    pos = [r.global_pos for r in rows]
    assert len(set(pos)) == len(pos)  # injective slots
    n_sources = len({r.source for r in rows})
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for grp in by_src.values():
        grp.sort(key=lambda r: r.rank_in_source)
        # stride n_sources within a source -> no burst consumption
        assert all(b.global_pos - a.global_pos == n_sources for a, b in zip(grp, grp[1:]))
    first_round = sorted(rows, key=lambda r: r.global_pos)[:n_sources]
    assert len({r.source for r in first_round}) == n_sources


def _py_haversine(lat1, lon1, lat2, lon2):
    from math import asin, cos, radians, sin, sqrt

    dlat, dlon = radians(lat2 - lat1), radians(lon2 - lon1)
    a = sin(dlat / 2) ** 2 + cos(radians(lat1)) * cos(radians(lat2)) * sin(dlon / 2) ** 2
    return 2 * 6371.0088 * asin(sqrt(a))


def _py_point(ck):
    return ((ck * 7919) % 1200) / 100.0 - 6.0, ((ck * 104729) % 3400) / 100.0 - 17.0


def test_geo_nearest_matches_python_reference(spark):
    hubs = [(h, (h * 1543) % 1200 / 100.0 - 6.0, (h * 9973) % 3400 / 100.0 - 17.0)
            for h in range(8)]
    rows = SPECS["geo_haversine_nearest"].fn(spark, SF_DIR).collect()
    for r in rows[:25]:
        lat, lon = _py_point(r.c_custkey)
        best = min(hubs, key=lambda h: (round(_py_haversine(lat, lon, h[1], h[2]), 6), h[0]))
        assert r.hub_id == best[0]
        assert abs(r.dist_km - _py_haversine(lat, lon, best[1], best[2])) < 1e-5


def test_geo_grid_join_exact_vs_bruteforce(spark):
    """The grid join must find EXACTLY the brute-force ≤100 km pair set
    (the 3x3 coverage proof, executed): sf0.001's 150 points -> 11k
    candidate pairs checked in Python."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    cks = [r[0] for r in duckdb.sql(f"SELECT c_custkey FROM '{sf}/customer.parquet'").fetchall()]
    pts = {ck: _py_point(ck) for ck in cks}
    truth = set()
    for i, a in enumerate(cks):
        for b in cks[i + 1:]:
            pa, pb = pts[a], pts[b]
            if round(_py_haversine(pa[0], pa[1], pb[0], pb[1]), 6) <= 100.0:
                truth.add((min(a, b), max(a, b)))
    got = {(r.id_a, r.id_b) for r in SPECS["join_geo_grid"].fn(spark, sf).collect()}
    assert got == truth and len(truth) > 0


def test_codec_roundtrip_all_rows_ok(spark):
    rows = SPECS["fn_codec_roundtrip"].fn(spark, SF_DIR).collect()
    assert rows and all(r.b64_roundtrip_ok for r in rows)
    assert all(r.key_hex == format(r.p_partkey, "X") for r in rows[:20])


def test_listagg_sorted_and_counted(spark):
    for r in SPECS["agg_listagg_distinct"].fn(spark, SF_DIR).collect():
        parts = r.statuses.split(",")
        assert parts == sorted(parts) and len(parts) == r.n_statuses


def test_freshness_lag_zero_for_newest(spark):
    rows = SPECS["profile_freshness_lag"].fn(spark, SF_DIR).collect()
    assert min(r.lag_us for r in rows) == 0
    assert all(r.lag_us >= 0 for r in rows)
    assert all(r.stale == (r.lag_us > 86_400_000_000) for r in rows)


def test_driver_window_prefix_is_the_planned_rotation():
    """The driver verifies only the FIRST 50 enumeration keys; pin the
    CURRENT (r09) window so a stray registration-order change can't
    silently displace the planned rotation (policy comment in
    registry.py: changed-since-verdict first, then never-verified, then
    oldest-verdict-first)."""
    keys = list(SPECS)
    from gvcf_hbase_spark.registry import _PRIORITY

    assert keys[: len(_PRIORITY)] == _PRIORITY
    # r10 rotation: slots 1-3 = this round's changed-since-verdict set,
    # slots 4-13 = the r09-optimizer-touched keys the r09 sample missed
    # (verdict item 2 ordered these sampled FIRST), slots 14-50 = the
    # staged oldest tail from the r09 rotation
    assert keys[0] == "dedup_containment"
    assert keys[2] == "curate_segment_dedup"
    assert keys[3] == "multimodal_phash_neardup"
    assert keys[12] == "gvcf_singleton_share"
    assert keys[13] == "scan_project"
    assert keys[49] == "sink_bulk_put"
    # new ops register AFTER the priority window, so later additions can
    # only grow the tail — the prefix pins above are the actual guard
    assert len(SPECS) >= 382


def test_snapshot_diff_classification(spark, tmp_path):
    """Midpoint cutoff T1 = 50s here. u1 appears after T1 -> I; u2
    changes value -> U; u3 deleted after T1 -> D; u4 unchanged and u5
    deleted-before-T1 are absent; u6 pins the min/max axis and is U."""
    sf = _write_events(
        spark, tmp_path,
        [
            (10, 80, 1, "view", 1.0),
            (20, 10, 2, "view", 2.0), (21, 90, 2, "view", 3.0),
            (30, 20, 3, "view", 4.0), (31, 85, 3, "error", 0.0),
            (40, 30, 4, "view", 5.0),
            (50, 5, 5, "error", 0.0),
            (60, 0, 6, "view", 6.0), (61, 100, 6, "view", 7.0),
        ],
    )
    out = {r.user_id: r for r in SPECS["cdc_snapshot_diff"].fn(spark, sf).collect()}
    assert set(out) == {1, 2, 3, 6}
    assert out[1].change == "I" and out[1].old_cents is None and out[1].new_cents == 100
    assert out[2].change == "U" and (out[2].old_cents, out[2].new_cents) == (200, 300)
    assert out[3].change == "D" and out[3].old_cents == 400 and out[3].new_cents is None
    assert out[6].change == "U" and (out[6].old_cents, out[6].new_cents) == (600, 700)


def test_association_lift_independence_identity(spark, tmp_path):
    """Closed form: u1..u4 all do A; u1,u2 also do B -> pair (A,B):
    n_ab=2, support=2/4, confidence(B|A... pair is unordered, anchored
    on type_a='a')=2/4, lift = 2*4/(4*2) = 1.0 exactly (B only occurs
    with A, A is universal -> independent-looking)."""
    sf = _write_events(
        spark, tmp_path,
        [(1, 0, 1, "a", 0.0), (2, 1, 1, "b", 0.0),
         (3, 0, 2, "a", 0.0), (4, 1, 2, "b", 0.0),
         (5, 0, 3, "a", 0.0), (6, 0, 4, "a", 0.0)],
    )
    r = SPECS["analytics_association_lift"].fn(spark, sf).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.type_a, row.type_b, row.n_ab) == ("a", "b", 2)
    assert row.support_1e6 == 500_000
    assert row.confidence_1e6 == 500_000
    assert row.lift_1e6 == 1_000_000


def test_cross_correlation_peak_at_true_lag(spark, tmp_path):
    """purchases replay view revenue one hour later -> perfect
    correlation (1e6) exactly at lag -1, below-perfect elsewhere."""
    vals = [(h * h) % 7 + 1.0 for h in range(10)]  # non-linear: only the
    # true shift correlates perfectly (a linear series would at EVERY lag)
    rows = []
    eid = 0
    for h in range(10):
        eid += 1
        rows.append((eid, 3600 * h, 1, "view", vals[h]))
    for h in range(1, 11):
        eid += 1
        rows.append((eid, 3600 * h, 2, "purchase", vals[h - 1]))
    sf = _write_events(spark, tmp_path, rows)
    out = {r.lag: r for r in SPECS["ts_cross_correlation"].fn(spark, sf).collect()}
    assert out[-1].xcorr_1e6 == 1_000_000
    for lag, r in out.items():
        if lag != -1:
            assert r.xcorr_1e6 < 1_000_000


def test_weighted_sample_matches_python_reference(spark):
    """Recompute the Efraimidis-Spirakis selection in Python with the
    same md5-derived uniforms and assert the identical top-50."""
    import duckdb, hashlib, math

    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF_DIR}/documents.parquet' WHERE n_chars > 0"
    ).fetchall()
    keyed = []
    for doc_id, n_chars in docs:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        keyed.append((round(math.log(u) / n_chars, 9), doc_id, n_chars))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    expect = [(i + 1, d, n) for i, (_, d, n) in enumerate(keyed[:50])]
    got = sorted(
        [(r.rnk, r.doc_id, r.n_chars) for r in SPECS["curate_weighted_sample"].fn(spark, SF_DIR).collect()]
    )
    assert got == expect


def test_ks_disjoint_supports_give_d_one(spark, tmp_path):
    sf = _write_events(
        spark, tmp_path,
        [(1, 0, 1, "view", 0.01), (2, 1, 1, "view", 0.02), (3, 2, 1, "view", 0.03),
         (4, 3, 2, "purchase", 0.10), (5, 4, 2, "purchase", 0.11), (6, 5, 2, "purchase", 0.12)],
    )
    r = SPECS["agg_ks_test"].fn(spark, sf).collect()[0]
    assert (r.nx, r.ny) == (3, 3)
    assert r.ks_d_1e6 == 1_000_000
    assert r.at_cents == 3  # CDF gap is maximal from the last x onward


def test_ks_identical_samples_give_d_zero(spark, tmp_path):
    rows = [(i, i, 1, "view", float(i % 4)) for i in range(8)]
    rows += [(100 + i, i, 2, "purchase", float(i % 4)) for i in range(8)]
    sf = _write_events(spark, tmp_path, rows)
    r = SPECS["agg_ks_test"].fn(spark, sf).collect()[0]
    assert r.ks_d_1e6 == 0


def test_hierarchy_depth_is_bit_length(spark):
    """parent = node div 2 means depth = bit_length(node) (number of
    halvings to reach 0) and every walk passes through node 1 just
    below the root."""
    rows = SPECS["hierarchy_flatten_bounded"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.depth == int(r.node).bit_length()
        assert r.root_child == (1 if r.node >= 1 else None)


def test_polygon_contains_matches_winding_number(spark):
    """Engine ray-cast vs an INDEPENDENT winding-number implementation
    (different algorithm, so a shared sign/direction bug can't hide):
    every point's inside verdict must agree, and the split is
    non-degenerate."""
    from gvcf_hbase_spark.operators.geo import _POLY

    rows = SPECS["geo_polygon_contains"].fn(spark, SF_DIR).collect()
    assert rows

    def winding(px, py):
        w = 0
        n = len(_POLY)
        for i in range(n):
            x1, y1 = _POLY[i]
            x2, y2 = _POLY[(i + 1) % n]
            if y1 <= py:
                if y2 > py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) > 0:
                    w += 1
            elif y2 <= py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) < 0:
                w -= 1
        return w != 0

    n_inside = 0
    for r in rows:
        lat = (r.c_custkey * 7919) % 1200 / 100.0 - 6.0
        lon = (r.c_custkey * 104729) % 3400 / 100.0 - 17.0
        expect = winding(lon, lat)
        assert r.inside == expect, (r.c_custkey, lon, lat, r.n_crossings, expect)
        n_inside += r.inside
    assert 0 < n_inside < len(rows)


def test_geohash_known_value(spark):
    """The canonical example: geohash(57.64911, 10.40744) = 'u4pruy'
    (external ground truth, not our own formula replayed)."""
    import pyspark.sql.functions as F
    from gvcf_hbase_spark.operators.geo import geohash6

    df = spark.createDataFrame([(57.64911, 10.40744)], "lat double, lon double")
    assert df.select(geohash6(F.col("lat"), F.col("lon")).alias("g")).collect()[0].g == "u4pruy"
