"""Round-7 continuation additions: the AN-stratified site-frequency
spectrum, the SemDeDup threshold sweep, LPA modularity + assortativity,
SAX symbols, dominant-period discovery, the seasonal-residual anomaly
flag, incremental MinHash dedup, the PSI drift monitor, the IVF nprobe
sweep, sample missingness, Hudson Fst, tokenizer fertility, VAD
segmentation, and the containment cost-dispatch.

The oracle hash-compare is the primary gate; these tests pin what it
can't see — cross-operator consistency (sweep↔dedup at the shared τ,
incremental = cross-slice-of-full, nprobe sweep ↔ single-point gauge),
algebraic invariants (modularity partition algebra, Fst internals, SFS
partition), crafted-frame ground truths (12 h cycle, PSI shift), and the
dispatch's path-equivalence under a forced escalation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gvcf_hbase_spark.registry import load_all
from tests.conftest import SF_DIR

SPECS = load_all()

SF_SMALL = "/root/testdata/sf0.001"


def test_sfs_partitions_the_variant_sites(spark):
    """The spectrum is a partition of gvcf_allele_freq's variant sites:
    n_sites sums to the AF row count and the quantized shares sum to
    ~1e6 (within one rounding ulp per bucket)."""
    af_n = SPECS["gvcf_allele_freq"].fn(spark, SF_DIR).count()
    rows = SPECS["gvcf_af_spectrum"].fn(spark, SF_DIR).collect()
    assert sum(r.n_sites for r in rows) == af_n
    assert abs(sum(r.share_1e6 for r in rows) - 1_000_000) <= len(rows)
    # mac is folded: never exceeds an/2
    for r in rows:
        assert 0 <= r.mac <= r.an // 2


def test_semdedup_sweep_is_monotone_and_agrees_with_the_dedup_op(spark):
    """Raising ε can only shrink the qualifying pair set: n_pairs and
    n_pruned non-increasing, n_kept non-decreasing. At the shared
    τ=0.45 grid point the sweep's n_kept must equal the row count of
    dedup_semantic_centroid itself — the gauge measures the op."""
    rows = sorted(
        SPECS["sim_semdedup_eps_sweep"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.eps_1e2,
    )
    assert [r.eps_1e2 for r in rows] == [45, 60, 75, 90]
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_pairs <= lo.n_pairs
        assert hi.n_pruned <= lo.n_pruned
        assert hi.n_kept >= lo.n_kept
    kept_by_op = SPECS["dedup_semantic_centroid"].fn(spark, SF_DIR).count()
    assert rows[0].n_kept == kept_by_op


def test_modularity_partition_algebra(spark):
    """Σ n_nodes = node count, Σ intra_edges ≤ m, Σ degree_sum = 2m, and
    the fixture's clique communities each contribute positively — the
    partition's total Q = Σ q_num / 4m² lands in (0, 1)."""
    mod = SPECS["graph_modularity"].fn(spark, SF_DIR).collect()
    lpa = SPECS["graph_lpa_communities"].fn(spark, SF_DIR)
    n_nodes = lpa.count()
    assert sum(r.n_nodes for r in mod) == n_nodes
    two_m = sum(r.degree_sum for r in mod)
    assert two_m % 2 == 0
    m = two_m // 2
    assert sum(r.intra_edges for r in mod) <= m
    q = sum(r.q_num_4m2 for r in mod) / (4.0 * m * m)
    assert 0.0 < q < 1.0
    assert q > 0.5  # bridged 6-cliques are a strongly modular partition
    assert all(r.q_num_4m2 > 0 for r in mod)


def test_sax_symbols_respect_their_bins(spark):
    """Each symbol's quantized z must sit inside its breakpoint bin, the
    alphabet must actually get used (≥3 of 4 letters on this fixture),
    and per type the segment ids are the distinct hr-div-24 days."""
    rows = SPECS["ts_sax_symbols"].fn(spark, SF_DIR).collect()
    bins = {"a": (None, -674500), "b": (-674500, 0), "c": (0, 674500), "d": (674500, None)}
    for r in rows:
        lo, hi = bins[r.symbol]
        if lo is not None:
            assert r.z_1e6 >= lo, r
        if hi is not None:
            assert r.z_1e6 < hi, r
    assert len({r.symbol for r in rows}) >= 3
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_days = (
        ev.select(
            (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000))
            .cast("bigint")
            .alias("d")
        )
        .distinct()
        .count()
    )
    per_type = {}
    for r in rows:
        per_type.setdefault(r.event_type, set()).add(r.seg)
    for segs in per_type.values():
        assert len(segs) <= n_days + 1


def test_seasonal_residual_flags_pass_the_robust_floor(spark):
    """Every flagged row crossed the 3-MAD robust gate: robust_z_1e4 >
    30000 by construction, and the flagged set is a strict subset of
    the decomposition's non-null-residual rows."""
    flagged = SPECS["anomaly_seasonal_residual"].fn(spark, SF_DIR)
    rows = flagged.collect()
    assert len(rows) > 0
    assert all(r.robust_z_1e4 > 30_000 for r in rows)
    resid_rows = (
        SPECS["ts_seasonal_decompose"]
        .fn(spark, SF_DIR)
        .filter(F.col("resid_1e2").isNotNull())
        .count()
    )
    assert len(rows) < resid_rows


def test_seasonal_residual_is_quieter_than_raw_mad(spark):
    """The reason the op exists: flagging the REMAINDER fires less than
    robust-flagging raw values on a seasonal series (season explained
    away). Compare firing RATES on their own denominators."""
    seas = SPECS["anomaly_seasonal_residual"].fn(spark, SF_DIR).count()
    seas_base = (
        SPECS["ts_seasonal_decompose"]
        .fn(spark, SF_DIR)
        .filter(F.col("resid_1e2").isNotNull())
        .count()
    )
    raw = SPECS["anomaly_mad"].fn(spark, SF_DIR).count()
    raw_base = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert seas / seas_base <= max(raw / raw_base, 0.05)


def test_minhash_incremental_is_the_cross_slice_of_the_full_op(spark):
    """The incremental screen must equal dedup_near_minhash's verified
    pairs restricted to (history, batch) crossings — no extra hits, no
    misses at the 400 split."""
    full = SPECS["dedup_near_minhash"].fn(spark, SF_DIR).collect()
    cross = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b), r.jaccard)
        for r in full
        if (r.id_a < 400) != (r.id_b < 400)
    }
    inc = {
        (r.new_id, r.hist_id, r.jaccard)
        for r in SPECS["dedup_minhash_incremental"].fn(spark, SF_DIR).collect()
    }
    assert inc == cross
    assert all(new >= 400 > hist for new, hist, _ in inc)


def test_psi_is_zero_when_slices_are_identical(spark):
    """PSI ground truth on a crafted frame: identical ref/cur value
    distributions must score ~0 (only Laplace-smoothing noise), and a
    hard distribution shift must clear the 0.25 retrain bar."""
    import pandas as pd

    from gvcf_hbase_spark.operators.curation import profile_drift_psi

    rows = {r.event_type: r for r in profile_drift_psi(spark, SF_DIR).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r.n_ref > 0 and r.n_cur > 0
        # the fixture's value distribution is time-stationary by
        # construction: every type must read as stable
        assert abs(r.psi_1e9) < 100_000_000, r  # PSI < 0.1


def test_psi_flags_a_crafted_shift(spark, tmp_path):
    """Write a two-day events table whose second day's values are shifted
    by 10x; the op must report PSI > 0.25 for the shifted type."""
    import numpy as np
    import pandas as pd

    n = 2000
    ts0 = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(2 * n, dtype="int64"),
            "ts": [ts0 + pd.Timedelta(hours=i % 24) for i in range(n)]
            + [ts0 + pd.Timedelta(days=1, hours=i % 24) for i in range(n)],
            "user_id": np.zeros(2 * n, dtype="int64"),
            "event_type": ["click"] * (2 * n),
            "value": np.concatenate(
                [np.arange(n) % 100 / 10.0, (np.arange(n) % 100) * 1.0 + 500]
            ),
            "props": ["{}"] * (2 * n),
        }
    )
    p = str(tmp_path / "drift")
    import os

    os.makedirs(p, exist_ok=True)
    pdf.to_parquet(f"{p}/events.parquet")
    from gvcf_hbase_spark.operators.curation import profile_drift_psi

    out = {r.event_type: r for r in profile_drift_psi(spark, p).collect()}
    assert out["click"].psi_1e9 > 250_000_000  # PSI > 0.25: retrain


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_DIR])
def test_nprobe_sweep_monotone_and_anchored(spark, sf_dir):
    """More probes can only add candidates: recall_1e6 non-decreasing in
    nprobe. The probe=4 grid point must agree exactly with the
    single-point gauge sim_ann_ivf_recall (identical index params), and
    the widest probe must clear the family's recall floor."""
    rows = {
        r.nprobe: r
        for r in SPECS["sim_ivf_nprobe_sweep"].fn(spark, sf_dir).collect()
    }
    assert sorted(rows) == [1, 2, 4, 8]
    rec = [rows[p].recall_1e6 for p in (1, 2, 4, 8)]
    assert rec == sorted(rec)
    anchor = SPECS["sim_ann_ivf_recall"].fn(spark, sf_dir).collect()[0]
    assert rows[4].recall_1e6 == anchor.recall_1e6
    assert rows[4].n_hit == anchor.n_hit
    assert rows[8].recall_1e6 >= 700_000


def test_dominant_period_invariants_on_the_fixture(spark):
    """One row per type, lag inside the scanned [2, 36] grid, |acf| ≤ 1
    (the fixture's hourly series is weakly cyclic — lag VALUE is pinned
    on the crafted frame below, not here)."""
    rows = SPECS["ts_dominant_period"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 2 <= r.best_lag <= 36, r
        assert -1_000_000 <= r.acf_1e6 <= 1_000_000, r
        assert r.n_pairs > 0


def test_dominant_period_finds_a_crafted_12h_cycle(spark, tmp_path):
    """Ground truth: an event log whose hourly rate is a clean 12-hour
    square wave must report best_lag = 12 with near-perfect ACF."""
    import os

    import numpy as np
    import pandas as pd

    rows = []
    eid = 0
    t0 = pd.Timestamp("2024-01-01")
    for hr in range(240):
        n = 9 if (hr // 6) % 2 == 0 else 1  # period-12 square wave
        for _ in range(n):
            rows.append((eid, t0 + pd.Timedelta(hours=hr), 0, "click", 1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    p = str(tmp_path / "cycle")
    os.makedirs(p, exist_ok=True)
    pdf.to_parquet(f"{p}/events.parquet")
    out = SPECS["ts_dominant_period"].fn(spark, p).collect()
    assert len(out) == 1
    assert out[0].best_lag == 12
    assert out[0].acf_1e6 > 900_000


def test_assortativity_is_internally_consistent(spark):
    """The quantized r must equal a recompute from the row's own exact
    integer sufficient statistics, and sit in Pearson's [-1, 1]."""
    import math

    r = SPECS["graph_assortativity"].fn(spark, SF_DIR).collect()[0]
    num = r.n_directed_edges * r.xy_sum - r.deg_sum * r.deg_sum
    den = r.n_directed_edges * r.xx_sum - r.deg_sum * r.deg_sum
    assert den > 0
    assert r.assortativity_1e6 == math.floor(num / den * 1_000_000 + 0.5)
    assert -1_000_000 <= r.assortativity_1e6 <= 1_000_000


def test_fertility_rows_partition_the_corpus(spark):
    """Language buckets partition documents; fertility ≥ ~1 token/word on
    alphabetic text and chars/token is positive and finite."""
    rows = SPECS["curate_tokenizer_fertility"].fn(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.fertility_1e6 > 500_000, r
        assert r.chars_per_token_1e6 > 1_000_000, r


def test_missingness_bounds(spark):
    """Per-sample coverage never exceeds the site universe; the fixture's
    4 samples each cover a strict, non-empty subset."""
    rows = SPECS["gvcf_sample_missingness"].fn(spark, SF_DIR).collect()
    assert len(rows) == 4
    for r in rows:
        assert 0 < r.n_covered <= r.n_sites
        assert 0 < r.callrate_1e6 <= 1_000_000


def test_vad_segments_are_maximal_disjoint_runs(spark):
    """Segments per doc must be disjoint, ordered, within the doc's frame
    range, and MAXIMAL (two consecutive segments are separated by at
    least one inactive frame: end+1 < next start)."""
    segs = SPECS["multimodal_audio_vad_segments"].fn(spark, SF_DIR).collect()
    assert segs
    per_doc = {}
    for s in segs:
        assert s.start_frame <= s.end_frame
        assert s.n_frames == s.end_frame - s.start_frame + 1
        per_doc.setdefault(s.doc_id, []).append(s)
    for rows in per_doc.values():
        rows.sort(key=lambda r: r.seg_idx)
        assert [r.seg_idx for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a.end_frame + 1 < b.start_frame  # a silent gap between


def test_fst_identical_groups_score_zero(spark, tmp_path):
    """Cross-check on the fixture: groups {s0,s1} vs {s2,s3} follow the
    same generative rule, so per-contig Fst must sit near zero — and the
    Hudson numerator must be <= denominator (Fst <= 1) with exact
    integer-sum internals consistent with the reported quantized ratio."""
    import math

    rows = SPECS["gvcf_pop_fst"].fn(spark, SF_DIR).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.fst_1e6 == math.floor(r.num_sum_1e9 * 1e6 / r.den_sum_1e9 + 0.5)
        assert abs(r.fst_1e6) < 100_000  # |Fst| < 0.1: same-rule groups
        assert r.num_sum_1e9 <= r.den_sum_1e9


def test_containment_dispatch_picks_prefix_on_boilerplate(spark, tmp_path, monkeypatch):
    """On a boilerplate-heavy corpus (one hot phrase shared by every doc,
    unique rare tails) the prefix bound collapses relative to Σdf², the
    dispatcher must pick the prefix path past the ceiling, and the auto
    result must equal both forced paths. Also pins the r07 review fix:
    prefix postings prune the JOIN INPUT (two asymmetric joins), not a
    post-join filter — before the fix the forced-prefix path did the
    full Σdf² enumeration and lost in every regime."""
    import os

    import numpy as np
    import pandas as pd

    import gvcf_hbase_spark.operators.dedup as dd

    rng = np.random.default_rng(3)
    n = 400
    boiler = "click here to continue reading more"
    texts = [
        boiler + " " + " ".join(f"w{x}" for x in rng.integers(0, 10**6, size=12))
        for _ in range(n)
    ]
    texts += texts[:8]  # exact dupes -> true containment pairs exist
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts,
            "source": ["synth"] * len(texts),
            "lang": ["en"] * len(texts),
            "quality": np.ones(len(texts)),
        }
    )
    p = str(tmp_path / "boiler")
    os.makedirs(p, exist_ok=True)
    pdf.to_parquet(f"{p}/documents.parquet")

    # shrink the fast-accept ceiling so this small fixture escalates, and
    # take the r10 bitmap tier out of the ladder (this corpus is small and
    # bounded-vocabulary, so bitmap would legitimately win first — its own
    # dispatch test covers that) to pin the prefix-vs-direct decision.
    monkeypatch.setattr(dd, "_CONTAINMENT_DIRECT_CEILING", 10_000)
    monkeypatch.setattr(dd, "_CONTAINMENT_BITMAP_MAX_VOCAB", 0)
    dd._CONTAINMENT_PROBE_MEMO.clear()
    auto = sorted(map(tuple, dd._containment_pairs(spark, p, 0.8, None).collect()))
    (probe,) = dd._CONTAINMENT_PROBE_MEMO.values()
    fanout, bound, _n_docs, _v2 = probe
    assert fanout > 10_000  # escalated
    assert bound * dd._CONTAINMENT_PREFIX_FACTOR < fanout  # prefix chosen
    direct = sorted(
        map(tuple, dd._containment_pairs(spark, p, 0.8, "direct").collect())
    )
    prefix = sorted(
        map(tuple, dd._containment_pairs(spark, p, 0.8, "prefix").collect())
    )
    assert auto == direct == prefix
    assert len(auto) > 0
    # with the bitmap tier restored, the same corpus dispatches to bitmap
    # (bounded vocabulary, tiny n) and the result is unchanged
    monkeypatch.setattr(dd, "_CONTAINMENT_BITMAP_MAX_VOCAB", 65_536)
    dd._CONTAINMENT_PROBE_MEMO.clear()
    auto_bm = sorted(map(tuple, dd._containment_pairs(spark, p, 0.8, None).collect()))
    (probe_bm,) = dd._CONTAINMENT_PROBE_MEMO.values()
    assert dd._containment_bitmap_wins(probe_bm[0], probe_bm[2], probe_bm[3])
    assert auto_bm == auto
