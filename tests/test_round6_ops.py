"""Round-6 additions: exact full-history running median (two-heap),
multi-quantile selection, Zipf slope, and the Gopher rule report.

The oracle rows are the primary gate (all four keys are oracle-checked);
these tests pin the algorithmic properties the oracles can't see — the
heap invariant against a brute-force reference, rank semantics at frame
edges, and rule behavior on crafted documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR
from gvcf_hbase_spark.registry import load_all

SPECS = load_all()


def _brute_running_median_2x(vals: list[int]) -> list[int]:
    out = []
    for i in range(len(vals)):
        s = sorted(vals[: i + 1])
        n = len(s)
        out.append(2 * s[n // 2] if n % 2 else s[n // 2 - 1] + s[n // 2])
    return out


def test_two_heap_median_matches_brute_force(spark, tmp_path):
    """The streaming two-heap must agree with sort-and-pick on an
    adversarial sequence (sorted, reversed, duplicate-heavy)."""
    import pandas as pd

    seqs = [
        [5, 1, 4, 2, 3, 3, 3, 9, 0, 7],
        list(range(20)),
        list(range(20, 0, -1)),
        [2] * 8 + [1, 3] * 4,
    ]
    rows = []
    eid = 0
    for u, seq in enumerate(seqs):
        for t, v in enumerate(seq):
            rows.append((eid, u, t * 1_000_000, "view", v / 100.0))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "us", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["us"], unit="us")
    sf = tmp_path / "sf"
    sf.mkdir()
    sdf = spark.createDataFrame(pdf[["event_id", "ts", "user_id", "event_type", "value"]])
    sdf.write.parquet(str(sf / "events.parquet"))
    out = SPECS["win_percentile_running_full"].fn(spark, str(sf)).collect()
    got = {}
    for r in out:
        got.setdefault(r.user_id, []).append((r.event_id, r.med_cents_2x))
    for u, seq in enumerate(seqs):
        meds = [m for _, m in sorted(got[u])]
        assert meds == _brute_running_median_2x(seq), f"user {u}"


def test_quantiles_multi_rank_semantics(spark):
    """Every pct's rank must be exactly ceil(pct·n/100) against an
    independently counted n, and every reported value must be
    non-decreasing in pct (quantile monotonicity)."""
    import math

    from gvcf_hbase_spark.sources.tables import load_table

    rows = {r.pct: r for r in SPECS["agg_quantiles_multi"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {25, 50, 75, 90, 99}
    vals = [rows[p].value_cents for p in (25, 50, 75, 90, 99)]
    assert vals == sorted(vals)
    n = load_table(spark, SF_DIR, "lineitem").count()
    for p in (25, 50, 75, 90, 99):
        assert rows[p].rank_at == math.ceil(p * n / 100), (p, rows[p].rank_at, n)


def test_zipf_slope_is_negative_and_bounded(spark):
    """Any natural-ish corpus slice must show a decreasing rank-frequency
    curve: slope < 0, and not absurdly steep (> -5)."""
    out = SPECS["text_zipf_slope"].fn(spark, SF_DIR).collect()
    assert out, "fixture must yield at least one source"
    for r in out:
        assert r.n_terms >= 10
        assert -5_000_000 < r.slope_1e6 < 0, r


def test_kalman_variance_converges(spark):
    """The posterior variance sequence must decrease monotonically from
    its r-init toward the steady-state fixed point p* = (sqrt(q² + 4qr)
    − q)/2, independent of the data — the defining Kalman property."""
    from gvcf_hbase_spark.operators.timeseries import _KF_Q, _KF_R

    out = SPECS["ts_kalman_1d"].fn(spark, SF_DIR).collect()
    series = {}
    for r in out:
        series.setdefault(r.event_type, []).append((r.day, r.p_var))
    p_star = ((_KF_Q**2 + 4 * _KF_Q * _KF_R) ** 0.5 - _KF_Q) / 2
    for et, pts in series.items():
        ps = [p for _, p in sorted(pts)]
        assert ps[0] == _KF_R
        assert all(a >= b for a, b in zip(ps, ps[1:])), et
        assert abs(ps[-1] - p_star) < 1.0, (et, ps[-1], p_star)


def test_gopher_rules_on_crafted_docs(spark, tmp_path):
    """One doc passes all rules; one fails word count (too short); one
    fails the symbol ratio; one fails stopwords (no English stopwords)."""
    import pandas as pd

    good = ("the quick brown fox jumps over a lazy dog and runs to the hills "
            * 5).strip()
    short = "the and of to a in is"
    symbols = ("# " * 30 + "the and of to a word list here with other terms "
               * 3).strip()
    nostop = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
              "eiusmod tempor incididunt labore dolore magna aliqua " * 5).strip()
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "source": ["s1", "s2", "s3", "s4"],
            "lang": ["en"] * 4,
            "text": [good, short, symbols, nostop],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf / "documents.parquet"))
    out = {r.source: r for r in SPECS["curate_gopher_report"].fn(spark, str(sf)).collect()}
    assert out["s1"].n_keep == 1
    assert out["s2"].wc_rate_1e6 == 0 and out["s2"].n_keep == 0
    assert out["s3"].sym_rate_1e6 == 0 and out["s3"].n_keep == 0
    assert out["s4"].stop_rate_1e6 == 0 and out["s4"].n_keep == 0
