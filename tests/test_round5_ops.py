"""Round-5 additions: content-defined chunking (CDC) properties.

The CDC op is rows-only by design (a windowed rolling hash is not
SQL-expressible), so the properties that justify it are pinned here:
determinism, the shift-robustness that is CDC's entire reason to exist
(fixed-grid chunking fails it), boundary-length statistics, and the
report invariants of the Spark op itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR
from gvcf_hbase_spark.operators.multimodal import (
    _CDC_MASK_BITS,
    _CDC_MAX,
    _CDC_MIN,
    _gear_table,
    cdc_chunk_hashes,
)
from gvcf_hbase_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def gear():
    return _gear_table()


def _payload(seed: int, n: int = 4096) -> bytes:
    # deterministic pseudo-random bytes without RNG state: md5 counter mode
    import hashlib

    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.md5(f"{seed}:{i}".encode()).digest())
        i += 1
    return bytes(out[:n])


def test_cdc_deterministic(gear):
    p = _payload(1)
    assert cdc_chunk_hashes(p, gear) == cdc_chunk_hashes(p, gear)
    assert cdc_chunk_hashes(b"", gear) == []


def test_cdc_shift_robustness(gear):
    """Prepending bytes must re-chunk only a bounded prefix: every
    boundary past (first aligned cut + 64-byte window) is a function of
    local content only, so the chunk streams converge and share their
    entire tail. A fixed 64-byte grid shares ~no chunks after a 3-byte
    shift — this property is the op's reason to exist."""
    p = _payload(2, 8192)
    a = cdc_chunk_hashes(p, gear)
    b = cdc_chunk_hashes(b"xyz" + p, gear)
    # compare aligned from the end; allow the first few chunks to differ
    tail = min(len(a), len(b)) - 3
    assert tail > 10, "fixture payload must produce enough chunks"
    assert a[-tail:] == b[-tail:]
    # and the overlap is large relative to the stream
    shared = len(set(a) & set(b))
    assert shared >= len(a) - 3


def test_cdc_chunk_length_statistics(gear):
    """Test of 6 (high) bits => geometric boundaries with mean ~64 B;
    the mean over a real payload must land well inside [16, 256]."""
    p = _payload(3, 1 << 15)
    hashes = cdc_chunk_hashes(p, gear)
    mean = len(p) / len(hashes)
    assert 16 <= mean <= 256, mean
    assert (1 << _CDC_MASK_BITS) == 64


def test_cdc_min_max_bounds_cap_degenerate_runs(gear):
    """FastCDC min/max enforcement (r06 verdict action 4): a run of ONE
    byte value drives the gear hash to a constant, so the pure content
    rule would cut everywhere (1-byte chunks) or nowhere (one giant
    chunk). The bounds must cap BOTH modes: chunk count within
    [ceil(len/max), ceil(len/min)] for every run length and byte value,
    and for arbitrary content too."""
    import math

    for val in (0, 7, 255):
        for n in (1, _CDC_MIN, _CDC_MAX, 4096, 10_000):
            chunks = cdc_chunk_hashes(bytes([val]) * n, gear)
            lo, hi = math.ceil(n / _CDC_MAX), math.ceil(n / _CDC_MIN)
            assert lo <= len(chunks) <= hi, (val, n, len(chunks), lo, hi)
    for seed in range(4):
        p = _payload(seed, 1 << 14)
        chunks = cdc_chunk_hashes(p, gear)
        lo, hi = math.ceil(len(p) / _CDC_MAX), math.ceil(len(p) / _CDC_MIN)
        assert lo <= len(chunks) <= hi, (seed, len(chunks), lo, hi)


def test_cdc_boundary_uses_full_window_not_trailing_bytes(gear):
    """The cut test reads the HIGH bits of the gear hash, so the
    boundary decision at a position must mix the whole 64-byte window:
    payloads that share the same trailing 8 bytes but differ before
    must NOT all make the same cut decision at the end. Regression for
    the low-bit-mask bug where (h & 63) depended only on the trailing
    6 bytes, so any shared 6-byte suffix forced identical decisions."""
    import numpy as np

    suffix = _payload(7, 8)
    decisions = set()
    for seed in range(40):
        p = _payload(seed, 256) + suffix
        b = np.frombuffer(p, dtype=np.uint8)
        g = gear[b]
        h = np.zeros(b.size, dtype=np.uint64)
        for k in range(min(64, b.size)):
            h[k:] += g[: b.size - k] << np.uint64(k)
        # record the high bits themselves: under the buggy low-bit rule
        # the TESTED bits were a pure function of the shared suffix
        decisions.add(int(h[-1] >> np.uint64(64 - _CDC_MASK_BITS)))
    assert len(decisions) > 1, "tested bits must vary with pre-suffix content"


def test_cdc_concatenation_reuses_interior_chunks(gear):
    """Chunks strictly inside each half survive concatenation — only the
    seam window re-chunks (the dedup win on shifted/duplicated media)."""
    x, y = _payload(4, 4096), _payload(5, 4096)
    cx, cy, cxy = (
        cdc_chunk_hashes(x, gear),
        cdc_chunk_hashes(y, gear),
        cdc_chunk_hashes(x + y, gear),
    )
    # all x-chunks except the last (seam) appear in the concatenation,
    # and all y-chunks except the first window's worth
    assert set(cx[:-1]) <= set(cxy)
    assert set(cy[3:]) <= set(cxy)


def test_cdc_spark_report_invariants(spark):
    """The registered op's per-source report must be internally
    consistent and cover every non-empty source in the fixture."""
    df = SPECS["multimodal_cdc_chunk_dedup"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows, "report must be non-empty"
    for r in rows:
        assert r.n_chunks >= r.n_distinct > 0
        assert r.n_dup == r.n_chunks - r.n_distinct
        expect = int((r.n_dup * 1_000_000.0 / r.n_chunks) + 0.5)
        assert r.dup_ratio_1e6 == expect
    from gvcf_hbase_spark.sources.tables import load_table

    n_sources = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.length("text") > 0)
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources


def test_lttb_exact_vs_parallel_structure(spark):
    """The exact sequential LTTB must agree with the parallel variant on
    everything that is NOT the recurrence: same (series, day) coverage
    (one pick per day), identical first/last picks (both variants keep
    them by definition), and every pick must be a real point of its
    bucket."""
    exact = SPECS["ts_downsample_lttb_exact"].fn(spark, SF_DIR).collect()
    par = SPECS["ts_downsample_lttb"].fn(spark, SF_DIR).collect()

    def by_key(rows):
        return {(r.event_type, r.day): r for r in rows}

    e, p = by_key(exact), by_key(par)
    assert set(e) == set(p), "same (series, day) coverage"
    for k in e:
        assert e[k].kind == p[k].kind
        if e[k].kind in ("first", "last"):
            assert (e[k].sel_t_us, e[k].sel_v_cents) == (
                p[k].sel_t_us,
                p[k].sel_v_cents,
            ), f"{k}: first/last picks must be identical across variants"

    # every exact pick is a genuine point of its (series, day) bucket
    from gvcf_hbase_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    pts = {
        (r.event_type, r.day, r.t_us, r.v)
        for r in ev.selectExpr(
            "event_type",
            "ts_us_long div 86400000000 as day",
            "ts_us_long as t_us",
            "cast(floor(value * 100 + 0.5) as long) as v",
        ).collect()
    }
    for r in exact:
        assert (r.event_type, r.day, r.sel_t_us, r.sel_v_cents) in pts


def test_two_phase_ntile_equals_native(spark):
    """functions/ranks.py must reproduce row_number()/ntile() OVER a
    global ORDER BY bit-for-bit — including tie groups and the uneven
    n % tiles remainder — for every bucket granularity (one mega bucket,
    per-value buckets, coarse buckets)."""
    from pyspark.sql import Window

    from gvcf_hbase_spark.functions.ranks import (
        attach_two_phase_ntile,
        attach_two_phase_rank,
    )

    # 997 rows, heavy ties (v = i % 37), deterministic
    df = spark.range(997).select(
        F.col("id"), (F.col("id") % 37).alias("v")
    )
    order = [F.col("v").asc(), F.col("id")]
    w = Window.orderBy(*order)
    native = df.select(
        "id",
        F.row_number().over(w).alias("rk"),
        F.ntile(7).over(w).alias("t7"),
        F.ntile(5).over(w).alias("t5"),
    )
    for bucket in (F.lit(0), F.col("v"), F.floor(F.col("v") / 8)):
        got_rk = attach_two_phase_rank(df, order, bucket, out="rk")
        got = attach_two_phase_ntile(got_rk, order, bucket, tiles=7, out="t7")
        got = attach_two_phase_ntile(got, order, bucket, tiles=5, out="t5")
        a = {r.id: (r.rk, r.t7, r.t5) for r in got.collect()}
        b = {r.id: (r.rk, r.t7, r.t5) for r in native.collect()}
        assert a == b


def test_cdc_prefix_doubling_matches_unrolled_window_sum(gear):
    """r09 optimization: the Gear hash switched from 64 shifted adds to
    6 prefix-doubling passes (the window is 2^6 wide). Pin bit-equality
    of the resulting chunking against the r08 unrolled reference across
    every short length (the doubling's slice-boundary edge cases) and a
    long payload."""
    import hashlib

    import numpy as np

    from gvcf_hbase_spark.operators.multimodal import _CDC_SHIFT_W

    def reference_chunks(payload: bytes) -> list[str]:
        b = np.frombuffer(payload, dtype=np.uint8)
        n = b.size
        if n == 0:
            return []
        g = gear[b]
        h = np.zeros(n, dtype=np.uint64)
        for k in range(min(_CDC_SHIFT_W, n)):
            h[k:] += g[: n - k] << np.uint64(k)
        cand = np.flatnonzero((h >> np.uint64(64 - _CDC_MASK_BITS)) == 0)
        out, start = [], 0
        while start < n:
            lo = start + _CDC_MIN - 1
            hi = min(start + _CDC_MAX - 1, n - 1)
            i = int(np.searchsorted(cand, lo))
            e = int(cand[i]) if i < cand.size and cand[i] <= hi else hi
            out.append(hashlib.md5(payload[start : e + 1]).hexdigest())
            start = e + 1
        return out

    long = _payload(11, 4096)
    assert cdc_chunk_hashes(long, gear) == reference_chunks(long)
    for n in range(0, 2 * _CDC_SHIFT_W + 2):
        p = _payload(n, n)
        assert cdc_chunk_hashes(p, gear) == reference_chunks(p), n
