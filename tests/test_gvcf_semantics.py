"""Reference-semantics micro-fixtures (SURVEY §5.3 / FIXTURES.md).

Mirrors the reference's own test design (recollected: two samples with
misaligned block boundaries, a block spanning a partition boundary, a
variant starting inside another sample's block) with hand-computed golden
values — the semantic heart of gVCF per-position combining.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from gvcf_hbase_spark.operators.gvcf import carry_forward, combine_positions, expand_blocks
from gvcf_hbase_spark.operators.joins import asof_join
from gvcf_hbase_spark.sources.gvcf_text import parse_gvcf_lines, read_gvcf
from tests.conftest import SF_DIR


def _variants_lite(spark):
    # sample A: ref block [1,5], variant at 6, ref block [7,10]
    # sample B: ref block [2,8] (misaligned with A's boundaries),
    #           variant at 9 (inside A's second block)
    rows = [
        ("A", "chr1", 1, 5, "A:ref1", False),
        ("A", "chr1", 6, 6, "A:var6", True),
        ("A", "chr1", 7, 10, "A:ref2", False),
        ("B", "chr1", 2, 8, "B:ref1", False),
        ("B", "chr1", 9, 9, "B:var9", True),
    ]
    return spark.createDataFrame(
        rows, "sample_id string, contig string, start long, end long, value string, is_variant boolean"
    )


GOLDEN = {
    1: {"A": "A:ref1"},
    2: {"A": "A:ref1", "B": "B:ref1"},
    3: {"A": "A:ref1", "B": "B:ref1"},
    4: {"A": "A:ref1", "B": "B:ref1"},
    5: {"A": "A:ref1", "B": "B:ref1"},
    6: {"A": "A:var6", "B": "B:ref1"},
    7: {"A": "A:ref2", "B": "B:ref1"},
    8: {"A": "A:ref2", "B": "B:ref1"},
    9: {"A": "A:ref2", "B": "B:var9"},
    10: {"A": "A:ref2"},
}


def test_expand_blocks(spark):
    df = _variants_lite(spark)
    out = expand_blocks(df)
    # block [1,5] covers 5 positions etc.: 5 + 1 + 4 + 7 + 1 = 18 rows
    assert out.count() == 18
    a_pos = sorted(
        r.pos for r in out.filter("sample_id = 'A' AND value = 'A:ref1'").collect()
    )
    assert a_pos == [1, 2, 3, 4, 5]


def test_combine_positions_golden(spark):
    out = combine_positions(_variants_lite(spark), variant_col="is_variant").collect()
    got = {r.pos: dict(r.samples) for r in out}
    assert got == GOLDEN
    n = {r.pos: r.n_samples for r in out}
    assert n[1] == 1 and n[6] == 2 and n[10] == 1


def test_combine_positions_variant_sites_only(spark):
    out = combine_positions(
        _variants_lite(spark), variant_col="is_variant", only_variant_sites=True
    ).collect()
    got = {r.pos: dict(r.samples) for r in out}
    # Only positions where some sample has a variant — but with ALL
    # samples' covering records reported (the A9 alignment).
    assert got == {6: GOLDEN[6], 9: GOLDEN[9]}


def test_combine_positions_partition_invariant(spark):
    """The reference needs fixed-boundary block duplication (A4) to make
    partitioned scans correct; in Spark the shuffle realigns, so the
    result must be identical no matter how the input is partitioned."""
    df = _variants_lite(spark)
    base = {r.pos: dict(r.samples) for r in combine_positions(df, variant_col="is_variant").collect()}
    for n in (1, 7):
        got = {
            r.pos: dict(r.samples)
            for r in combine_positions(df.repartition(n), variant_col="is_variant").collect()
        }
        assert got == base


def test_carry_forward_golden(spark):
    rows = [
        ("u1", 1, None),
        ("u1", 2, 10.0),
        ("u1", 3, None),
        ("u1", 4, 20.0),
        ("u1", 5, None),
        ("u2", 1, None),  # separate partition: no bleed-through
    ]
    df = spark.createDataFrame(rows, "user string, t long, v double")
    out = carry_forward(df, ["user"], ["t"], "v", out_col="cv")
    got = {(r.user, r.t): r.cv for r in out.collect()}
    assert got == {
        ("u1", 1): None,
        ("u1", 2): 10.0,
        ("u1", 3): 10.0,
        ("u1", 4): 20.0,
        ("u1", 5): 20.0,
        ("u2", 1): None,
    }


# The same two-sample scenario as _variants_lite, but as raw gVCF text —
# the reference's actual input format (EP1→EP2 end-to-end, SURVEY §3.1).
_GVCF_A = [
    "##fileformat=VCFv4.2",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA",
    "chr1\t1\t.\tA\t<NON_REF>\t.\t.\tEND=5\tGT:DP\t0/0:20",
    "chr1\t6\t.\tC\tT,<NON_REF>\t50\tPASS\tDP=9\tGT:DP\t0/1:9",
    "chr1\t7\t.\tG\t<NON_REF>\t.\t.\tEND=10\tGT:DP\t0/0:18",
]
_GVCF_B = [
    "##fileformat=VCFv4.2",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tB",
    "chr1\t2\t.\tT\t<NON_REF>\t.\t.\tEND=8\tGT:DP\t0/0:31",
    "chr1\t9\t.\tG\tA,<NON_REF>\t60\tPASS\tDP=12\tGT:DP\t1/1:12",
]


def test_parse_gvcf_lines(spark):
    lines = spark.createDataFrame(
        [("A", ln) for ln in _GVCF_A], "sample_id string, line string"
    )
    recs = {r.start: r for r in parse_gvcf_lines(lines).collect()}
    assert set(recs) == {1, 6, 7}  # headers dropped
    assert (recs[1].end, recs[1].is_variant, recs[1].gt) == (5, False, "0/0")
    assert recs[1].value == "ref:0/0"
    assert (recs[6].end, recs[6].is_variant, recs[6].alt) == (6, True, "T")
    assert recs[6].value == "C>T:0/1"
    assert recs[7].end == 10


def test_gvcf_text_to_combine_end_to_end(spark, tmp_path):
    """EP1→EP2 mirror: write per-sample gVCF files, read+parse each
    (spark.read.text path), union, combine per position — the combined
    map must equal the hand-computed golden of the same scenario."""
    fa, fb = tmp_path / "a.g.vcf", tmp_path / "b.g.vcf"
    fa.write_text("\n".join(_GVCF_A) + "\n")
    fb.write_text("\n".join(_GVCF_B) + "\n")
    recs = read_gvcf(spark, str(fa), "A").unionByName(read_gvcf(spark, str(fb), "B"))
    # re-tag values to the lite fixture's names for golden comparison
    combined = combine_positions(recs, variant_col="is_variant")
    got = {r.pos: dict(r.samples) for r in combined.collect()}
    expect = {
        pos: {s: v for s, v in m.items()}
        for pos, m in {
            1: {"A": "ref:0/0"},
            2: {"A": "ref:0/0", "B": "ref:0/0"},
            3: {"A": "ref:0/0", "B": "ref:0/0"},
            4: {"A": "ref:0/0", "B": "ref:0/0"},
            5: {"A": "ref:0/0", "B": "ref:0/0"},
            6: {"A": "C>T:0/1", "B": "ref:0/0"},
            7: {"A": "ref:0/0", "B": "ref:0/0"},
            8: {"A": "ref:0/0", "B": "ref:0/0"},
            9: {"A": "ref:0/0", "B": "G>A:1/1"},
            10: {"A": "ref:0/0"},
        }.items()
    }
    assert got == expect


def test_asof_join_matches_pandas_merge_asof(spark):
    """Cross-library check: on randomized (key, ts) data, the union-tag
    window implementation must agree with pandas.merge_asof for every
    (direction, strict) combination — an independent reference
    implementation, not our own oracle SQL."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(1234)
    for trial in range(3):
        nl, nr = 120, 80
        left_pd = pd.DataFrame(
            {
                "k": rng.randint(0, 5, nl).astype("int64"),
                "lid": np.arange(nl, dtype="int64"),
                "t": rng.randint(0, 1000, nl).astype("int64"),
            }
        )
        right_pd = pd.DataFrame(
            {
                "k": rng.randint(0, 5, nr).astype("int64"),
                # unique rt per key so the expected match is unambiguous
                "rt": (rng.permutation(5000)[:nr] * 7).astype("int64"),
            }
        )
        left = spark.createDataFrame(left_pd)
        right = spark.createDataFrame(right_pd)
        for direction in ("backward", "forward"):
            for strict in (False, True):
                got = asof_join(
                    left, right, on="k", left_ts="t", right_ts="rt",
                    direction=direction, strict=strict, how="left",
                ).toPandas().set_index("lid")["rt"].to_dict()
                exp = pd.merge_asof(
                    left_pd.sort_values("t"),
                    right_pd.sort_values("rt"),
                    left_on="t",
                    right_on="rt",
                    by="k",
                    direction=direction,
                    allow_exact_matches=not strict,
                ).set_index("lid")["rt"].to_dict()
                for lid in left_pd["lid"]:
                    g, e = got.get(lid), exp.get(lid)
                    both_nan = pd.isna(g) and pd.isna(e)
                    assert both_nan or g == e, (
                        f"trial={trial} dir={direction} strict={strict} "
                        f"lid={lid}: spark={g} pandas={e}"
                    )


def test_asof_join_directions(spark):
    left = spark.createDataFrame([("x", 10), ("x", 20), ("y", 10)], "k string, t long")
    right = spark.createDataFrame(
        [("x", 5), ("x", 15), ("x", 25)], "k string, rt long"
    )
    back = asof_join(left, right, on="k", left_ts="t", right_ts="rt")
    got = {r.t: r.rt for r in back.collect()}
    assert got == {10: 5, 20: 15}  # y has no match -> dropped (inner)

    fwd = asof_join(left, right, on="k", left_ts="t", right_ts="rt", direction="forward")
    got = {r.t: r.rt for r in fwd.collect()}
    assert got == {10: 15, 20: 25}

    # boundary: equal timestamps match unless strict
    eq = spark.createDataFrame([("x", 15)], "k string, t long")
    got = asof_join(eq, right, on="k", left_ts="t", right_ts="rt").collect()
    assert [r.rt for r in got] == [15]
    got = asof_join(eq, right, on="k", left_ts="t", right_ts="rt", strict=True).collect()
    assert [r.rt for r in got] == [5]

    # left outer: unmatched left rows survive with NULL right payload
    lo = asof_join(left, right, on="k", left_ts="t", right_ts="rt", how="left")
    got = {(r.k, r.t): r.rt for r in lo.collect()}
    assert got == {("x", 10): 5, ("x", 20): 15, ("y", 10): None}


def test_sample_name_index(spark):
    from gvcf_hbase_spark.operators.gvcf import sample_name_index

    df = _variants_lite(spark)
    dim, enriched = sample_name_index(df)
    # Dense, 0-based, deterministic by name order.
    assert {(r.sample_id, r.sample_idx) for r in dim.collect()} == {("A", 0), ("B", 1)}
    # Enrichment preserves row count and tags every record.
    assert enriched.count() == df.count()
    assert enriched.filter("sample_id = 'B' AND sample_idx != 1").count() == 0
    # Appending a new sample re-derives indices densely (no fixed count).
    extra = spark.createDataFrame(
        [("AB", "chr1", 1, 1, "AB:var1", True)],
        "sample_id string, contig string, start long, end long, value string, is_variant boolean",
    )
    dim2, _ = sample_name_index(df.unionByName(extra))
    assert {(r.sample_id, r.sample_idx) for r in dim2.collect()} == {
        ("A", 0),
        ("AB", 1),
        ("B", 2),
    }


def test_asof_join_rejects_reserved_columns(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, 10, 5)], "user_id long, ts long, __t long")
    right = spark.createDataFrame([(1, 9, 1.0)], "user_id long, rts long, val double")
    with _pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on="user_id", left_ts="ts", right_ts="rts")


def test_asof_tolerance_matches_pandas(spark):
    """The tolerance composition (as-of + post-filter on the matched
    timestamp) must agree with pandas.merge_asof(tolerance=...) on
    randomized data — matches older than the bound become NULL/dropped."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(99)
    left_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 4, 100).astype("int64"),
            "lid": np.arange(100, dtype="int64"),
            "t": rng.randint(0, 500, 100).astype("int64"),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 4, 60).astype("int64"),
            "rt": (rng.permutation(2000)[:60]).astype("int64"),
        }
    )
    tol = 50
    out = asof_join(
        spark.createDataFrame(left_pd),
        spark.createDataFrame(right_pd),
        on="k", left_ts="t", right_ts="rt", how="inner",
    )
    got = {
        r.lid: r.rt
        for r in out.filter(F.col("t") - F.col("rt") <= tol).collect()
    }
    exp_df = pd.merge_asof(
        left_pd.sort_values("t"), right_pd.sort_values("rt"),
        left_on="t", right_on="rt", by="k",
        direction="backward", tolerance=tol,
    )
    exp = {
        int(r.lid): int(r.rt) for r in exp_df.itertuples() if not pd.isna(r.rt)
    }
    assert got == exp


def test_operators_on_empty_inputs(spark):
    """Empty-input robustness: core custom operators must return empty
    results with the right schema, not crash, when a filter upstream
    leaves zero rows (routine at 100 TB: a partition-pruned day with no
    data)."""
    from gvcf_hbase_spark.operators.gvcf import combine_positions, sample_name_index
    from gvcf_hbase_spark.operators.graphs import triangle_count

    empty_iv = spark.createDataFrame(
        [],
        "sample_id string, contig string, start long, end long, value string, is_variant boolean",
    )
    out = combine_positions(empty_iv, variant_col="is_variant")
    assert out.count() == 0 and "samples" in out.columns

    dim, enriched = sample_name_index(empty_iv)
    assert dim.count() == 0 and enriched.count() == 0

    left = spark.createDataFrame([], "k long, t long")
    right = spark.createDataFrame([(1, 5, 1.0)], "k long, rt long, v double")
    assert asof_join(left, right, on="k", left_ts="t", right_ts="rt").count() == 0
    # empty RIGHT side: left rows survive under how='left' with NULL payload
    l2 = spark.createDataFrame([(1, 10)], "k long, t long")
    r2 = spark.createDataFrame([], "k long, rt long, v double")
    kept = asof_join(l2, r2, on="k", left_ts="t", right_ts="rt", how="left").collect()
    assert len(kept) == 1 and kept[0].rt is None

    assert (
        triangle_count(spark.createDataFrame([], "u long, v long")).collect()[0][
            "n_triangles"
        ]
        == 0
    )


def test_allele_freq_counts_ref_blocks_in_an(spark):
    """The gVCF raison d'être: AN at a variant site must include samples
    whose hom-ref BLOCK covers the site. s1 has 0/1 at pos 5 (AC=1); s2's
    ref block [4,6] covers pos 5 (adds 2 to AN, 0 to AC) → AF = 1/4.
    Without block expansion AF would wrongly be 1/2. Also: a 1/1 genotype
    contributes AC=2."""
    import pyspark.sql.functions as F

    from gvcf_hbase_spark.operators.gvcf import expand_blocks
    from gvcf_hbase_spark.sources.gvcf_text import parse_gvcf_lines

    lines = spark.createDataFrame(
        [
            ("s1", "chr1\t5\t.\tA\tT,<NON_REF>\t50\tPASS\tDP=9\tGT:DP\t0/1:9"),
            ("s2", "chr1\t4\t.\tA\t<NON_REF>\t50\tPASS\tEND=6\tGT:DP\t0/0:8"),
            ("s3", "chr1\t9\t.\tA\tT,<NON_REF>\t50\tPASS\tDP=9\tGT:DP\t1/1:9"),
        ],
        "sample_id string, line string",
    )
    recs = parse_gvcf_lines(lines)
    gt_parts = F.split(F.col("gt"), "/")
    pos = expand_blocks(
        recs.withColumn("ploidy", F.size(gt_parts).cast("long")).withColumn(
            "alt_alleles", F.size(F.filter(gt_parts, lambda x: x == "1")).cast("long")
        )
    )
    out = (
        pos.groupBy("contig", "pos")
        .agg(
            F.sum("alt_alleles").alias("ac"),
            F.sum("ploidy").alias("an"),
            F.max(F.col("is_variant").cast("int")).alias("v"),
        )
        .filter(F.col("v") == 1)
        .collect()
    )
    by_pos = {r.pos: (r.ac, r.an) for r in out}
    assert by_pos[5] == (1, 4)   # ref block counted in AN
    assert by_pos[9] == (2, 2)   # hom-alt: both alleles count
    assert 4 not in by_pos and 6 not in by_pos  # pure-ref positions dropped


def test_titv_classification_and_counts(spark):
    """Every SNP is classified: n_ti + n_tv == variant count per contig,
    and the purine-set test matches the explicit transition table."""
    from gvcf_hbase_spark.registry import load_all

    S = load_all()
    rows = S["gvcf_titv_ratio"].fn(spark, SF_DIR).collect()
    import duckdb

    per_contig = dict(duckdb.sql(f"""
        SELECT concat('chr', 1 + o_orderkey % 2), count(*)
        FROM read_parquet('{SF_DIR}/orders.parquet')
        WHERE o_orderkey % 3 <> 0 GROUP BY 1""").fetchall())
    transitions = {("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")}
    letters = "ACGT"
    exp = {}
    for (ck,) in duckdb.sql(f"SELECT o_orderkey FROM read_parquet('{SF_DIR}/orders.parquet') WHERE o_orderkey % 3 <> 0").fetchall():
        contig = f"chr{1 + ck % 2}"
        ref = letters[ck % 4]
        alt = letters[(ck % 4 + 1 + ck % 3) % 4]
        ti, tv = exp.get(contig, (0, 0))
        if (ref, alt) in transitions:
            exp[contig] = (ti + 1, tv)
        else:
            exp[contig] = (ti, tv + 1)
    for r in rows:
        assert r.n_ti + r.n_tv == per_contig[r.contig]
        assert (r.n_ti, r.n_tv) == exp[r.contig]


def test_block_compression_identity(spark):
    """positions == records + 2*blocks (span=2 blocks add exactly two
    extra positions each), so the compression factor is derivable."""
    from gvcf_hbase_spark.registry import load_all

    S = load_all()
    for r in S["gvcf_block_compression"].fn(spark, SF_DIR).collect():
        assert r.n_positions == r.n_records + 2 * r.n_blocks
        assert r.positions_per_record_1e6 >= 1_000_000


def test_dp_stats_bounds(spark):
    """DP is 8..12 for blocks and 10..16 for variants -> min/max within
    [8, 16] and mean consistent with sum/n."""
    from gvcf_hbase_spark.registry import load_all

    S = load_all()
    for r in S["gvcf_dp_stats"].fn(spark, SF_DIR).collect():
        assert 8 <= r.min_dp <= r.max_dp <= 16
        assert r.mean_dp_1e4 == int(r.sum_dp * 10_000.0 / r.n_records + 0.5)


def test_variant_density_window_invariants(spark):
    """Every window's density is exactly n_variants*1e6/WIN (WIN=100
    divides 1e6, so the floor(+0.5) round is the identity) and carrier
    counts stay within the 4-sample cohort."""
    from gvcf_hbase_spark.registry import load_all

    S = load_all()
    rows = S["gvcf_variant_density"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_carriers <= 4
        assert 1 <= r.n_variants
        assert r.density_1e6 == r.n_variants * 10_000


def test_callable_regions_are_maximal_contiguous_runs(spark):
    """Regions are contiguous (n_sites == span), clipped at the 100-pos
    shard boundary, and every covered position really has >=2-sample
    depth while positions just outside a region (same shard) do not."""
    from gvcf_hbase_spark.registry import load_all
    from gvcf_hbase_spark.sources.gvcf_text import _fixture_lines, parse_gvcf_lines

    S = load_all()
    rows = S["gvcf_callable_regions"].fn(spark, SF_DIR).collect()
    assert rows
    covered = {}
    for r in rows:
        assert r.n_sites == r.end_pos - r.start_pos + 1
        assert r.start_pos // 100 == r.end_pos // 100
        covered.setdefault(r.contig, set()).update(range(r.start_pos, r.end_pos + 1))

    recs = parse_gvcf_lines(_fixture_lines(spark, SF_DIR, span=9))
    depth = {}
    for rec in recs.collect():
        for p in range(rec.start, rec.end + 1):
            depth.setdefault((rec.contig, p), set()).add(rec.sample_id)
    for (contig, p), samples in depth.items():
        in_region = p in covered.get(contig, set())
        assert in_region == (len(samples) >= 2), (contig, p, len(samples), in_region)
    # maximality: a position NOT in any region but inside a region's shard
    # and adjacent to it must have depth < 2 (else the run would extend)
    for r in rows:
        for adj in (r.start_pos - 1, r.end_pos + 1):
            if adj // 100 == r.start_pos // 100:
                assert len(depth.get((r.contig, adj), set())) < 2


def test_singleton_share_cross_check(spark):
    """Sum of per-sample singleton counts equals the number of AC==1
    sites in the dosage grid (each such site has exactly one carrier)."""
    from gvcf_hbase_spark.registry import load_all
    from gvcf_hbase_spark.sources.gvcf_text import _dosage_grid

    S = load_all()
    rows = S["gvcf_singleton_share"].fn(spark, SF_DIR).collect()
    assert len(rows) == 4
    d = _dosage_grid(spark, SF_DIR)
    n_ac1 = (
        d.groupBy("contig", "pos")
        .agg(F.sum("alt_n").alias("ac"))
        .filter("ac = 1")
        .count()
    )
    assert sum(r.n_singletons for r in rows) == n_ac1
    for r in rows:
        assert 0 <= r.n_singletons <= r.n_carried
        assert r.singleton_share_1e6 == int(
            r.n_singletons * 1_000_000.0 / r.n_carried + 0.5
        )


def test_ibs_counts_partition_sites(spark):
    """IBS0+IBS1+IBS2 partitions the shared-site count for every pair;
    all C(4,2)=6 pairs appear; scores live in [0, 1e6]; and the score
    formula reproduces from the counts."""
    from gvcf_hbase_spark.registry import load_all

    S = load_all()
    rows = S["gvcf_relatedness_ibs"].fn(spark, SF_DIR).collect()
    assert len(rows) == 6
    assert {(r.sample_a, r.sample_b) for r in rows} == {
        (f"s{i}", f"s{j}") for i in range(4) for j in range(4) if f"s{i}" < f"s{j}"
    }
    for r in rows:
        assert r.ibs0 + r.ibs1 + r.ibs2 == r.n_sites
        assert 0 <= r.ibs_score_1e6 <= 1_000_000
        assert r.ibs_score_1e6 == int(
            (2 * r.ibs2 + r.ibs1) * 1_000_000.0 / (2 * r.n_sites) + 0.5
        )


def test_gvcf_datasource_partitions_and_region_filter(spark):
    """The custom source plans one input split per sample file (4), and
    a region predicate through the source equals the same predicate on
    the JVM-parse path."""
    from gvcf_hbase_spark.registry import load_all
    from gvcf_hbase_spark.sources.gvcf_text import _fixture_lines, parse_gvcf_lines

    S = load_all()
    ds = S["source_gvcf_datasource"].fn(spark, SF_DIR)
    # one input split per part FILE; the fixture writer emits >=1 file
    # per sample dir (4 samples), more when the line DF had many tasks
    import glob as _glob
    from gvcf_hbase_spark.sources.gvcf_datasource import _ensure_fixture_files

    n_files = len(
        _glob.glob(_ensure_fixture_files(spark, SF_DIR) + "/sample_id=*/part-*")
    )
    assert n_files >= 4
    assert ds.rdd.getNumPartitions() == n_files
    region = ds.filter(
        (F.col("contig") == "chr1") & (F.col("start") >= 100) & (F.col("start") <= 500)
    )
    jvm = parse_gvcf_lines(_fixture_lines(spark, SF_DIR, span=9)).filter(
        (F.col("contig") == "chr1") & (F.col("start") >= 100) & (F.col("start") <= 500)
    )
    a = sorted(map(tuple, region.collect()))
    b = sorted(map(tuple, jvm.collect()))
    assert a == b and a
