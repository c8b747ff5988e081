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


def test_asof_join_directions(spark):
    left = spark.createDataFrame([("x", 10), ("x", 20), ("y", 10)], "k string, t long")
    right = spark.createDataFrame(
        [("x", 5), ("x", 15), ("x", 25)], "k string, rt long"
    )
    back = asof_join(left, right, on="k", left_ts="t", right_ts="rt")
    got = {(r["t"]): r["rt"] for r in back.select(F.col("l.t"), F.col("r.rt")).collect()}
    assert got == {10: 5, 20: 15}  # y has no match -> dropped (inner)

    fwd = asof_join(left, right, on="k", left_ts="t", right_ts="rt", direction="forward")
    got = {(r["t"]): r["rt"] for r in fwd.select(F.col("l.t"), F.col("r.rt")).collect()}
    assert got == {10: 15, 20: 25}

    # boundary: equal timestamps match unless strict
    eq = spark.createDataFrame([("x", 15)], "k string, t long")
    got = asof_join(eq, right, on="k", left_ts="t", right_ts="rt").select(F.col("r.rt")).collect()
    assert [r.rt for r in got] == [15]
    got = asof_join(eq, right, on="k", left_ts="t", right_ts="rt", strict=True).select(
        F.col("r.rt")
    ).collect()
    assert [r.rt for r in got] == [5]
