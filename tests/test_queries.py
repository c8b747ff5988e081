"""t2 mirror: every registered query vs its DuckDB oracle at sf0.01.

This is the same check the driver round runs (row-count + schema +
order-insensitive values), run locally so failures are caught before a
round. Rows-only queries (oracle=None) get the weaker executability check,
plus dedicated semantic tests in their own test modules.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from gvcf_hbase_spark.registry import load_all

SPECS = load_all()

# The default suite keeps a representative oracle smoke (the bench headline
# set — one key per operator family); the full 382-key sweep runs under
# `pytest -m mirror` (r10: the driver's default-suite budget could not fit
# the whole sweep — see pytest.ini). scripts/driver_mirror.py remains the
# standalone full-sweep equivalent and the round ledger records one run.
import bench  # noqa: E402  (repo root is on sys.path via conftest)

_SMOKE = set(bench.HEADLINE)


@pytest.mark.parametrize(
    "key",
    [
        k if k in _SMOKE else pytest.param(k, marks=pytest.mark.mirror)
        for k in sorted(SPECS)
    ],
)
def test_query_vs_oracle(key, spark, oracle, compare):
    spec = SPECS[key]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0, f"[{key}] rows-only query failed to execute"
    else:
        _assert_driver_sortable(key, df)
        compare(df, spec.oracle, key)


def _assert_driver_sortable(key, df):
    """Driver-semantics guard (SURVEY §5.4 hashable-output rule): the
    driver's canonicalizer pandas-sorts raw output columns, and an
    ArrayType/MapType/StructType cell arrives as an unhashable
    numpy.ndarray/dict — the exact ERR that hit agg_collect in r01 and
    fn_array/fn_map_ops in r03. The local mirror's canon_cell is MORE
    lenient (it tuple-izes arrays), so without this guard a nested
    output passes the 400-test suite and dies at the driver. Flatten
    with array_join/concat_ws/to_json before returning."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"[{key}] oracle-checked query returns nested column(s) {bad}; "
        "the driver canonicalizer cannot hash these — flatten to scalars"
    )


def test_driver_sortable_guard_catches_r03_class(spark):
    """The guard must flag the exact shape that ERR'd in r03: an
    array<string> output column (fn_array's pre-fix first3_sorted)."""
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        F.col("id"), F.split(F.lit("a b c"), " ").alias("first3_sorted")
    )
    with pytest.raises(AssertionError, match="first3_sorted"):
        _assert_driver_sortable("synthetic_fn_array", df)
    ok = df.select("id", F.array_join("first3_sorted", ",").alias("first3_sorted"))
    _assert_driver_sortable("synthetic_fn_array_fixed", ok)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs), "oracle_sql keys must be a subset of queries"
    assert len(qs) == len(SPECS)
