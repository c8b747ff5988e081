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


@pytest.mark.parametrize("key", sorted(SPECS))
def test_query_vs_oracle(key, spark, oracle, compare):
    spec = SPECS[key]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0, f"[{key}] rows-only query failed to execute"
    else:
        compare(df, spec.oracle, key)


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
