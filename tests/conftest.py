"""Shared fixtures: one SparkSession, one DuckDB oracle connection, and a
compare() that mirrors the driver's t2 check (row-count + column names +
order-insensitive value comparison) but stricter: exact value equality
after canonicalization, with readable diffs on failure.
"""

from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gvcf_hbase_spark.session import get_spark  # noqa: E402
from gvcf_hbase_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gvcf-hbase-spark-tests")
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canon_cell(v):
    """Canonical (type-family, string) for one cell. Type families are part
    of the comparison: an int on one side and a float on the other is a
    schema bug we want to catch locally (the driver compares schemas too)."""
    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return ("null", "")
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return ("null", "")
        return ("float", repr(f))
    if isinstance(v, (bool, np.bool_)):
        return ("bool", str(bool(v)))
    if isinstance(v, (int, np.integer)):
        return ("int", str(int(v)))
    if isinstance(v, pd.Timestamp):
        return ("datetime", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("datetime", v.isoformat())
    if isinstance(v, datetime.date):
        return ("datetime", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", v.hex())
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("list", "[" + ",".join("%s:%s" % canon_cell(x) for x in v) + "]")
    import decimal

    if isinstance(v, decimal.Decimal):
        # Deliberately a distinct family: a Decimal from DuckDB means the
        # oracle SQL is missing a CAST — fix the SQL, don't paper over it.
        return ("decimal", str(v))
    return (type(v).__name__, str(v))


def canon_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(row[c]) for c in cols)
        for row in pdf[cols].to_dict("records")
    ]
    rows.sort()
    return cols, rows


def compare_frames(spark_df, con, sql, key=""):
    spdf = spark_df.toPandas()
    odf = con.execute(sql).df()
    s_cols, s_rows = canon_rows(spdf)
    o_cols, o_rows = canon_rows(odf)
    assert s_cols == o_cols, f"[{key}] column mismatch: spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"[{key}] row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    if s_rows != o_rows:
        diffs = [
            (i, s, o)
            for i, (s, o) in enumerate(zip(s_rows, o_rows))
            if s != o
        ][:5]
        msg = "\n".join(
            f"  row {i}:\n    spark : {s}\n    oracle: {o}" for i, s, o in diffs
        )
        raise AssertionError(f"[{key}] value mismatch ({len(diffs)}+ rows differ):\n{msg}")


@pytest.fixture(scope="session")
def compare(oracle):
    def _cmp(spark_df, sql, key=""):
        compare_frames(spark_df, oracle, sql, key)

    return _cmp
