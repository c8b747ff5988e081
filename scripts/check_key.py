"""Spot-check ONE registered key against its DuckDB oracle.

Same comparator discipline as scripts/driver_mirror.py (row count +
sorted-column schema + order-insensitive value hash) but for a single
key, so an operator edit can be verified in seconds instead of re-running
the full 366-key mirror. Usage:

    python scripts/check_key.py <key> [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    key = sys.argv[1]
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName(f"check-{key}")
        .config("spark.driver.memory", os.environ.get("SPARK_MIRROR_DRIVER_MEM", "4g"))
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from gvcf_hbase_spark.registry import load_all

    spec = load_all()[key]
    rc = 0
    for sf_dir in sf_dirs:
        t0 = time.time()
        sdf = spec.fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if spec.oracle is None:
            print(f"{key} @ {sf_dir}: rows={len(sdf)} spark={t_spark:.2f}s (rows-only op)")
            continue
        con = duckdb.connect()
        for t in ("region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"):
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        t0 = time.time()
        odf = con.execute(spec.oracle).fetchdf()
        t_oracle = time.time() - t0

        def canon(df: pd.DataFrame) -> pd.Series:
            df = df[sorted(df.columns)]
            return pd.util.hash_pandas_object(
                df.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values(ignore_index=True),
                index=False,
            )

        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_vals = ok_rows and ok_cols and canon(sdf).sum() == canon(odf).sum()
        status = "MATCH" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"{key} @ {sf_dir}: {status} rows={len(sdf)}/{len(odf)} "
            f"cols_ok={ok_cols} spark={t_spark:.2f}s oracle={t_oracle:.2f}s"
        )
        if status == "FAIL":
            rc = 1
            print("  spark cols:", sorted(sdf.columns))
            print("  oracle cols:", sorted(odf.columns))
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
