"""Vector math over ``array<float/double>`` columns — all JVM-side
higher-order functions (F.zip_with / F.aggregate), no Python boundary.

Sequential fold order matches DuckDB's list_* implementations, so doubles
agree to the last ulp in practice; similarity queries still round to 6dp
before comparing/thresholding (SURVEY §5.4).

At 100 TB these expressions run inside codegen per row; for >10^5-vector
corpora pair them with the LSH bucketing in operators/similarity.py so the
pair space, not the arithmetic, is what shrinks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
