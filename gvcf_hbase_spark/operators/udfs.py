"""User-defined function surface (SURVEY §2B.11): vectorized scalar
pandas UDF, grouped-map UDAF (applyInPandas), and a Python UDTF.

These are the *sanctioned* Python escape hatches — Arrow-batched, never
row-at-a-time. Each query here is deliberately SQL-replicable so the
oracle can check the full Python↔JVM round trip, not just row counts.
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf, udtf

from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table


def make_normalize_text_udf():
    """Arrow-batched text normalizer (the dedup normalizer, Python side):
    lower + trim + collapse whitespace. Built lazily — pandas_udf needs an
    active SparkContext to parse its return type."""

    @pandas_udf("string")
    def normalize_text_udf(s: pd.Series) -> pd.Series:
        return s.str.lower().str.strip().map(lambda x: re.sub(" +", " ", x))

    return normalize_text_udf


@register(
    "udf_scalar",
    oracle="""
    SELECT doc_id,
           lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS norm_text,
           length(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS norm_len
    FROM documents
    """,
    tags=("udf",),
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF over Arrow batches. The oracle is the
    pure-SQL twin — checking the Python path produces byte-identical
    strings."""
    d = load_table(spark, sf_dir, "documents")
    norm_udf = make_normalize_text_udf()
    return d.select(
        "doc_id",
        norm_udf("text").alias("norm_text"),
        F.length(norm_udf("text")).alias("norm_len"),
    )


@register(
    "udaf_grouped",
    oracle="""
    SELECT label, i AS dim,
           round(avg(e), 6) AS centroid_val
    FROM (SELECT label,
                 unnest(CAST(embedding AS DOUBLE[])) AS e,
                 unnest(range(1, 65)) AS i
          FROM embeddings)
    GROUP BY label, i
    """,
    tags=("udf",),
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via applyInPandas: per-label embedding centroid,
    emitted long-form (label, dim, value) so the oracle compares scalars.
    numpy computes per-dim means on each Arrow batch group."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("emb")
    )

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["emb"].values)
        means = mat.mean(axis=0)
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "dim": range(1, len(means) + 1),
                "centroid_val": [round(v, 6) for v in means],
            }
        )

    return e.groupBy("label").applyInPandas(
        centroid, schema="label int, dim int, centroid_val double"
    )


class ShinglesUDTF:
    """Python UDTF: emit 3-token shingles with positions for one document.
    The table-function analog of functions.textfns.shingles. Wrapped with
    @udtf lazily (needs an active session for the return type)."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        toks = text.split(" ")
        for i in range(len(toks) - 2):
            yield doc_id, i, " ".join(toks[i : i + 3])


@register(
    "udtf_shingles",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, sh AS shingle
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(l) - 2, 0) + 1),
                                   i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS sh,
             unnest(range(1, greatest(len(l) - 2, 0) + 1)) AS i
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
    """,
    tags=("udf",),
)
def udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF applied laterally per document row."""
    spark.udtf.register(
        "shingles_udtf", udtf(ShinglesUDTF, returnType="doc_id bigint, pos int, shingle string")
    )
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__docs_for_udtf")
    return spark.sql(
        "SELECT s.doc_id, s.pos, s.shingle "
        "FROM __docs_for_udtf d, LATERAL shingles_udtf(d.doc_id, d.text) s"
    )


@register(
    "udf_arrow_scalar",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
             AS n_vowels,
           CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS BIGINT)
             AS n_alpha_space
    FROM documents
    """,
    tags=("udf",),
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED regular Python UDF (``useArrow=True``, Spark 4) —
    the third UDF tier next to pandas UDFs and row-at-a-time pickling:
    the author writes per-value Python, the engine batches transfer over
    Arrow. Still slower than a pandas UDF's columnar body (the lambda
    runs per value), so the engine's guidance stands: pandas UDF for hot
    paths, useArrow for ergonomics on warm paths, never a pickled UDF.
    The oracle is the pure-SQL twin, checking the whole round trip."""
    d = load_table(spark, sf_dir, "documents")
    n_vowels = F.udf(
        lambda s: sum(c in "aeiou" for c in s), "bigint", useArrow=True
    )
    n_alpha_space = F.udf(
        lambda s: sum(c.isalpha() or c == " " for c in s.lower()), "bigint", useArrow=True
    )
    return d.select(
        "doc_id",
        n_vowels("text").alias("n_vowels"),
        n_alpha_space("text").alias("n_alpha_space"),
    )


@register(
    "udf_arrow_batch",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT) AS text_chars,
           CAST(len(string_split(text, ' ')) AS INT) AS n_fields
    FROM documents
    """,
    tags=("udf",),
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the lowest-overhead Python boundary: raw pyarrow
    RecordBatches in and out, no pandas conversion at all. The body runs
    pyarrow.compute kernels (C++), so the Python layer only routes
    batches — the right tier when the logic is expressible in Arrow
    kernels and the pandas materialization of mapInPandas is measurable
    overhead (wide binary/string columns). Oracle is the pure-SQL twin."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches):
        for batch in batches:
            text = batch.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.cast(pc.utf8_length(text), pa.int32()),
                    pc.cast(
                        pc.add(pc.count_substring(text, " "), 1), pa.int32()
                    ),
                ],
                ["doc_id", "text_chars", "n_fields"],
            )

    return d.mapInArrow(gen, "doc_id long, text_chars int, n_fields int")


class SplitFirstNUDTF:
    """Python UDTF with a DYNAMIC output schema: ``analyze()`` runs at
    plan time and derives the column list from the constant ``n``
    argument — the Spark 4 mechanism behind polymorphic table functions
    (wide-format exploders, schema-from-config readers). ``eval`` pads
    missing positions with '' to match SQL ``split_part`` semantics."""

    @staticmethod
    def analyze(doc_id, text, n):
        from pyspark.sql.types import LongType, StringType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        k = int(n.value)
        return AnalyzeResult(
            schema=StructType(
                [StructField("doc_id", LongType())]
                + [StructField(f"tok{i}", StringType()) for i in range(k)]
            )
        )

    def eval(self, doc_id, text, n):
        toks = text.split(" ")
        yield tuple(
            [doc_id] + [(toks[i] if i < len(toks) else "") for i in range(n)]
        )


@register(
    "udtf_analyze_dynamic",
    oracle="""
    SELECT doc_id,
           split_part(text, ' ', 1) AS tok0,
           split_part(text, ' ', 2) AS tok1,
           split_part(text, ' ', 3) AS tok2
    FROM documents
    """,
    tags=("udf",),
)
def udtf_analyze_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-schema Python UDTF: the output columns (tok0..tok2) exist
    only because ``analyze()`` saw the literal 3 at PLAN time — no
    returnType is declared at registration. The oracle is the static
    split_part twin, proving the planned schema and per-row padding
    semantics. Same lateral-join scale shape as `udtf_shingles`: the
    UDTF runs Arrow-batched per partition, no shuffle introduced."""
    spark.udtf.register("split_first_n", udtf(SplitFirstNUDTF))
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__docs_for_dyn_udtf")
    return spark.sql(
        "SELECT s.doc_id, s.tok0, s.tok1, s.tok2 "
        "FROM __docs_for_dyn_udtf d, LATERAL split_first_n(d.doc_id, d.text, 3) s"
    )
