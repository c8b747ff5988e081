"""gVCF block semantics as first-class engine operators (SURVEY §2A).

The reference's core query (A9, `GVCFHBase.scan` — upstream recollection;
local reference checkout was empty) is a stateful pass over key-ordered
HBase rows: maintain each sample's open record (variant or reference
block), and at each position emit the aligned tuple of every sample's
record covering that position. Correctness across parallel scan partitions
is engineered by writing each block once per fixed-size key range it
overlaps (A4), so a partition never needs state from its left neighbor.

Spark-first re-expression — no custom partition-local state at all:

- :func:`expand_blocks` densifies ``[start, end]`` intervals to positions
  (explode(sequence)); the shuffle then realigns by position, which is
  what makes cross-partition blocks a non-problem here.
- :func:`carry_forward` is the sparse alternative: last-non-null window —
  a block's value persists until the next record of the same sample.
- :func:`combine_positions` is the full A9: per-position sample→value map,
  optionally variant-sites-only (A8's onlyVariants flag).

Scale: expansion multiplies rows by mean block length; for long blocks
prefer carry_forward / interval joins (operators/joins.py) which stay
sparse. All three shuffle once on (contig, pos[-range]) or (sample) keys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sample_name_index(
    df: DataFrame, sample_col: str = "sample_id", idx_col: str = "sample_idx"
) -> tuple[DataFrame, DataFrame]:
    """A2: sample-name → dense integer index (upstream `SampleNameIndex`
    maps names to fixed HBase column qualifiers — upstream recollection).

    Returns ``(dim, enriched)``: ``dim`` is the tiny name→index dimension
    (index = 0-based dense rank of the name, deterministic), ``enriched``
    is ``df`` with ``idx_col`` attached via an explicit broadcast join.

    Scale: the dim is one distinct-aggregate over the corpus (sample
    cardinality is thousands, not billions — it's a biobank's sample list),
    then the single-partition ``row_number`` window runs over those few
    thousand rows only, never the fact table. The broadcast join adds no
    shuffle to the fact side. Unlike the reference, the sample count is
    NOT fixed at table-creation time: re-deriving the dim on append is one
    cheap aggregate.
    """
    w = Window.orderBy(sample_col)
    dim = (
        df.select(sample_col)
        .distinct()
        .withColumn(idx_col, (F.row_number().over(w) - 1).cast("int"))
    )
    return dim, df.join(F.broadcast(dim), sample_col)


def split_multiallelic(
    df: DataFrame,
    alt_col: str = "alt",
    idx_col: str = "allele_idx",
    allele_col: str = "allele",
) -> DataFrame:
    """Split multi-allelic variant records (ALT = 'T,G') into one row per
    alternate allele, carrying the 1-based VCF genotype index (GT's '1'
    refers to the first ALT, '2' to the second, …). Reference blocks /
    empty ALT rows are dropped — they carry no alternate allele.

    The canonical VCF normalization step (htsjdk exposes the ALT list
    per VariantContext upstream): pure ``posexplode(split(...))`` — JVM
    codegen, output rows = Σ allele counts, no shuffle at all."""
    return (
        df.filter(F.col(alt_col) != "")
        .select("*", F.posexplode(F.split(F.col(alt_col), ",")).alias("__p", allele_col))
        .withColumn(idx_col, (F.col("__p") + 1).cast("int"))
        .drop("__p")
    )


def expand_blocks(
    df: DataFrame, start: str = "start", end: str = "end", pos_col: str = "pos"
) -> DataFrame:
    """One row per position covered by each ``[start, end]`` interval
    (inclusive both ends, like gVCF blocks)."""
    return df.withColumn(pos_col, F.explode(F.sequence(F.col(start), F.col(end))))


def carry_forward(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Last non-null ``value_col`` so far, per partition in order — the
    open-block lookup. ``order_cols`` must include a unique tiebreaker."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col or f"{value_col}_carried", F.last(value_col, ignorenulls=True).over(w)
    )


def combine_positions(
    intervals: DataFrame,
    contig_col: str = "contig",
    start: str = "start",
    end: str = "end",
    sample_col: str = "sample_id",
    value_col: str = "value",
    variant_col: str | None = None,
    only_variant_sites: bool = False,
    flat: bool = False,
) -> DataFrame:
    """A9: per-position combine across samples.

    Input: one row per record ``(contig, start, end, sample_id, value[,
    is_variant])`` — variants have start == end, reference blocks span.
    Output: ``(contig, pos, samples: map<sample_id, value>, n_samples)``,
    one row per covered position, each map holding every sample whose
    record covers that position (deterministically sorted entries).

    With ``only_variant_sites`` (A8), keep only positions where at least
    one sample's covering record is a variant — but still report *all*
    samples' records at those positions, which is exactly the per-position
    alignment the reference scans for.

    With ``flat``, emit ``samples_flat: string`` — the sorted
    ``sample=value|...`` join — instead of the map. This path is all
    native JVM expressions (concat_ws/sort_array/array_join, no
    higher-order lambdas, no map build), so it codegens tighter; prefer
    it when the consumer wants a fingerprintable/printable row anyway
    (A10's stringify user function is exactly that).
    """
    pos = expand_blocks(intervals, start=start, end=end)
    is_var = (
        F.max(F.col(variant_col).cast("int")).alias("__any_variant")
        if variant_col
        else F.lit(None).alias("__any_variant")
    )
    samples = (
        F.array_join(
            F.sort_array(F.collect_list(F.concat_ws("=", F.col(sample_col), F.col(value_col)))),
            "|",
        ).alias("samples_flat")
        if flat
        else F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col(sample_col), F.col(value_col))))
        ).alias("samples")
    )
    combined = (
        pos.groupBy(contig_col, "pos")
        .agg(
            samples,
            F.count(sample_col).alias("n_samples"),
            is_var,
        )
    )
    if only_variant_sites:
        if not variant_col:
            raise ValueError("only_variant_sites requires variant_col")
        combined = combined.filter(F.col("__any_variant") == 1)
    return combined.drop("__any_variant")
