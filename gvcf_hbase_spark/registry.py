"""Query registry — the single source of truth for the engine's operator
inventory (SURVEY §2B).

Each operator module registers its queries with :func:`register`; the
driver contract file ``__spark_entry__.py`` re-exports the registry as
``queries()`` / ``oracle_sql()``. Keeping the Spark plan and its DuckDB
oracle SQL side by side in the operator module is deliberate: the §5.4
determinism rules (identical aliases, identical rounding, µs-or-coarser
timestamps) are much easier to hold when both sides are written together.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: str | None  # None => driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}

# Operator modules that register queries on import, in SURVEY §7.1
# milestone order.
_MODULES = [
    "gvcf_hbase_spark.operators.relational",
    "gvcf_hbase_spark.operators.joins",
    "gvcf_hbase_spark.operators.windows",
    "gvcf_hbase_spark.operators.setops",
    "gvcf_hbase_spark.operators.subqueries",
    "gvcf_hbase_spark.operators.scalar_fns",
    "gvcf_hbase_spark.operators.dedup",
    "gvcf_hbase_spark.operators.similarity",
    "gvcf_hbase_spark.operators.text",
    "gvcf_hbase_spark.operators.multimodal",
    "gvcf_hbase_spark.operators.curation",
    "gvcf_hbase_spark.operators.analytics",
    "gvcf_hbase_spark.operators.stats",
    "gvcf_hbase_spark.operators.features",
    "gvcf_hbase_spark.operators.timeseries",
    "gvcf_hbase_spark.operators.linkage",
    "gvcf_hbase_spark.operators.cdc",
    "gvcf_hbase_spark.operators.graphs",
    "gvcf_hbase_spark.operators.sketches",
    "gvcf_hbase_spark.operators.geo",
    "gvcf_hbase_spark.operators.udfs",
    "gvcf_hbase_spark.streaming.batch_twins",
    "gvcf_hbase_spark.streaming.stream_ops",
    "gvcf_hbase_spark.sources.gvcf_text",
    "gvcf_hbase_spark.sources.gvcf_datasource",
    "gvcf_hbase_spark.sources.binary_files",
    "gvcf_hbase_spark.plans.layout",
]


def register(key: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add ``fn(spark, sf_dir) -> DataFrame`` to the inventory."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = QuerySpec(key=key, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


# Driver-facing enumeration order. The correctness harness verifies only a
# 50-key PREFIX of the inventory per round.
#
# STANDING ROTATION POLICY (r08 verdict action 1 -- permanent; every round
# self-rotates by this rule):
#   1. changed-since-verdict first: any key whose implementation or oracle
#      changed AFTER its newest driver verdict goes in slots 1..c, so the
#      hard signal never describes code that no longer exists;
#   2. never-driver-verified next (new keys added this round);
#   3. oldest-verdict-first fills the remaining slots (ties broken by key
#      name for determinism), keeping the cumulative 381/381 coverage
#      fresh instead of letting the oldest tail go stale.
# Slots 51+ stage the NEXT-oldest tail so the next rotation is mechanical.
#
# Round-9 window: slots 1-19 are the changed-since-verdict set -- the six
# keys rewritten by the r08 sf1 scale fixes (q5_nation_revenue,
# graph_pagerank [rewritten again r09 as fixed-point], win_interval_merge,
# ts_downsample_lttb, join_geo_grid, hierarchy_flatten_bounded), the r09
# deterministic-banding oracle rewrite (dedup_minhash_incremental), the
# rep-collapsed gauge/CC oracles (dedup_minhash_recall,
# dedup_minhash_band_sweep, dedup_cluster_cc, dedup_cluster_cc_lss,
# dedup_canonical_select), the stream_session oracle tiebreak, the scoped
# recursion-limit rewrite (sql_recursive_cte), and the sf10-rehearsal ANN
# fixes (sim_knn_ivf, sim_ann_ivf, sim_ann_lsh, sim_ann_ivf_recall,
# sim_ivf_nprobe_sweep). Slots 20-50: oldest-verdict-first (latest=r01).
_PRIORITY = [
    # ===== round-9 window: slots 1-19 changed-since-verdict =====
    "q5_nation_revenue",
    "graph_pagerank",
    "win_interval_merge",
    "ts_downsample_lttb",
    "join_geo_grid",
    "hierarchy_flatten_bounded",
    "dedup_minhash_incremental",
    "dedup_minhash_recall",
    "dedup_minhash_band_sweep",
    "dedup_cluster_cc",
    "dedup_cluster_cc_lss",
    "dedup_canonical_select",
    "stream_session",
    "sql_recursive_cte",
    "sim_knn_ivf",
    "sim_ann_ivf",
    "sim_ann_lsh",
    "sim_ann_ivf_recall",
    "sim_ivf_nprobe_sweep",
    # ===== slot 20: never-driver-verified (r09 addition) =====
    "sim_ann_hnsw",
    # ===== slots 21-50: oldest-verdict-first (latest=r01) =====
    "agg_approx_distinct",
    "agg_arg_minmax",
    "agg_conditional",
    "agg_cube",
    "agg_distinct",
    "agg_global",
    "agg_group",
    "agg_grouping_sets",
    "agg_hll_sketch_merge",
    "agg_percentile",
    "agg_pivot",
    "agg_stats",
    "distinct_rows",
    "filter_conj",
    "filter_variant_sites",
    "join_anti",
    "join_broadcast",
    "join_cross",
    "join_full",
    "join_interval",
    "join_left",
    "join_null_safe",
    "join_range_bucketed",
    "join_right",
    "join_semi",
    "join_shuffle",
    "join_skew_salted",
    "limit_offset",
    "project_expr",
    "scan_full",
    # ===== slots 51-91: staged next-oldest (41 keys) for the r10 rotation =====
    "scan_project",
    "scan_range_key",
    "sort_multi",
    "source_csv_inline",
    "source_json_props",
    "topk_global",
    "topk_keyset_page",
    "win_expand_blocks",
    "win_frame_rows",
    "win_lag_lead",
    "win_ntile_pct",
    "win_rank",
    "win_topk_group",
    "agg_approx_percentile",
    "agg_collect",
    "agg_time_rollup",
    "curate_pack_batches",
    "curate_pipeline_e2e",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "gvcf_combine",
    "gvcf_encode_roundtrip",
    "join_asof",
    "join_asof_forward",
    "join_theta",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_join",
    "multimodal_resize",
    "set_union_all",
    "sim_cosine_pairs",
    "sim_knn_topk",
    "sink_bucketed_join",
    "sink_bulk_put",
    "sink_hive_partitioned",
    "source_gvcf_lines",
    "stream_dedup",
    "stream_foreach_batch_upsert",
]
# Keys NOT listed above (all with a driver verdict from r01-r07) are
# appended by load_all() in module registration order after the window.
# After the r08 rotation every key in the inventory has either a driver
# verdict already or a slot inside the r08 50-key window.

_loaded = False


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent), reorder the inventory to
    the driver-facing priority order, and return it."""
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            importlib.import_module(mod)
        ordered = {k: QUERIES[k] for k in _PRIORITY if k in QUERIES}
        ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
        QUERIES.clear()
        QUERIES.update(ordered)
        _loaded = True
    return QUERIES
