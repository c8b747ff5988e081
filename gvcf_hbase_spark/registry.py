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
# 50-key PREFIX of the inventory per round. Cumulative driver verdicts after
# r05: 241 of 352 keys (CORRECTNESS_r05: 50/50 green on the round-5 window).
# Round-6 rotation (r05 verdict action 1): the 3-key round-5 overflow
# (sink_merge_upsert / sink_partition_stats / sink_secondary_index) plus the
# first 47 of the staged never-driver-verified block are promoted to slots
# 1–50, so CORRECTNESS_r06 lifts cumulative coverage 241 → 291. The round-7
# queue (slots 51+) is staged EXPLICITLY below (r05 verdict action 8): the
# remaining 53 staged keys in module order, then the eight round-5 additions
# — 61 keys, of which r07 verifies 50; the 11-key tail plus any round-6
# additions (which enumerate after _PRIORITY via load_all()'s
# registration-order append) complete coverage at r08.
_PRIORITY = [
    # ============== round-6 window (slots 1–50) ==============
    "sink_merge_upsert",
    "sink_partition_stats",
    "sink_secondary_index",
    "agg_listagg_distinct",
    "scan_file_metadata",
    "win_mtd_ytd",
    "sql_pipe_syntax",
    "sql_scripting_vars",
    "sql_parameterized",
    "fn_datetime_extra",
    "fn_codec_roundtrip",
    "fn_cidr_match",
    "fn_aes_roundtrip",
    "dedup_simhash_recall",
    "dedup_semantic_centroid",
    "sim_mips_topk",
    "sim_rp_projection",
    "sim_kmeans_step",
    "sim_pq_adc_topk",
    "text_toxicity_wordlist",
    "text_readability",
    "text_bpe_regex_tokens",
    "text_collocations_pmi",
    "multimodal_scene_cuts",
    "multimodal_chunk_dedup",
    "multimodal_shard_manifest",
    "curate_quality_score_lr",
    "curate_interleave_roundrobin",
    "profile_freshness_lag",
    "curate_weighted_sample",
    "profile_pk_fk_inference",
    "curate_dataset_card",
    "curate_segment_dedup",
    "curate_epoch_shuffle",
    "curate_url_dedup",
    "analytics_pattern_kleene",
    "analytics_attribution_last_touch",
    "agg_share_of_total",
    "win_period_growth",
    "analytics_association_lift",
    "agg_ks_test",
    "funnel_time_window",
    "analytics_cohort_ltv",
    "analytics_rfm_segment",
    "analytics_ols_multi",
    "analytics_cuped",
    "analytics_path_topk",
    "analytics_funnel_summary",
    "analytics_shapley_attribution",
    "analytics_decay_score",
    # ======= round-7 window queue (61 never-driver-verified, staged) =======
    # 53 remaining staged keys in module order + the 8 round-5 additions.
    "analytics_dau_wau",
    "agg_median_twophase",
    "analytics_chi_square",
    "analytics_mann_whitney",
    "analytics_anova",
    "analytics_survival_km",
    "stats_bh_fdr",
    "stats_bootstrap_ci",
    "feat_rank_bucketize",
    "feat_standard_scale",
    "feat_frequency_encode",
    "feat_hashing_trick",
    "feat_target_encode_loo",
    "ts_autocorr",
    "win_moving_slope",
    "ts_cross_correlation",
    "ts_changepoint_meanshift",
    "ts_downsample_m4",
    "ts_downsample_lttb",
    "linkage_golden_record",
    "cdc_snapshot_diff",
    "graph_khop_reach",
    "graph_sssp_bounded",
    "hierarchy_flatten_bounded",
    "graph_clustering_coefficient",
    "graph_kcore_bounded",
    "graph_resource_allocation",
    "graph_lpa_communities",
    "agg_countmin_freq",
    "agg_bloom_membership",
    "agg_hll_intersection",
    "geo_haversine_nearest",
    "join_geo_grid",
    "geo_cell_density",
    "geo_trajectory_length",
    "geo_polygon_contains",
    "geo_geohash_encode",
    "udtf_analyze_dynamic",
    "stream_pattern_kleene",
    "gvcf_titv_ratio",
    "gvcf_dp_stats",
    "gvcf_block_compression",
    "gvcf_hwe_chi2",
    "gvcf_genotype_concordance",
    "gvcf_mendelian_violations",
    "gvcf_roh_runs",
    "gvcf_variant_density",
    "gvcf_callable_regions",
    "gvcf_singleton_share",
    "gvcf_relatedness_ibs",
    "source_gvcf_datasource",
    "sink_zorder_layout",
    "sink_write_audit_publish",
    "sql_recursive_cte",
    "sql_udf_scalar",
    "feat_woe_encode",
    "analytics_diff_in_diff",
    "curate_dsir_weights",
    "ts_holt_winters",
    "multimodal_cdc_chunk_dedup",
    "ts_downsample_lttb_exact",
]
# Keys NOT listed above (all with a driver verdict from r01–r05) are
# appended by load_all() in module registration order after the queues.
# The six round-6 additions (win_percentile_running_full,
# agg_quantiles_multi, text_zipf_slope, curate_gopher_report,
# ts_kalman_1d, curate_ccnet_buckets) land in that tail — together with
# the 11-key _PRIORITY overflow (slots 101–111) they form the round-8
# window (17 keys) that completes full driver coverage.

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
