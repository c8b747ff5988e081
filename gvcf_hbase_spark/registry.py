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
# r04: 191 of 344 keys. Round-5 rotation (r04 verdict action 1): the staged
# round-5 queue block (53 never-driver-verified keys) is promoted to slots
# 1–53 so CORRECTNESS_r05 verifies 50 of them; the 3-key overflow
# (sink_merge_upsert / sink_partition_stats / sink_secondary_index, slots
# 51–53) heads the round-6 queue, which is now staged EXPLICITLY below
# (r04 verdict action 8): the remaining 100 never-driver-verified keys in
# module order, 103 total for round 6 (+53 rotation at r06 covers 50 more,
# leaving ~53 for round 7 — full driver coverage lands r07). The eight
# round-5 additions (multimodal_cdc_chunk_dedup, ts_downsample_lttb_exact,
# curate_dsir_weights, ts_holt_winters, sql_recursive_cte, sql_udf_scalar,
# feat_woe_encode, analytics_diff_in_diff) enumerate after _PRIORITY via
# load_all()'s registration-order append, i.e. at the round-7 queue tail.
_PRIORITY = [
    # ============== round-5 window (slots 1–50; 51–53 overflow) ==============
    "agg_bool_logic",
    "agg_geometric_mean",
    "agg_histogram",
    "agg_mode_deterministic",
    "agg_rollup",
    "source_csv_corrupt_recovery",
    "source_jsonl_roundtrip",
    "source_orc_roundtrip",
    "source_schema_evolution",
    "source_xml_roundtrip",
    "join_asof_nearest",
    "join_asof_tolerance",
    "join_runtime_bloom",
    "win_frame_time_range",
    "win_gaps_islands",
    "win_interval_merge",
    "win_session_rollup",
    "win_time_weighted_avg",
    "set_except_distinct",
    "join_lateral_topn",
    "agg_bitmap_distinct",
    "fn_bitwise",
    "fn_collation",
    "fn_data_masking",
    "fn_explode_outer",
    "fn_regexp_extract_all",
    "fn_try_arith",
    "fn_url_parse",
    "fn_variant_json",
    "dedup_containment",
    "dedup_incremental",
    "sim_centroid_label",
    "sim_cosine_pairs_blocked",
    "sim_embed_quantize",
    "sim_knn_blocked",
    "text_chunk_sliding",
    "text_keyword_topk",
    "text_ngram_counts",
    "text_normalize",
    "text_unigram_logprob",
    "curate_oversample",
    "curate_shard_balance",
    "curate_winsorize",
    "dedup_canonical_select",
    "profile_table_quality",
    "udf_arrow_batch",
    "udf_arrow_scalar",
    "source_binary_files",
    "join_dpp_partitioned",
    "sink_compact_small_files",
    "sink_merge_upsert",
    "sink_partition_stats",
    "sink_secondary_index",
    # ======= round-6 window queue (100 never-driver-verified, staged) =======
    # (Together with the 3-key overflow above: 103 keys for rounds 6–7.)
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
]
# Keys NOT listed above (all with a driver verdict from r01–r04) are
# appended by load_all() in module registration order after the queues;
# any brand-new round-5 key registers there too and joins the round-7
# tail unless promoted.

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
