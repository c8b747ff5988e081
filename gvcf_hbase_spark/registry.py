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
# 50-key PREFIX of the inventory per round. r01–r03 windows earned 146
# distinct driver verdicts; round 4 rotates the window to the cohort with
# NO driver verdict ever (SURVEY §7.4 plan, r03 verdict action 3):
# slots 1–3 the stale-evidence keys (r01 green predates an events-loader
# change), 4–7 the gVCF flagship downstream family (verdict action 5),
# 8–40 the analytics/timeseries/cdc/graphs/linkage modules (entirely
# unverified), 41–48 the heaviest never-benched/never-verified
# multimodal/curation/window/stream keys (including the two scale-shape
# swaps this round so their rewrites earn fresh rows), and 49–50 the two
# r03 driver ERRs (fn_array, fn_map_ops — array outputs flattened this
# round, must re-earn green). The ~48 remaining never-verified keys queue
# immediately after for the round-5 window.
_PRIORITY = [
    # ---- stale evidence (r01 green predates loader change) ----
    "scan_events_ns",
    "win_carry_forward",
    "win_frame_range",
    # ---- gVCF downstream family (reference raison d'être) ----
    "gvcf_allele_freq",
    "gvcf_coverage_depth",
    "gvcf_export_vcf_lines",
    "gvcf_split_multiallelic",
    # ---- analytics module (12) ----
    "funnel_steps",
    "agg_retention_cohort",
    "agg_heavy_hitters",
    "agg_corr_matrix",
    "analytics_event_transitions",
    "agg_weighted_median",
    "agg_entropy",
    "analytics_gini",
    "analytics_ab_ttest",
    "analytics_pareto_share",
    "analytics_pattern_match",
    "analytics_rate_wilson",
    # ---- timeseries module (11) ----
    "ts_resample_interpolate",
    "anomaly_zscore",
    "win_distinct_running",
    "ts_ewma",
    "ts_lag_features",
    "win_rolling_corr",
    "anomaly_cusum",
    "ts_seasonal_decompose",
    "win_streak_longest",
    "anomaly_mad",
    "ts_forecast_seasonal_naive",
    # ---- cdc (3) + graphs (5) + linkage (2) ----
    "cdc_compact_latest",
    "cdc_scd2_intervals",
    "join_point_in_time",
    "graph_triangle_count",
    "graph_pagerank",
    "graph_degree_histogram",
    "graph_bipartite_projection",
    "graph_jaccard_neighbors",
    "join_fuzzy_levenshtein",
    "linkage_best_match",
    # ---- heaviest never-verified multimodal/curation/window/stream ----
    "multimodal_phash_neardup",
    "multimodal_audio_energy",
    "multimodal_byte_histogram",
    "curate_boilerplate_ngrams",
    "curate_budget_select",
    "win_percentile_running",
    "stream_complete_topk",
    "stream_join_stream_outer",
    # ---- r03 driver ERRs, fixed this round (slots 49–50) ----
    "fn_array",
    "fn_map_ops",
    # ================= round-5 window queue (never verified) =================
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
]
# The 66 round-4 additions (analytics_pattern_kleene, stream_pattern_kleene,
# agg_countmin_freq, agg_bloom_membership, text_toxicity_wordlist,
# text_readability, curate_quality_score_lr, ts_autocorr, graph_khop_reach,
# graph_sssp_bounded, analytics_attribution_last_touch,
# dedup_semantic_centroid, fn_datetime_extra, sim_mips_topk,
# text_bpe_regex_tokens, multimodal_scene_cuts, sink_zorder_layout,
# dedup_simhash_recall, agg_share_of_total, win_moving_slope,
# agg_hll_intersection, win_period_growth, curate_interleave_roundrobin,
# geo_haversine_nearest, join_geo_grid, fn_codec_roundtrip,
# agg_listagg_distinct, profile_freshness_lag, gvcf_titv_ratio,
# gvcf_dp_stats, gvcf_block_compression, cdc_snapshot_diff,
# analytics_association_lift, ts_cross_correlation,
# curate_weighted_sample, agg_ks_test, hierarchy_flatten_bounded,
# analytics_chi_square, analytics_mann_whitney, analytics_anova,
# analytics_survival_km, funnel_time_window, analytics_cohort_ltv,
# geo_cell_density, geo_trajectory_length, analytics_rfm_segment,
# graph_clustering_coefficient, ts_changepoint_meanshift,
# ts_downsample_m4, text_collocations_pmi, sim_rp_projection,
# gvcf_hwe_chi2, gvcf_genotype_concordance, gvcf_mendelian_violations,
# sim_kmeans_step, analytics_ols_multi, multimodal_chunk_dedup,
# analytics_cuped, analytics_path_topk, graph_kcore_bounded,
# win_mtd_ytd, profile_pk_fk_inference, fn_cidr_match, gvcf_roh_runs,
# analytics_funnel_summary, curate_dataset_card) are NOT
# listed above: load_all() appends unlisted keys in module order AFTER the
# queue, which is exactly the round-6 tail. Round-5 rotation: promote the
# round-5 queue block (53 keys) to slots 1–50, spill the overflow + these
# 66 to round 6.

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
