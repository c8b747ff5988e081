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
# r07: 341 of 380 keys (CORRECTNESS_r07: 49 hash-green + 1
# rows-only-by-design on the round-7 window). Round-8 rotation (r07 verdict
# action 1): the 39 never-driver-verified keys staged at r07 slots 51-89
# are promoted to slots 1-39, completing 380/380 cumulative driver
# coverage. Slot 40 holds the single round-8 addition
# (dedup_minhash_band_sweep, r07 verdict action 5); slots 41-50 backfill
# with already-verified keys so nothing new can displace completion
# (r07 verdict: "keep any r08 additions BEHIND the staged 39").
_PRIORITY = [
    # ===== round-8 window (slots 1-39: the staged never-driver-verified
    # set, promoted from r07 slots 51-89; completes 380/380 coverage) =====
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
    "win_percentile_running_full",
    "agg_quantiles_multi",
    "text_zipf_slope",
    "curate_gopher_report",
    "ts_kalman_1d",
    "curate_ccnet_buckets",
    "sim_ann_ivf_recall",
    "sim_pq_recall",
    "ts_ohlc_bars",
    "win_drawdown_max",
    "text_bpe_merge_step",
    "dedup_minhash_recall",
    "gvcf_phase_by_transmission",
    "text_langid_confusion",
    "gvcf_af_spectrum",
    "sim_semdedup_eps_sweep",
    "graph_modularity",
    "ts_sax_symbols",
    "anomaly_seasonal_residual",
    "dedup_minhash_incremental",
    "profile_drift_psi",
    "sim_ivf_nprobe_sweep",
    "graph_assortativity",
    "gvcf_sample_missingness",
    "ts_dominant_period",
    "curate_tokenizer_fertility",
    "multimodal_audio_vad_segments",
    "gvcf_pop_fst",
    # slot 40: the one round-8 addition (behind the staged 39 in spirit --
    # the window holds 50, so it still gets a driver verdict this round)
    "dedup_minhash_band_sweep",
    # ===== slots 41-50: backfill with already-verified keys =====
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
    # ===== remainder of the r07 window (all driver-verified r07) =====
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
