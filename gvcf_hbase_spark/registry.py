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
# r06: 291 of 358 keys (CORRECTNESS_r06: 49 hash-green + 1 rows-only-by-design
# on the round-6 window). Round-7 rotation (r06 verdict action 1): the staged
# 61-key never-driver-verified queue's first 50 are promoted to slots 1-50,
# so CORRECTNESS_r07 lifts cumulative coverage 291 -> 341. The round-8
# window is staged EXPLICITLY at slots 51+ (r06 verdict action 6): the
# 11-key queue overflow, then the six round-6 additions, then the
# fourteen round-7 additions (two ANN calibration gauges, ts_ohlc_bars /
# win_drawdown_max / text_bpe_merge_step / dedup_minhash_recall /
# gvcf_phase_by_transmission / text_langid_confusion, and the round-7
# continuation's gvcf_af_spectrum / sim_semdedup_eps_sweep /
# graph_modularity / ts_sax_symbols / anomaly_seasonal_residual /
# dedup_minhash_incremental / profile_drift_psi /
# sim_ivf_nprobe_sweep / graph_assortativity /
# gvcf_sample_missingness / ts_dominant_period /
# curate_tokenizer_fertility / multimodal_audio_vad_segments /
# gvcf_pop_fst) -- 39 keys: r08
# promotes slots 51-100 to the front; the few past slot 100 complete
# at r09 (341 + 39 = 380).
_PRIORITY = [
    # ============== round-7 window (slots 1-50) ==============
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
    # ===== round-8 window queue (39 never-driver-verified, staged) =====
    # 11-key round-7 queue overflow:
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
    # six round-6 additions:
    "win_percentile_running_full",
    "agg_quantiles_multi",
    "text_zipf_slope",
    "curate_gopher_report",
    "ts_kalman_1d",
    "curate_ccnet_buckets",
    # two round-7 additions (ANN calibration gauges):
    "sim_ann_ivf_recall",
    "sim_pq_recall",
    # six further round-7 additions:
    "ts_ohlc_bars",
    "win_drawdown_max",
    "text_bpe_merge_step",
    "dedup_minhash_recall",
    "gvcf_phase_by_transmission",
    "text_langid_confusion",
    # fourteen round-7 continuation additions (oracle-checked ones
    # verified at sf0.001+sf0.01 at build time):
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
]
# Keys NOT listed above (all with a driver verdict from r01-r06) are
# appended by load_all() in module registration order after the queues.
# Every never-driver-verified key is IN the explicit staged lists above;
# the round-8 rotation promotes slots 51-100 to the front; the 9
# staged keys past slot 100 complete driver coverage at r09.

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
