"""sf10 rehearsal (r08 verdict action 2): the next — and in this 128 GiB
sandbox, likely last — decade of scale evidence.

Synthesizes ~sf10 by union-replicating the sf0.1 fixtures 100x into
/tmp/sf10 (~60M-row lineitem, 10M events, 500k docs each with 99 exact
clones, 500k embedding vectors) and runs the heavy families ENGINE-SIDE
ONLY (noop sink — DuckDB oracles are exactly what blows up first at this
scale; the oracle-checked gates live at sf0.001/0.01/0.1/1). Every decade
jump so far found real bugs (r5: 2, r6: 1, r8: 6), so 100 TB claims get
rehearsed, not extrapolated.

Replication scheme: same as scripts/sf1_rehearsal.py (replica-offset fact
keys, dims copied once, events ts nudged +i µs so per-user history grows
100x duplicate-free, documents text identical across replicas). OFF=1e6
still clears every sf0.1 key range; max synthetic key ≈ 1e8.

Process model: each key runs in its OWN subprocess (fresh JVM, driver mem
from SPARK_GRAFT_DRIVER_MEM, default 48g here) with a hard wall timeout —
one heap death or runaway stage can't void the rest of the evidence, and
a timeout is recorded as a result, not a crash.

EXCLUDED (documented, not silent — the no-silent-caps rule):
  - ngram-SSJoin-truth engine paths over the replicated corpus
    (dedup_containment, dedup_ngram_jaccard, dedup_cluster_cc/_lss,
    dedup_canonical_select, curate_segment_dedup, dedup_minhash_recall /
    band_sweep truth sides): shared-gram fanout Σdf² is clone-quadratic —
    ×10⁴ vs sf0.1 by construction of the fixture (measured 290-330 s at
    sf1 ⇒ ~8 h at sf10). Production runs EXACT dedup first (the engine's
    own `dedup_exact` is in this list and is linear), which collapses the
    clones these fixtures deliberately inject; the un-collapsed quadratic
    was exercised at sf1 (MIRROR_sf1_r08).
  - join_geo_grid: radius-join output pairs grow with point density² —
    66.3M pairs at sf1 ⇒ ~6.6B at sf10; the grid plan is the scale answer
    but materializing the pair count IS the workload. Exercised at sf1.
  - sim brute-force tiers (sim_cosine_pairs*, sim_knn_topk/blocked,
    dedup_embedding_cosine, dedup_semantic_centroid): documented as the
    small-side tiers of the dispatch ladder; the celled/ANN tiers that own
    this scale ARE run here.

Usage:
    python scripts/sf10_rehearsal.py [--rebuild] [--keys k1,k2] [--timeout S]
Writes /tmp/sf10_rehearsal.json (and per-key JSONL progress at
/tmp/sf10_rehearsal.progress.jsonl).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF10 = "/tmp/sf10"
SF10HOT = "/tmp/sf10hot"
REPLICAS = 100
OFF = 1_000_000

FACTS = {
    "customer": "c_custkey + {i} * %d AS c_custkey, * EXCLUDE (c_custkey)" % OFF,
    "orders": (
        "o_orderkey + {i} * %d AS o_orderkey, o_custkey + {i} * %d AS o_custkey, "
        "* EXCLUDE (o_orderkey, o_custkey)" % (OFF, OFF)
    ),
    "lineitem": "l_orderkey + {i} * %d AS l_orderkey, * EXCLUDE (l_orderkey)" % OFF,
    "events": (
        "event_id + {i} * %d AS event_id, ts + to_microseconds({i}) AS ts, "
        "* EXCLUDE (event_id, ts)" % OFF
    ),
    "documents": "doc_id + {i} * %d AS doc_id, * EXCLUDE (doc_id)" % OFF,
    "embeddings": "vec_id + {i} * %d AS vec_id, * EXCLUDE (vec_id)" % OFF,
}
DIMS = ["region", "nation", "supplier", "part"]

# Heavy-family keys whose ENGINE cost class is linear / n·log n / banded at
# this fixture's growth directions (rationale per family in the module
# docstring; clone-quadratic engine paths are excluded and documented).
KEYS = [
    # relational / agg backbone at 60M lineitem rows
    "agg_group",
    "q9_product_profit",
    "q5_nation_revenue",
    "agg_median_twophase",
    "agg_quantiles_multi",
    "agg_heavy_hitters",
    "agg_grouping_sets",
    "join_shuffle",
    "join_skew_salted",
    "join_asof",
    "join_point_in_time",
    "topk_global",
    # window family at 10M events / 100x-deep per-user history
    "win_percentile_running_full",
    "win_interval_merge",
    "win_session_rollup",
    "win_frame_time_range",
    "win_carry_forward",
    "win_drawdown_max",
    "win_gaps_islands",
    # timeseries at 10M events
    "ts_downsample_lttb",
    "ts_downsample_m4",
    "ts_holt_winters",
    "ts_resample_interpolate",
    "anomaly_seasonal_residual",
    # streaming batch twins
    "stream_tumbling",
    "stream_session",
    # LLM pipeline: the banded/celled/linear tiers that own 100 TB
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_minhash_incremental",
    "dedup_simhash",
    "sim_knn_ivf",
    "sim_ann_ivf",
    "sim_ann_lsh",
    "sim_pq_adc_topk",
    "sim_ann_hnsw",
    "text_bpe_merge_step",
    "text_tfidf",
    "curate_ccnet_buckets",
    "curate_pack_batches",
    "curate_pipeline_e2e",
    "multimodal_cdc_chunk_dedup",
    "multimodal_audio_vad_segments",
    # graph / gvcf iterative + self-join families
    "graph_pagerank",
    "graph_bipartite_projection",
    "graph_lpa_communities",
    "gvcf_combine",
    "gvcf_genotype_concordance",
    "gvcf_relatedness_ibs",
]


def build_dataset() -> None:
    import duckdb

    con = duckdb.connect()
    for d in (SF10, SF10HOT):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    for t in DIMS:
        shutil.copy(f"{SF01}/{t}.parquet", f"{SF10}/{t}.parquet")
    for t, sel in FACTS.items():
        parts = " UNION ALL ".join(
            f"SELECT {sel.format(i=i)} FROM read_parquet('{SF01}/{t}.parquet')"
            for i in range(REPLICAS)
        )
        con.execute(
            f"COPY ({parts}) TO '{SF10}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 100000)"
        )
    # hot-key variant: the whole 100x event stream on ONE user (the
    # two-heap running median's worst case — a single 10M-row partition)
    parts = " UNION ALL ".join(
        f"SELECT event_id + {i} * {OFF} AS event_id, "
        f"ts + to_microseconds({i}) AS ts, CAST(0 AS BIGINT) AS user_id, "
        f"event_type, value, props FROM read_parquet('{SF01}/events.parquet')"
        for i in range(REPLICAS)
    )
    con.execute(
        f"COPY ({parts}) TO '{SF10HOT}/events.parquet' "
        "(FORMAT PARQUET, ROW_GROUP_SIZE 100000)"
    )
    con.close()


def run_one(key: str, sf_dir: str) -> None:
    """Subprocess entry: run one key engine-only against sf_dir."""
    from gvcf_hbase_spark.registry import load_all
    from gvcf_hbase_spark.session import get_spark

    specs = load_all()
    spark = get_spark("sf10-rehearsal")
    t0 = time.perf_counter()
    specs[key].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(json.dumps({"key": key, "s": round(time.perf_counter() - t0, 2)}))


def main() -> int:
    if "--run-key" in sys.argv:
        i = sys.argv.index("--run-key")
        run_one(sys.argv[i + 1], sys.argv[i + 2])
        return 0

    if "--rebuild" in sys.argv or not os.path.exists(f"{SF10}/lineitem.parquet"):
        t0 = time.perf_counter()
        build_dataset()
        print(json.dumps({"build_s": round(time.perf_counter() - t0, 1)}), flush=True)

    timeout = 1800
    if "--timeout" in sys.argv:
        timeout = int(sys.argv[sys.argv.index("--timeout") + 1])
    keys = KEYS
    if "--keys" in sys.argv:
        keys = sys.argv[sys.argv.index("--keys") + 1].split(",")

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    results: dict[str, float | str] = {}
    progress = open("/tmp/sf10_rehearsal.progress.jsonl", "w", buffering=1)
    runs = [(k, SF10) for k in keys]
    if "win_percentile_running_full" in keys:
        runs.append(("win_percentile_running_full@hotkey", SF10HOT))
    for label, sf in runs:
        key = label.split("@")[0]
        t0 = time.perf_counter()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run-key", key, sf],
                capture_output=True, text=True, timeout=timeout, env=env,
            )
            if p.returncode == 0:
                rec = json.loads(p.stdout.strip().splitlines()[-1])
                results[label] = rec["s"]
            else:
                tail = (p.stderr or p.stdout).strip().splitlines()[-8:]
                results[label] = "ERR rc=%d: %s" % (p.returncode, " | ".join(tail)[:300])
        except subprocess.TimeoutExpired:
            results[label] = f"TIMEOUT >{timeout}s"
        except Exception as e:  # noqa: BLE001 — record, keep going
            results[label] = f"ERR: {type(e).__name__}: {str(e)[:200]}"
        progress.write(json.dumps({label: results[label]}) + "\n")
        print(json.dumps({label: results[label], "wall": round(time.perf_counter() - t0, 1)}), flush=True)
    summary = {
        "sf": 10.0,
        "replicas": REPLICAS,
        "mode": "engine-only (noop sink), one subprocess per key",
        "driver_mem": env["SPARK_GRAFT_DRIVER_MEM"],
        "timeout_s": timeout,
        "errors": {k: v for k, v in results.items() if isinstance(v, str)},
        "times_s": {k: v for k, v in results.items() if not isinstance(v, str)},
    }
    with open("/tmp/sf10_rehearsal.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 1 if summary["errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
