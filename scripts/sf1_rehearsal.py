"""sf1 rehearsal (r06 verdict action 7): one more decade of scale evidence.

Synthesizes an ~sf1 dataset by union-replicating the sf0.1 fixtures 10x
into /tmp/sf1 (no new generator; DuckDB does the replication) and runs the
heaviest registered keys ENGINE-SIDE ONLY (noop sink, no oracle — DuckDB
brute-force oracles are exactly what blows up first at this scale). Each
past decade jump surfaced a real engine bug (int64 overflow at sf0.1,
-0.0 hash drift, driver-heap sizing), so 100x claims get rehearsed, not
extrapolated.

Replication scheme (referential integrity preserved, OFFSET=1e6 clears
every fixture key range):
  - facts get replica-offset keys: customer.c_custkey, orders.o_orderkey/
    o_custkey, lineitem.l_orderkey, events.event_id, documents.doc_id,
    embeddings.vec_id
  - events keeps user_id UNCHANGED and nudges ts by +i microseconds: the
    per-user history grows 10x (the hot-key direction windows care about)
    and stays duplicate-timestamp-free
  - documents keeps text identical across replicas: every doc gains 9
    exact/near clones — the worst-case dedup stress, 45 clone-pairs per
    original
  - dims (region/nation/supplier/part) copy once: replicating a dim's PK
    would multiply every dim join
Additionally /tmp/sf1hot holds an events table with ALL ~1M rows on ONE
user_id — the single-hot-key stress for the two-heap running median.

Usage: python scripts/sf1_rehearsal.py [--rebuild]
Writes /tmp/sf1_rehearsal.json and prints one JSON line per key.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"
SF1HOT = "/tmp/sf1hot"
REPLICAS = 10
OFF = 1_000_000

# (table, select-list template; {i} = replica index)
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

# The heaviest shapes by family (r06 verdict's list + the iteratives):
# every key that a 100 TB deployment would worry about first.
HEAVY_KEYS = [
    "dedup_containment",
    "dedup_near_minhash",
    "curate_segment_dedup",
    "multimodal_cdc_chunk_dedup",
    "graph_bipartite_projection",
    "graph_pagerank",
    "graph_kcore_bounded",
    "gvcf_genotype_concordance",
    "curate_ccnet_buckets",
    "win_percentile_running_full",
    "sim_knn_topk",
    # r07 additions: the LSH confusion gauge (its SSJoin truth side is the
    # worst-case grower under the 10x exact-clone replication — every doc
    # gains 9 clones, so shared-gram rows scale ~100x vs sf0.1), and the
    # BPE merge round (expected ~FLAT vs sf0.1: pair extraction rides the
    # vocabulary, which clone-replication leaves unchanged)
    "dedup_minhash_recall",
    "text_bpe_merge_step",
    # r07 continuation: the SemDeDup threshold sweep (embeddings gain 10x
    # exact clones -> each centroid cell grows 10x, the cell-local matmul
    # 100x — the documented oversized-cell hazard, exercised) and the
    # modularity gauge (rides the LPA label dataflow at 10x nodes)
    "sim_semdedup_eps_sweep",
    "graph_modularity",
    # r07 continuation batch 2: incremental near-dup (banded index vs the
    # clone-exploded batch — candidate rows scale ~100x like the other
    # SSJoin-truth ops) and the payload-heavy VAD segmentation (one Arrow
    # pass over 10x binary frames)
    "dedup_minhash_incremental",
    "multimodal_audio_vad_segments",
]


def build_dataset() -> None:
    import duckdb

    con = duckdb.connect()
    for d in (SF1, SF1HOT):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    for t in DIMS:
        shutil.copy(f"{SF01}/{t}.parquet", f"{SF1}/{t}.parquet")
    for t, sel in FACTS.items():
        parts = " UNION ALL ".join(
            f"SELECT {sel.format(i=i)} FROM read_parquet('{SF01}/{t}.parquet')"
            for i in range(REPLICAS)
        )
        con.execute(
            f"COPY ({parts}) TO '{SF1}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 100000)"
        )
    # hot-key variant: the whole 10x event stream on ONE user
    parts = " UNION ALL ".join(
        f"SELECT event_id + {i} * {OFF} AS event_id, "
        f"ts + to_microseconds({i}) AS ts, CAST(0 AS BIGINT) AS user_id, "
        f"event_type, value, props FROM read_parquet('{SF01}/events.parquet')"
        for i in range(REPLICAS)
    )
    con.execute(
        f"COPY ({parts}) TO '{SF1HOT}/events.parquet' "
        "(FORMAT PARQUET, ROW_GROUP_SIZE 100000)"
    )
    con.close()


def main() -> int:
    if "--rebuild" in sys.argv or not os.path.exists(f"{SF1}/lineitem.parquet"):
        t0 = time.perf_counter()
        build_dataset()
        print(json.dumps({"build_s": round(time.perf_counter() - t0, 1)}))

    from gvcf_hbase_spark.registry import load_all
    from gvcf_hbase_spark.session import get_spark

    specs = load_all()
    spark = get_spark("sf1-rehearsal")
    results: dict[str, float | str] = {}
    runs = [(k, SF1) for k in HEAVY_KEYS if k in specs]
    runs.append(("win_percentile_running_full@hotkey", SF1HOT))
    for label, sf in runs:
        key = label.split("@")[0]
        t0 = time.perf_counter()
        try:
            specs[key].fn(spark, sf).write.format("noop").mode("overwrite").save()
            results[label] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001 — record, keep going
            results[label] = f"ERR: {type(e).__name__}: {str(e)[:200]}"
        print(json.dumps({label: results[label]}), flush=True)
    summary = {
        "sf": 1.0,
        "replicas": REPLICAS,
        "errors": {k: v for k, v in results.items() if isinstance(v, str)},
        "times_s": {k: v for k, v in results.items() if not isinstance(v, str)},
    }
    with open("/tmp/sf1_rehearsal.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 1 if summary["errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
