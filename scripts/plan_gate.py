"""Executable plan-ledger gate (r08 verdict action 6).

The plan-digest ledger (PLANS_r{N}.json, written by scripts/plan_digest.py)
was being diffed by eye between rounds; this script makes the diff a
mechanical gate. It exits nonzero on:

  1. a key whose NEW digest contains a CartesianProduct the OLD one
     didn't (cart regressions are never acceptable);
  2. a key that gained a Python stage (py 0 -> >0) without an allowlist
     entry — the Arrow/pandas tier is declared, so a JVM-only op silently
     falling to Python is a plan regression;
  3. ANY other per-key digest change without an allowlist entry — an
     intentional plan improvement must be recorded below with a reason, so
     a future round can't miss a real regression the way a cache artifact
     was nearly missed by eye in r08.

Removed keys are reported as failures too (the inventory is append-only);
added keys are reported but pass (inventory growth).

Usage:
    python scripts/plan_gate.py OLD.json NEW.json

The committed-ledger pytest (tests/test_plans.py) runs this gate over the
two newest PLANS_r*.json in the repo root, so `pytest` fails if a round
commits a ledger whose diff vs the prior round is not fully allowlisted.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

# key -> reason. An entry admits ANY digest change for that key for the
# one round-pair being gated; prune entries when the round they describe
# has been judged (stale entries would mask future regressions).
ALLOWED_CHANGES: dict[str, str] = {
    # r08 -> r09 intentional changes:
    "sql_recursive_cte": (
        "r09 (optimization round): the raised cteRecursionRowLimit moved "
        "from a scoped mid-query mutation + eager-checkpoint workaround to "
        "a declared session.RUNTIME_CONFS posture, so the recursion is lazy "
        "again and the bench clocks it; digest regains the UnionLoop "
        "exchange (xh 0->1) the eager checkpoint had hidden"
    ),
    "dedup_minhash_band_sweep": (
        "r09: grid materialized via localCheckpoint so the three persisted "
        "relations can be unpersisted before return (ADVICE r08)"
    ),
    "dedup_minhash_incremental": (
        "r09: switched to portable md5-prefix signatures + raw band-value "
        "joins so the DuckDB oracle reproduces the banding deterministically "
        "(r08 verdict action 4); optimization round then replaced the "
        "persist + eager-result-checkpoint + unpersist dance with one lazy "
        "shingle localCheckpoint — the screen executes on the query clock "
        "again, so the digest regains its real exchanges (xh 0->2, bc 0->3)"
    ),
    "dedup_minhash_recall": (
        "r09: the r08 ledger carried an InMemoryRelation boundary from the "
        "band sweep's persist leaking into the digest session; the sweep now "
        "unpersists, so recall's digest reverts to its true plan; "
        "optimization round then added the _confusion_row one-compute "
        "boundary (truth/pred localCheckpoint) — the doubled truth/pred "
        "subtrees leave the digest (xh 8->2, bc 6->2)"
    ),
    "win_interval_merge": (
        "r08 fix surfacing: PLANS_r08.json was generated BEFORE commit "
        "97c9e18 landed dedup-before-merge (the DuckDB window-wobble fix), "
        "which adds one distinct exchange; fresh-session replan confirms "
        "xh=2 is the true committed plan"
    ),
    "join_geo_grid": (
        "r08 fix surfacing: PLANS_r08.json predates commit 97c9e18's "
        "shuffle_hash pin (broadcast of the full point side timed out at "
        "sf1); bc 1->0 + xh 0->2 IS that fix, confirmed by fresh replan"
    ),
    "sim_knn_ivf": (
        "r09 sf10-rehearsal fix: per-cell chunked-BLAS top-k via "
        "applyInPandas replaces the cell equi-join + row-per-pair scorer "
        "(timeout at 500k vectors); bc 1->0, +1 exchange/sort for the "
        "groupBy(cell) stage"
    ),
    "sim_ann_ivf": (
        "r09 sf10-rehearsal fix: per-cell chunked-BLAS pair scoring "
        "replaces the cell equi-join + _verify_pairs id-joins; py 4->2, "
        "bc 3->0"
    ),
    "sim_ann_lsh": (
        "r09 sf10-rehearsal fix: per-bucket chunked-BLAS pair scoring + "
        "adaptive table depth replace the bucket equi-join + _verify_pairs; "
        "py 4->2, bc 3->0"
    ),
    "sim_ann_ivf_recall": (
        "r09: rides knn_topk_ivf's rewrite (one broadcast fewer on the "
        "pred side); optimization round adds the _confusion_row one-compute "
        "boundary — exact-KNN truth and IVF pred each plan once instead of "
        "twice (py 8->0 in the digest: both sides now sit behind their "
        "checkpoint, the Arrow stages still run inside it)"
    ),
    # r09 optimization round — one-compute boundaries (each key's duplicated
    # expensive subtree now materializes once behind a lazy localCheckpoint;
    # oracle-verified MATCH at sf0.001/sf0.01, headline keys also at sf0.1):
    "dedup_simhash_recall": (
        "r09 optimization: inline confusion reduce replaced by the shared "
        "_confusion_row helper — the near-minhash truth pipeline plans once "
        "instead of twice (xh 10->2, bc 10->2)"
    ),
    "multimodal_phash_neardup": (
        "r09 optimization: signature mapInPandas consumed 4x (band join + "
        "both hamming-verify sides) now computes once behind a lazy "
        "checkpoint (py 4->0 in the digest; the Arrow pass runs inside the "
        "checkpointed RDD); bench 1.19 -> 0.46 s at sf0.1"
    ),
    "sim_pq_recall": (
        "r09 optimization: _confusion_row one-compute boundary — the exact "
        "L2 scoring pass and the ADC pred each plan once instead of twice "
        "(py 6->0 in the digest, stages run inside the checkpoint)"
    ),
    "sim_ivf_nprobe_sweep": (
        "r09 optimization: _confusion_row checkpoints per grid point — the "
        "rank-masked pred windows plan once instead of twice per nprobe "
        "(xh 16->8, sort 24->8)"
    ),
    "gvcf_relatedness_ibs": (
        "r09 optimization: the thinned dosage grid materializes once behind "
        "a lazy checkpoint instead of re-running grid+thin on both pair "
        "sides (xh 3->1, bc 3->1); bench 1.45 -> 0.75 s at sf0.1"
    ),
    "profile_drift_psi": (
        "r09 optimization: the decile table and the bucket counts (both "
        "#event_types-sized) checkpoint lazily once instead of re-running "
        "the percentile and bucketing passes per consumer (xh 6->4, "
        "bc 9->1); bench 0.98 -> 0.18 s at sf0.1"
    ),
    "curate_segment_dedup": (
        "r09 optimization: the per-doc spine derives from the token array "
        "instead of the segment explode, and the explode materializes once "
        "for its two remaining consumers (xh 3->2)"
    ),
}


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def gate(old: dict, new: dict) -> tuple[list[str], list[str]]:
    """Return (failures, notes)."""
    fails: list[str] = []
    notes: list[str] = []
    op, np_ = old["plans"], new["plans"]

    for key in sorted(set(op) | set(np_)):
        o, n = op.get(key), np_.get(key)
        if o is None:
            notes.append(f"ADDED {key}: {n}")
            if isinstance(n, dict) and n.get("cart", 0) > 0:
                fails.append(f"{key}: NEW key planned with CartesianProduct: {n}")
            continue
        if n is None:
            fails.append(f"{key}: REMOVED from ledger (inventory is append-only)")
            continue
        if o == n:
            continue
        # digest changed — classify
        if isinstance(n, dict) and isinstance(o, dict):
            if n.get("cart", 0) > o.get("cart", 0):
                fails.append(f"{key}: CartesianProduct regression {o} -> {n}")
                continue
            if n.get("py", 0) > 0 and o.get("py", 0) == 0 and key not in ALLOWED_CHANGES:
                fails.append(f"{key}: gained a Python stage outside the declared tier {o} -> {n}")
                continue
        if key in ALLOWED_CHANGES:
            notes.append(f"ALLOWED {key}: {o} -> {n} ({ALLOWED_CHANGES[key]})")
        else:
            fails.append(f"{key}: unallowlisted digest change {o} -> {n}")
    return fails, notes


def newest_ledgers(repo_root: str) -> tuple[str, str]:
    """The two newest committed PLANS_r{N}.json by round number."""
    paths = glob.glob(os.path.join(repo_root, "PLANS_r*.json"))
    # match on the basename only — a directory component like ".../r2/..."
    # must not win the round-number extraction
    by_round = sorted(
        paths, key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
    )
    if len(by_round) < 2:
        raise SystemExit("need at least two committed PLANS_r*.json to gate")
    return by_round[-2], by_round[-1]


def main() -> int:
    if len(sys.argv) == 3:
        old_path, new_path = sys.argv[1], sys.argv[2]
    else:
        old_path, new_path = newest_ledgers(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    old, new = _load(old_path), _load(new_path)
    fails, notes = gate(old, new)
    for x in notes:
        print(f"[plan-gate] {x}")
    for x in fails:
        print(f"[plan-gate] FAIL {x}")
    print(
        f"[plan-gate] {old_path} -> {new_path}: "
        f"{len(fails)} failures, {len(notes)} allowed/added"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
