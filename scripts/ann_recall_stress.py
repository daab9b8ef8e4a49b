"""Planted near-neighbour RECALL stress for the ANN family
(VERDICT r6 next-round #4): does recall@k survive 16x corpus growth?

The text-dedup recall harness (scripts/recall_stress.py) covers
minhash/simhash/ngram; the ANN ops (C9 SRP-LSH, C15 IVF, C28/29
PQ/ADC) were recall-tested only at base scale vs brute force
(tests/test_vectors.py). The scale-bearing knobs — SRP bit width
(_srp_bits_for grows with n), IVF codebook ~sqrt(n) with its K cap,
PQ's fixed 4-bit codes — all change behaviour with corpus size, so
recall must be MEASURED across scales, not argued.

Design (mirrors recall_stress.py):

- corpus: replica 0 is the real base embeddings (ids stay dense from
  0, so the fixed-count query panels are IDENTICAL at every scale);
  replicas r >= 1 are fresh deterministic Gaussian vectors (seeded by
  vec_id) — background that GROWS, not exact copies (copies would
  displace the planted pairs from every true top-k and make recall
  denominators meaningless).
- planting: every query id (vec_id % QUERY_MOD == 0, every replica)
  gets one planted neighbour per tier: tier 0 an exact duplicate,
  tiers 1-3 orthogonal perturbations with eps in {0.15, 0.30, 0.45}
  => exact cos = 1/sqrt(1+eps^2) ~= {0.989, 0.958, 0.912}. Planted
  ids live above PLANT_BASE with residue != 0 mod QUERY_MOD (they are
  corpus members and rerank competitors, never queries).
- ground truth: a planted pair is ELIGIBLE for recall@k iff fewer
  than k corpus vectors rank strictly better for its query under the
  ops' own ordering (cos desc, id asc; planted ids are huge, so ties
  rank against them). Computed EXACTLY from the written parquet by
  one blocked matmul pass — eligibility never trusts the index.
  Pairs with no rank row are counted as UNSCORED (a harness bug),
  never silently dropped from the denominator (ADVICE r6).
- recall per (op, tier) = found/eligible over the op's own query
  universe (panel ops only see the first QUERY_PANEL_K query ids).

The scale claim under test: recall@5 at 16x must not drop more than
RECALL_DROP_TOL below recall@5 at 2x for any (op, tier), the exact
baseline stays at ~1.0, and tier-0 (exact duplicate) recall is 1.0
for every index (identical vectors share every bucket/cell/code).

    python scripts/ann_recall_stress.py --replicas 2
    python scripts/ann_recall_stress.py --replicas 16
    python scripts/ann_recall_stress.py --gate   # compares the two

Writes bench_out/ann_recall_stress_sf{R/10}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SPAN = 10_000_000          # replica id stride (multiple of QUERY_MOD)
PLANT_BASE = 10**12        # planted ids: above every corpus id
TIER_EPS = {0: 0.0, 1: 0.15, 2: 0.30, 3: 0.45}
ANN_OPS = ("ann_lsh_bucketed", "ann_ivf", "ann_pq_adc")
EXACT_OP = "ann_topk_bruteforce"   # control: exact => recall ~1.0
RECALL_DROP_TOL = 0.05     # max allowed recall drop 2x -> 16x
EXACT_FLOOR = 0.99         # brute-force + tier-0 floor
TIE_EPS = 1e-9             # float tie margin in the rank pass


def build(spark, out_dir: str, replicas: int) -> None:
    """Write embeddings.parquet (corpus + planted) and
    ann_planted_pairs.parquet (query_id, planted_id, tier)."""
    import numpy as np
    import pandas as pd

    from ojo_daps_mirror_spark.plans.vector_plans import QUERY_MOD
    from ojo_daps_mirror_spark.sources import load_table

    base = load_table(spark, BASE_SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dim = len(base.select("embedding").first()["embedding"])

    def synth(batches):
        for batch in batches:
            ids = batch["vec_id"].to_numpy()
            vecs = [
                np.random.default_rng(int(i)).standard_normal(dim)
                for i in ids
            ]
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    parts = [base]
    for r in range(1, replicas):
        ids = base.select((F.col("vec_id") + r * SPAN).alias("vec_id"))
        parts.append(
            ids.mapInPandas(
                synth, schema="vec_id bigint, embedding array<double>"
            )
        )
    corpus0 = parts[0]
    for p in parts[1:]:
        corpus0 = corpus0.unionByName(p)

    tiers = sorted(TIER_EPS)
    eps_arr = [TIER_EPS[t] for t in tiers]

    def plant(batches):
        for batch in batches:
            out_id, out_vec, out_q, out_t = [], [], [], []
            for qid, v in zip(
                batch["vec_id"].to_numpy(), batch["embedding"].to_numpy()
            ):
                v = np.asarray(v, dtype=np.float64)
                vn = v / np.linalg.norm(v)
                for t, eps in zip(tiers, eps_arr):
                    pid = PLANT_BASE + int(qid) * 10 + t + 1
                    if eps == 0.0:
                        p = v.copy()
                    else:
                        # orthogonal unit perturbation: exact
                        # cos(v, v + eps*|v|*u) = 1/sqrt(1 + eps^2)
                        rng = np.random.default_rng(pid)
                        u = rng.standard_normal(dim)
                        u -= (u @ vn) * vn
                        u /= np.linalg.norm(u)
                        p = v + eps * np.linalg.norm(v) * u
                    out_id.append(pid)
                    out_vec.append(p)
                    out_q.append(int(qid))
                    out_t.append(t)
            yield pd.DataFrame(
                {
                    "vec_id": out_id,
                    "embedding": out_vec,
                    "query_id": out_q,
                    "tier": out_t,
                }
            )

    queries = corpus0.where(F.col("vec_id") % QUERY_MOD == 0)
    planted = queries.mapInPandas(
        plant,
        schema="vec_id bigint, embedding array<double>, "
        "query_id bigint, tier int",
    ).persist()

    corpus = corpus0.unionByName(
        planted.select("vec_id", "embedding")
    ).withColumn("label", F.lit(0))
    corpus.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    planted.select(
        "query_id", F.col("vec_id").alias("planted_id"), "tier"
    ).write.mode("overwrite").parquet(
        os.path.join(out_dir, "ann_planted_pairs.parquet")
    )
    planted.unpersist()


def _rank_pass(spark, out_dir: str):
    """Exact better-than counts for every planted pair, from the
    written parquet (single source of truth): returns a pandas frame
    (query_id, planted_id, tier, cos, better) where ``better`` counts
    corpus vectors ranking strictly ahead of the planted neighbour
    under (cos desc, id asc), self excluded."""
    import numpy as np
    import pandas as pd

    pairs = (
        spark.read.parquet(os.path.join(out_dir, "ann_planted_pairs.parquet"))
        .toPandas()
        .sort_values(["query_id", "tier"])
        .reset_index(drop=True)
    )
    corpus_path = os.path.join(out_dir, "embeddings.parquet")
    need = sorted(
        set(pairs.query_id.tolist()) | set(pairs.planted_id.tolist())
    )
    # Bounded collect: |queries|*(tiers+1) rows — the planted universe,
    # never the corpus (guarded).
    assert len(need) < 200_000, "planted universe unexpectedly large"
    vec_rows = (
        spark.read.parquet(corpus_path)
        .where(F.col("vec_id").isin(need))
        .select("vec_id", "embedding")
        .collect()
    )
    vec = {r["vec_id"]: np.asarray(r["embedding"], float) for r in vec_rows}

    qn = {}
    for qid in pairs.query_id.unique():
        v = vec[qid]
        qn[qid] = v / np.linalg.norm(v)
    cos = np.array(
        [
            float(
                qn[q] @ (vec[p] / np.linalg.norm(vec[p]))
            )
            for q, p in zip(pairs.query_id, pairs.planted_id)
        ]
    )
    pairs["cos"] = cos

    q_ids = pairs.query_id.to_numpy()
    p_ids = pairs.planted_id.to_numpy()
    q_index = {qid: i for i, qid in enumerate(pairs.query_id.unique())}
    Q = np.stack([qn[qid] for qid in pairs.query_id.unique()])
    pair_qcol = np.array([q_index[q] for q in q_ids])
    bc = spark.sparkContext.broadcast(
        (Q, pair_qcol, q_ids, p_ids, cos)
    )

    def count_better(batches):
        Qm, qcol, qids, pids, thr = bc.value
        acc = np.zeros(len(pids), dtype=np.int64)
        for batch in batches:
            vids = batch["vec_id"].to_numpy()
            M = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            S = M @ Qm.T  # batch x |queries|
            for k in range(len(pids)):
                s = S[:, qcol[k]]
                strictly = s > thr[k] + TIE_EPS
                tied_smaller = (np.abs(s - thr[k]) <= TIE_EPS) & (
                    vids < pids[k]
                )
                hit = (strictly | tied_smaller) & (vids != qids[k])
                acc[k] += int(hit.sum())
        yield pd.DataFrame({"k": np.arange(len(pids)), "better": acc})

    better = (
        spark.read.parquet(corpus_path)
        .select("vec_id", "embedding")
        .mapInPandas(count_better, schema="k long, better long")
        .groupBy("k")
        .agg(F.sum("better").alias("better"))
        .toPandas()
        .set_index("k")["better"]
    )
    pairs["better"] = [int(better.get(k, 0)) for k in range(len(pairs))]
    return pairs


def measure(spark, out_dir: str, replicas: int) -> dict:
    from ojo_daps_mirror_spark import plans
    from ojo_daps_mirror_spark.plans.vector_plans import (
        ANN_K,
        QUERY_MOD,
        QUERY_PANEL_K,
    )

    pairs = _rank_pass(spark, out_dir)
    pairs["eligible"] = pairs.better <= ANN_K - 1

    all_q = sorted(pairs.query_id.unique())
    panel_q = set(all_q[:QUERY_PANEL_K])
    brute_q = {q for q in all_q if q < QUERY_MOD * QUERY_PANEL_K}
    universe = {
        "ann_lsh_bucketed": set(all_q),
        "ann_ivf": set(all_q),
        "ann_pq_adc": panel_q,
        EXACT_OP: brute_q,
    }

    results: dict[str, dict] = {}
    for op in ANN_OPS + (EXACT_OP,):
        t0 = time.perf_counter()
        out = plans.QUERIES[op](spark, out_dir)
        found = {
            (r["query_id"], r["neighbor_id"])
            for r in out.select("query_id", "neighbor_id").collect()
        }
        sec = round(time.perf_counter() - t0, 3)
        sub = pairs[pairs.query_id.isin(universe[op])]
        tiers: dict[int, dict] = {}
        for t, grp in sub.groupby("tier"):
            el = grp[grp.eligible]
            if not len(el):
                continue
            hits = sum(
                (q, p) in found
                for q, p in zip(el.query_id, el.planted_id)
            )
            tiers[int(t)] = {
                "eligible": int(len(el)),
                "found": int(hits),
                "recall": round(hits / len(el), 4),
            }
        results[op] = {"sec": sec, "tiers": tiers}
        print(
            f"{op}: {sec}s "
            + " ".join(
                f"t{t}={v['found']}/{v['eligible']}({v['recall']})"
                for t, v in sorted(tiers.items())
            ),
            flush=True,
        )
        spark.catalog.clearCache()
    return {
        "n_planted_pairs": int(len(pairs)),
        "n_eligible": int(pairs.eligible.sum()),
        "ops": results,
    }


def gate() -> int:
    """2x vs 16x: recall holds within RECALL_DROP_TOL per (op, tier);
    exact control and every tier-0 pinned at >= EXACT_FLOOR."""
    small = json.load(
        open(os.path.join(REPO, "bench_out", "ann_recall_stress_sf0.2.json"))
    )
    big = json.load(
        open(os.path.join(REPO, "bench_out", "ann_recall_stress_sf1.6.json"))
    )
    bad = 0
    for op, rec in big["ops"].items():
        for t, v in rec["tiers"].items():
            r_small = small["ops"][op]["tiers"].get(t, {}).get("recall")
            r_big = v["recall"]
            exact = op == EXACT_OP or t == "0"
            floor_ok = (not exact) or r_big >= EXACT_FLOOR
            drop_ok = r_small is None or r_big >= r_small - RECALL_DROP_TOL
            status = "OK" if (floor_ok and drop_ok) else "VIOLATION"
            if status == "VIOLATION":
                bad += 1
            print(f"{op} tier{t}: 2x={r_small} 16x={r_big} {status}")
    print(f"# {bad} violations")
    return 1 if bad else 0


def main() -> int:
    replicas = 16
    out_dir = None
    skip_build = False
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--replicas":
            replicas = int(argv[i + 1])
            i += 2
        elif argv[i] == "--out-dir":
            out_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--skip-build":
            skip_build = True
            i += 1
        elif argv[i] == "--gate":
            return gate()
        else:
            print(f"unknown arg {argv[i]}", file=sys.stderr)
            return 2
    if out_dir is None:
        out_dir = f"/tmp/ojo_ann_recall_stress_{replicas}x"

    from ojo_daps_mirror_spark.session import get_spark

    spark = get_spark(app_name="ojo-ann-recall-stress")
    if skip_build:
        print(f"# reusing corpus at {out_dir}", flush=True)
    else:
        t0 = time.perf_counter()
        build(spark, out_dir, replicas)
        print(
            f"# built {replicas}x planted ANN corpus at {out_dir} "
            f"in {time.perf_counter() - t0:.1f}s",
            flush=True,
        )
    rec = measure(spark, out_dir, replicas)
    sf = round(0.1 * replicas, 2)
    rec.update(
        {
            "metric": "planted_neighbour_recall_at_k",
            "sf": sf,
            "replicas": replicas,
            "tier_eps": TIER_EPS,
            "base_sf_dir": BASE_SF_DIR,
        }
    )
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    path = os.path.join(
        REPO, "bench_out", f"ann_recall_stress_sf{sf}.json"
    )
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(f"# record: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
