"""Replica scale-stress: one more decade of data for the heavy family.

The 3-SF probe (scripts/scale_probe.py) leaves the expensive
dedup / ANN / suffix operators in the "tail-only" bucket: their data
term is visible only at sf0.1, so a 3-point fit cannot identify the
scaling exponent. This harness buys the missing decade by replicating
the PROVIDED sf0.1 tables R× (default 16) into a scratch directory and
timing the heavy keys there, then emitting a bench-shaped record that
scale_probe.py --from can fit as a 4th point.

Replication must not change the WORKLOAD SHAPE, only its size:

- documents: replica r keeps doc structure and length distribution but
  maps text through a per-replica alphabet AND digit permutation
  (``translate``). Within a replica the planted duplicate structure is
  preserved EXACTLY (translation is a bijection on characters, so
  equal substrings stay equal), while across replicas shingle overlap
  is destroyed (every letter and digit swaps differently), so the
  corpus dup RATE stays constant as R grows — naive replication would
  instead create R-way exact dups and blow candidate pairs up
  quadratically, measuring a different (adversarial) workload.
  Rotating digits matters as much as letters: an early version left
  digits fixed, so number-heavy grams survived translation, their
  fingerprint document-frequency grew ∝ R, and sub-cap buckets in the
  winnowing/simhash joins grew quadratically — a harness artifact
  masquerading as an operator scale bug.
- embeddings: replica r rotates the 64-dim vector by r coordinates.
  Rotation is orthogonal: within-replica cosine geometry is preserved
  exactly; across replicas the alignment decorrelates (for these
  near-isotropic synthetic vectors, expected cross-replica cosine
  ~ 0), so ANN bucket occupancy grows linearly, not adversarially.
- events / orders / lineitem / customer (the ``--family olap`` build):
  replicated TPC-H-style — facts and customer grow, part / supplier /
  nation / region stay fixed (the classic warehouse growth pattern:
  more orders per part, not more parts). Key offsets are consistent
  (o_orderkey and l_orderkey share a span; o_custkey and c_custkey
  share a span; events.user_id gets its own), so every fact↔fact and
  fact↔customer join lands inside its replica and per-entity workload
  shape is EXACTLY preserved: each replica customer has the original
  order sequence, each replica user the original session structure.
  Offsetting custkey (rather than fanning 16× the orders onto the
  same customers) matters: shared customers would give every customer
  16 same-date copies of each order, turning per-customer windows
  into an adversarial burst workload instead of a bigger corpus.
- every other table: symlinked unchanged.

Usage:
    python scripts/scale_stress.py [--replicas 16] [--out-dir DIR]
    python scripts/scale_probe.py --from bench_out/probe_sf0.001.json \
        bench_out/probe_sf0.01.json bench_out/probe_sf0.1.json \
        bench_out/stress_sf1.6.json

Writes bench_out/stress_sf{R/10}.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ALPHA = "abcdefghijklmnopqrstuvwxyz"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# The data-dominated family the 3-SF probe cannot grade (tail-only),
# plus the suffix trio's shared-sort consumers. Keys only — all are
# registered queries, so the timing path is identical to bench.py's.
HEAVY_KEYS = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ngram_jaccard",
    "text_dedup_pipeline",
    "paragraph_dedup",
    "containment_dedup",
    "sorted_neighborhood_dedup",
    "winnowing_fingerprints",
    "minhash_perturbation_audit",
    "doc_fingerprint",
    "token_count",
    "quality_gopher",
    "suffix_lcp_boilerplate",
    "dedup_substring_spans",
    "dedup_substring_excise",
    "token_yield_waterfall",
    "semdedup",
    "ann_lsh_bucketed",
    "ann_ivf",
    "embedding_dedup_graph",
    "near_dup_windowed",
]


OLAP_KEYS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "top_parts_by_revenue",
    "revenue_rollup",
    "revenue_cube",
    "repeat_orders_30d",
    "skew_salted_join",
    "star_join_7way",
    "nation_market_share",
    "events_sessionize",
    "events_pivot_daily",
    "funnel_conversion",
    "user_retention",
    "rolling_28d_volume",
    "as_of_join",
    "interval_overlap_join",
    "peak_concurrency",
    "session_path_analysis",
    "window_funnel_depth",
    "markov_attribution",
    "last_touch_attribution",
    "rolling_distinct_users",
    "event_transition_matrix",
]


STREAM_KEYS = [
    "streaming_stock",
    "streaming_sliding_counts",
    "streaming_dedup",
    "streaming_stateful_profiles",
    "streaming_rate_anomaly",
    "streaming_join_conversions",
    "streaming_unconverted_clicks",
    "streaming_minhash_dedup",
]


def _stream_dims(spark, sf_dir: str) -> dict:
    """Dimension counts that bound each stateful op's state."""
    from pyspark.sql import functions as F

    from ojo_daps_mirror_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.sum((F.col("event_type") == "click").cast("long")).alias("n_clicks"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "n_purchases"
        ),
    ).collect()[0]
    return row.asDict()


def _stream_state_bounds(d: dict) -> dict:
    """Per-key state-row ceilings (tests/test_streaming_semantics.py
    asserts the same bounds at sf0.001; here they gate 16x volume).
    The windowed aggregates' bounds are REPLICA-INVARIANT (days ×
    types — replication adds users, not days), the key-state ops'
    bounds scale with users, the joins' with participating rows, and
    the foreachBatch probe must show zero state at any scale."""
    return {
        "streaming_stock": (d["n_days"] + 1) * d["n_types"],
        "streaming_sliding_counts": 4 * (d["n_days"] + 1) * d["n_types"],
        "streaming_dedup": d["n_users"] * d["n_types"],
        "streaming_stateful_profiles": d["n_users"],
        "streaming_rate_anomaly": d["n_types"],
        "streaming_join_conversions": d["n_clicks"] + d["n_purchases"],
        "streaming_unconverted_clicks": d["n_clicks"] + d["n_purchases"],
        "streaming_minhash_dedup": 0,
    }


def run_stream_family(spark, out_dir: str, replicas: int) -> int:
    """Drive every availableNow drain at the replica volume and assert
    the state bounds from StreamingQueryProgress stateOperators."""
    from ojo_daps_mirror_spark import plans
    from ojo_daps_mirror_spark.streaming import stock

    dims = _stream_dims(spark, out_dir)
    bounds = _stream_state_bounds(dims)
    records: dict[str, dict] = {}
    violations = 0
    for k in STREAM_KEYS:
        t1 = time.perf_counter()
        n_out = plans.QUERIES[k](spark, out_dir).count()
        sec = round(time.perf_counter() - t1, 3)
        st = stock.state_summary()
        bound = bounds[k]
        ok = st["rows"] <= bound
        if not ok:
            violations += 1
        records[k] = {
            "sec": sec,
            "rows_out": n_out,
            "state_rows": st["rows"],
            "state_bytes": st["bytes"],
            "state_bound": bound,
            "ok": ok,
        }
        print(f"{k}: {sec}s state_rows={st['rows']} bound={bound} "
              f"{'OK' if ok else 'VIOLATION'}", flush=True)

    sf = round(0.1 * replicas, 2)
    rec = {
        "metric": "stream_family_state_bounds",
        "value": round(sum(r["sec"] for r in records.values()), 3),
        "unit": "sec",
        "queries": {k: r["sec"] for k, r in records.items()},
        "state": records,
        "dims": dims,
        "violations": violations,
        "sf": sf,
        "replicas": replicas,
        "base_sf_dir": BASE_SF_DIR,
    }
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    path = os.path.join(REPO, "bench_out", f"stress_stream_sf{sf}.json")
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps({"metric": rec["metric"], "value": rec["value"],
                      "sf": sf, "violations": violations}))
    print(f"# record: {path}")
    return 1 if violations else 0


def _shuffle(chars: str, r: int) -> str:
    """Per-replica character permutation: md5-keyed sort keeps it a
    deterministic bijection AND distinct for every replica index (a
    plain Caesar shift repeats every len(chars) replicas — at 64
    replicas that re-creates the cross-replica token leak for digits).
    r=0 is the identity so replica 0 IS the original."""
    import hashlib

    if r == 0:
        return chars
    return "".join(
        sorted(chars, key=lambda c: hashlib.md5(f"{r}:{c}".encode()).hexdigest())
    )


def _perm(r: int) -> str:
    return _shuffle(ALPHA, r)


ID_SPAN = 10_000_000


def _replicate_keyed(df, replicas: int, offset_cols: list[str]):
    """Union R copies with consistent ID_SPAN offsets on offset_cols;
    all other columns verbatim. Replica 0 is the original."""
    from pyspark.sql import functions as F

    parts = []
    for r in range(replicas):
        parts.append(
            df.select(
                *[
                    (F.col(c) + F.lit(r * ID_SPAN)).alias(c)
                    if c in offset_cols
                    else F.col(c)
                    for c in df.columns
                ]
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build(spark, out_dir: str, replicas: int, family: str = "docs") -> None:
    from pyspark.sql import functions as F

    from ojo_daps_mirror_spark.sources import load_table

    replicated = {"documents", "embeddings"}
    if family in ("olap", "all"):
        replicated |= {"events", "orders", "lineitem", "customer"}
    if family == "olap":
        replicated -= {"documents", "embeddings"}
    if family == "stream":
        # the drains read events; the minhash probe seeds its
        # signature store from documents
        replicated = {"events", "documents"}

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.lexists(dst):
            if os.path.islink(dst):
                os.unlink(dst)
            else:
                shutil.rmtree(dst, ignore_errors=True)
        if t not in replicated:
            os.symlink(os.path.join(BASE_SF_DIR, f"{t}.parquet"), dst)

    offsets = {
        "events": ["event_id", "user_id"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey"],
        "customer": ["c_custkey"],
    }
    for t, cols in offsets.items():
        if t not in replicated:
            continue
        _replicate_keyed(load_table(spark, BASE_SF_DIR, t), replicas, cols)\
            .repartition(32).write.mode("overwrite")\
            .parquet(os.path.join(out_dir, f"{t}.parquet"))
    if "documents" not in replicated:
        return
    docs = load_table(spark, BASE_SF_DIR, "documents")
    emb = load_table(spark, BASE_SF_DIR, "embeddings")
    id_span = 10_000_000

    doc_parts = []
    for r in range(replicas):
        digits = "0123456789"
        dperm = _shuffle(digits, r)
        part = docs.select(
            (F.col("doc_id") + F.lit(r * id_span)).alias("doc_id"),
            F.translate(
                F.translate(
                    F.translate("text", ALPHA, _perm(r)),
                    ALPHA.upper(),
                    _perm(r).upper(),
                ),
                digits,
                dperm,
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        doc_parts.append(part)
    out_docs = doc_parts[0]
    for p in doc_parts[1:]:
        out_docs = out_docs.unionByName(p)
    out_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    if "embeddings" not in replicated:
        return
    emb_parts = []
    dim = 64
    for r in range(replicas):
        rot = r % dim
        rotated = (
            F.col("embedding")
            if rot == 0
            else F.concat(
                F.slice("embedding", rot + 1, dim - rot),
                F.slice("embedding", 1, rot),
            )
        )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * id_span)).alias("vec_id"),
                rotated.alias("embedding"),
                "label",
            )
        )
    out_emb = emb_parts[0]
    for p in emb_parts[1:]:
        out_emb = out_emb.unionByName(p)
    out_emb.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def main() -> int:
    # Replica-scale is where volume-derived suffix sampling is the
    # designed behaviour (operators/suffix.py docstring) — opt in at
    # entry; setdefault so an explicit operator env wins.
    os.environ.setdefault("SPARK_GRAFT_SUFFIX_STRIDE", "auto")
    replicas = 16
    out_dir = None
    skip_build = False
    family = "docs"
    tag_arg = None
    keys_arg: list[str] = []
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
        elif argv[i] == "--family":
            family = argv[i + 1]
            i += 2
        elif argv[i] == "--tag":
            tag_arg = argv[i + 1]
            i += 2
        elif argv[i] == "--keys":
            i += 1
            while i < len(argv) and not argv[i].startswith("--"):
                keys_arg.append(argv[i])
                i += 1
        else:
            print(f"unknown arg {argv[i]}", file=sys.stderr)
            return 2

    if out_dir is None:
        out_dir = (
            "/tmp/ojo_scale_stress"
            if family == "docs"
            else f"/tmp/ojo_scale_stress_{family}"
        )

    from ojo_daps_mirror_spark import plans
    from ojo_daps_mirror_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="ojo-scale-stress")
    if skip_build:
        print(f"# reusing replica at {out_dir}", flush=True)
    else:
        t0 = time.perf_counter()
        build(spark, out_dir, replicas, family)
        print(f"# built {replicas}x {family} replica at {out_dir} "
              f"in {time.perf_counter() - t0:.1f}s", flush=True)

    if family == "stream":
        return run_stream_family(spark, out_dir, replicas)
    default_keys = OLAP_KEYS if family == "olap" else HEAVY_KEYS
    keys = [k for k in (keys_arg or default_keys) if k in plans.QUERIES]
    timings: dict[str, float] = {}
    for k in keys:
        fn = plans.QUERIES[k]
        fn(spark, out_dir).count()  # warm-up (JIT + footers), like bench.py
        t1 = time.perf_counter()
        fn(spark, out_dir).count()
        timings[k] = round(time.perf_counter() - t1, 3)
        print(f"{k}: {timings[k]}s", flush=True)

    sf = round(0.1 * replicas, 2)
    rec = {
        "metric": "heavy_family_stress_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "replicas": replicas,
        "base_sf_dir": BASE_SF_DIR,
    }
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    tag = (
        f"_{tag_arg}"
        if tag_arg
        else ("_extra" if keys_arg else ("" if family == "docs" else f"_{family}"))
    )
    path = os.path.join(REPO, "bench_out", f"stress_sf{sf}{tag}.json")
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps({k: rec[k] for k in ("metric", "value", "sf")}))
    print(f"# record: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
