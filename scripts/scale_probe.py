"""Empirical scale probe: per-query scaling exponents across SFs.

The bench measures ONE scale factor; every "holds at 100×" claim
otherwise rests on plan reading. This probe runs the headline set at
three scale factors (default sf0.001 / sf0.01 / sf0.1 — 1:10:100 in
rows), fits each query's wall time to

    t(x) = c + a * x^b        x = rows relative to the smallest SF

where ``c`` absorbs the per-query JVM floor (scheduler rounds, codegen,
fixed job overhead — ~1.3 s/query at sf0.001 on the local rig) and
``b`` is the empirical scaling exponent of the data-dependent part.
An op whose work grows linearly with input shows b ≈ 1; a hidden
all-pairs or single-reducer stage shows b → 2 / steep superlinear.

Fit: grid search over b with exact least squares for (c, a) at each b
(3 points, 2 linear params — the grid picks the best-conditioned
exponent instead of solving an ill-posed 3-param system).

Identifiability is graded honestly — the first local run taught us
why. With a ~0.5-1.3 s floor, a query whose data term is only ~1 s at
the LARGEST SF carries data signal in exactly one of the three points;
any exponent fits [t, t, t+Δ] and the grid pins b at its ceiling.
Flagging those as superlinear is noise laundering. So:

  - floor-dominated: data term < NOISE_SEC even at the largest SF →
    exponent null, no flag (the op is too cheap to measure here);
  - tail-only: data term visible at the largest SF but below noise at
    the MIDDLE SF under the best fit → exponent unidentifiable from 3
    points; reported null with ``tail_ratio`` (= t_max/t_mid, raw) so
    a human can eyeball it, no flag. A REAL hidden quadratic does not
    hide here: +2 decades of data through an O(n^2) stage multiplies
    the visible tail by ~100, which lands it in the identifiable
    bucket with b ≈ 2.
  - non-monotone: the middle leg is >1.5× BOTH end legs — a transient
    (GC pause, co-tenant load) poisons the fit; reported as noisy,
    no flag, re-measure.
  - identifiable: data term ≥ NOISE_SEC at both the middle and top SF
    → the exponent is real; flagged iff b > threshold and not exempt.

Usage:
    python scripts/scale_probe.py                      # run + fit
    python scripts/scale_probe.py --from a.json b.json c.json
                                                       # fit recorded runs
    python scripts/scale_probe.py --flag-above 1.3

Writes bench_out/scale_probe.json and prints a ranked table; exits 1
if any non-exempt query's exponent exceeds the flag threshold (the
exemptions are the documented superlinear-by-design ops).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = ["0.001", "0.01", "0.1"]
NOISE_SEC = 0.35  # data term below this at the largest SF ⇒ floor-dominated
FLAG_B = 1.3

# Superlinear by DESIGN, argued in the op docstrings — the probe proves
# everything else is not. Keep this list justified, like BNLJ_OK.
EXEMPT: dict[str, str] = {
    "near_dup_cosine": "declared EXACT all-pairs baseline (block-pair matmul, "
    "O(n^2/B) by contract; the scale path is ann_lsh_bucketed/ann_ivf)",
    "ann_topk_bruteforce": "declared exact eval baseline (O(n·k_panel)); "
    "panel is fixed-count so this is a constant factor, listed defensively",
}


def run_bench(sf: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf}")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    # persist each leg: a later leg failing must not lose this one, and
    # the sf0.1 leg IS the round's local bench record for bench_diff.py
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    with open(os.path.join(REPO, "bench_out", f"probe_sf{sf}.json"), "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    return rec


def fit_query(ts: list[float], xs: list[float]) -> dict:
    """Fit t = c + a*x^b (c,a >= 0) by grid search over b.

    Requires >= 3 points: the mid-SF grade reads x[-2]/t[-2], which
    with one point aliases the only run (or IndexErrors on none) and
    with two silently grades the minimum SF as the middle one
    (ADVICE r4)."""
    if len(ts) < 3 or len(xs) < 3:
        raise ValueError(
            f"fit_query needs >= 3 runs to grade (got {len(ts)}); "
            "pass at least three --from records or let the probe run "
            "all DEFAULT_SFS"
        )
    t = np.asarray(ts, dtype=float)
    x = np.asarray(xs, dtype=float)
    best = None
    # b starts above 0: at b=0 the design matrix [1, x^0] is collinear
    # and lstsq splits a flat query's constant arbitrarily between c and
    # a, defeating the floor-domination check
    for b in np.arange(0.05, 3.01, 0.01):
        A = np.column_stack([np.ones_like(x), x**b])
        coef, *_ = np.linalg.lstsq(A, t, rcond=None)
        c, a = coef
        if a < 0:  # flat/decreasing: pure floor
            c, a = float(t.mean()), 0.0
        if c < 0:  # no floor: pure power law
            a = float((t @ (x**b)) / ((x**b) @ (x**b)))
            c = 0.0
        resid = float(np.sum((c + a * x**b - t) ** 2))
        if best is None or resid < best["resid"]:
            best = {"b": round(float(b), 2), "c": round(c, 3),
                    "a": a, "resid": resid}
    data_max = float(best["a"]) * float(x[-1]) ** best["b"]
    data_mid = float(best["a"]) * float(x[-2]) ** best["b"]
    # A non-monotone verdict needs the mid-SF spike to exceed NOISE in
    # ABSOLUTE terms, not just ratio: sub-second floor keys flap 1.5-2x
    # run-to-run (memory lesson 5 / SURVEY §6.4), and a 0.25→0.37s bump
    # is scheduler noise, not a scaling anomaly. Isolated re-measurement
    # cannot arbitrate these either — a fresh JVM pays a ~1.3s/query
    # codegen floor that swamps the signal (round-5 re-measure record).
    non_monotone = bool(
        len(t) >= 3
        and t[-2] > 1.5 * t[0]
        and t[-2] > 1.5 * t[-1]
        and (t[-2] - max(t[0], t[-1])) > NOISE_SEC
    )
    if non_monotone:
        grade = "non_monotone"
    elif data_max < NOISE_SEC:
        grade = "floor_dominated"
    elif data_mid < NOISE_SEC:
        grade = "tail_only"
    else:
        grade = "identifiable"
    out = {
        "exponent": float(best["b"]) if grade == "identifiable" else None,
        "grade": grade,
        "floor_sec": float(best["c"]),
        "data_term_at_max_sf": round(data_max, 3),
        "data_term_at_mid_sf": round(data_mid, 3),
        "times": [round(float(v), 3) for v in ts],
    }
    if grade == "tail_only" and t[-2] > 0:
        out["tail_ratio"] = round(float(t[-1] / t[-2]), 2)
    return out


def main() -> int:
    argv = sys.argv[1:]
    flag_above = FLAG_B
    from_files: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--from":
            while i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                from_files.append(argv[i + 1])
                i += 1
            i += 1
        elif argv[i] == "--flag-above":
            flag_above = float(argv[i + 1])
            i += 2
        else:
            print(f"unknown arg {argv[i]}", file=sys.stderr)
            return 2
    if from_files:
        runs = [json.load(open(f)) for f in from_files]
        if len(runs) < 3:
            print(
                f"need >= 3 --from records to fit exponents, got "
                f"{len(runs)}",
                file=sys.stderr,
            )
            return 2
    else:
        runs = [run_bench(sf) for sf in DEFAULT_SFS]
    runs.sort(key=lambda r: float(r["sf"]))
    sfs = [float(r["sf"]) for r in runs]
    xs = [s / sfs[0] for s in sfs]

    keys = set(runs[0]["queries"])
    for r in runs[1:]:
        keys &= set(r["queries"])
    fits = {}
    for k in sorted(keys):
        fits[k] = fit_query([r["queries"][k] for r in runs], xs)

    flagged = {
        k: v
        for k, v in fits.items()
        if v["exponent"] is not None
        and v["exponent"] > flag_above
        and k not in EXEMPT
    }
    report = {
        "sfs": sfs,
        "flag_above": flag_above,
        "noise_sec": NOISE_SEC,
        "exempt": EXEMPT,
        "flagged": sorted(flagged),
        "fits": fits,
    }
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    out_path = os.path.join(REPO, "bench_out", "scale_probe.json")
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)

    ranked = sorted(
        ((k, v) for k, v in fits.items() if v["exponent"] is not None),
        key=lambda kv: -kv[1]["exponent"],
    )
    print(f"{'query':<40} {'b':>5} {'floor_s':>8} {'data_s@max':>10}  times")
    for k, v in ranked[:30]:
        mark = " FLAG" if k in flagged else ("  (exempt)" if k in EXEMPT else "")
        print(
            f"{k:<40} {v['exponent']:>5.2f} {v['floor_sec']:>8.3f} "
            f"{v['data_term_at_max_sf']:>10.3f}  {v['times']}{mark}"
        )
    grades = {}
    for v in fits.values():
        grades[v["grade"]] = grades.get(v["grade"], 0) + 1
    print(
        f"# {len(fits)} queries fitted, grades {grades}, "
        f"{len(flagged)} flagged (> {flag_above}); report: {out_path}"
    )
    tails = sorted(
        ((k, v) for k, v in fits.items() if v["grade"] == "tail_only"),
        key=lambda kv: -kv[1].get("tail_ratio", 0.0),
    )[:10]
    if tails:
        print("# tail-only (unidentifiable from 3 points; eyeball ratio):")
        for k, v in tails:
            print(
                f"#   {k:<38} tail_ratio={v.get('tail_ratio'):>6} "
                f"times={v['times']}"
            )
    if flagged:
        print("FLAGGED:", ", ".join(sorted(flagged)))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
