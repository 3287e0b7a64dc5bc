"""Binary-in-the-loop tuner for ALL Harvest TrackParams (gates + DP).

Round-2's offline DP replay (tune_harvest_dp.py) could only move the five
stage-5 economics because the refine/amplitude gates are baked into the
dumped candidate scores. Round-3 analysis showed the amplitude gates are
what cap recall (disabling them: R .891 -> .976 at P .85), so the whole
9-parameter TrackParams vector needs joint search with the real binary in
the loop (HARVEST_TUNE env override, no recompile).

Objective: soft-capped parity-gate distance on the two pyworld sidecars
(the in-family truth) PLUS the synthetic tune split of tools/
f0_truth_suite.py (out-of-family regularizer so gates aren't fit to two
files' noise floor). The heldout split is NEVER evaluated here.

Usage:
  python tools/f0_truth_suite.py --out /tmp/f0suite --split tune
  python tools/tune_harvest_gates.py --suite /tmp/f0suite [--iters 120]
        [--seconds 60] [--seed 0] [--start "..."]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

NAMES = ["score_floor", "lambda", "toggle", "unvoiced", "cand_base",
         "energy_knee", "extend_tol", "snr_knee", "rel_gamma"]
DEFAULTS = [1.277, 6.729, 4.0, 0.262, 0.766, 0.13, 0.235, 6.342, 1.383]
RANGES = [(0.2, 4.0), (1.0, 30.0), (0.5, 10.0), (0.05, 1.5), (0.1, 30.0),
          (0.0001, 0.4), (0.04, 0.4), (0.2, 30.0), (0.0001, 3.0)]


def tune_str(v) -> str:
    return ",".join(f"{x:.6g}" for x in v)


def gate_score(p, r, w50, cap=1.03):
    return (min(p / 0.95, cap) + min(r / 0.95, cap) + min(w50 / 0.95, cap))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", required=True)
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--seconds", type=float, default=60.0,
                    help="sidecar eval prefix seconds (full-length verify at end)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--start", default=None,
                    help="comma list to start from (default: shipped values)")
    ap.add_argument("--suite-weight", type=float, default=1.0)
    args = ap.parse_args()

    from f0_accuracy import evaluate as eval_sidecars
    from f0_truth_suite import evaluate as eval_suite
    import knnsvc_tpu.dsp.harvest as h

    def measure(v):
        os.environ["HARVEST_TUNE"] = tune_str(v)
        try:
            sc = eval_sidecars(h.harvest_f0, seconds=args.seconds)
            su = eval_suite(args.suite, "tune", "harvest")
        finally:
            os.environ.pop("HARVEST_TUNE", None)
        obj = (2.0 * gate_score(sc["precision"], sc["recall"],
                                sc["within_50_cents"])
               + args.suite_weight * gate_score(su["precision"], su["recall"],
                                                su["within_50_cents"]))
        return obj, sc, su

    v0 = np.array([float(x) for x in args.start.split(",")]) \
        if args.start else np.array(DEFAULTS)
    best_v = v0.copy()
    best, sc, su = measure(v0)
    print(f"start: obj={best:.4f} | sidecars P={sc['precision']:.4f} "
          f"R={sc['recall']:.4f} w50={sc['within_50_cents']:.4f} | "
          f"suite P={su['precision']:.4f} R={su['recall']:.4f} "
          f"w50={su['within_50_cents']:.4f}")

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for it in range(args.iters):
        cand = best_v.copy()
        mode = it % 5
        if mode == 0:  # global restart on a random subset of dims
            for k in range(9):
                if rng.random() < 0.5:
                    lo, hi = RANGES[k]
                    cand[k] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        else:          # local log-space jitter
            for k in range(9):
                if rng.random() < 0.5:
                    lo, hi = RANGES[k]
                    cand[k] = float(np.clip(
                        cand[k] * np.exp(rng.normal(0, 0.3)), lo, hi))
        obj, sc, su = measure(cand)
        if obj > best:
            best, best_v = obj, cand
            print(f"[{it} {time.time()-t0:.0f}s] obj={obj:.4f} | "
                  f"sc P={sc['precision']:.4f} R={sc['recall']:.4f} "
                  f"w50={sc['within_50_cents']:.4f} | "
                  f"su P={su['precision']:.4f} R={su['recall']:.4f} "
                  f"w50={su['within_50_cents']:.4f}\n"
                  f"   HARVEST_TUNE={tune_str(cand)}")

    print("\nBEST:", dict(zip(NAMES, best_v)))
    print("HARVEST_TUNE=" + tune_str(best_v))
    # full-length verify
    os.environ["HARVEST_TUNE"] = tune_str(best_v)
    try:
        sc = eval_sidecars(h.harvest_f0)
        su = eval_suite(args.suite, "tune", "harvest")
    finally:
        os.environ.pop("HARVEST_TUNE", None)
    print(f"full sidecars: P={sc['precision']:.4f} R={sc['recall']:.4f} "
          f"w50={sc['within_50_cents']:.4f} med={sc['median_cents']:.2f}")
    print(f"tune suite  : P={su['precision']:.4f} R={su['recall']:.4f} "
          f"w50={su['within_50_cents']:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
