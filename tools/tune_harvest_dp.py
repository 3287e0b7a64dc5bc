"""Offline tuner for the Harvest track-selection (DP) parameters.

The expensive stages of native/harvest (filterbank, refinement, amplitude
scoring) are run ONCE with HARVEST_DUMP=<path> to capture the per-frame
candidate sets; this tool replicates the downstream selection — the
candidate/unvoiced DP, jump/short-run removal, section extension and contour
smoothing (harvest.cc stage 5) — in JAX/numpy and searches the TrackParams
(lambda, toggle, unvoiced, cand_base, extend_tol) against the shipped
pyworld-Harvest sidecars. Winning values get baked into harvest.cc's
defaults and re-verified with the real binary (tools/f0_accuracy.py).

Usage:
  1. per sample: HARVEST_DUMP=/tmp/hc_<n>.txt python -c "...get_f0(...)"
  2. python tools/tune_harvest_dp.py --dumps /tmp/hc_Danakil.txt:/root/...wav \
         /tmp/hc_Tiken_le.txt:/root/...wav [--iters 200]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MAX_M = 48
STEP_MS = 20.0           # output frame period / internal 1 ms
MIN_VOICED_RUN = 9
MAX_EXTEND = 100
SMOOTH_CUTOFF = 30.0
JUMP_RANGE = 0.008 * 4.0


def load_candidates(dump_path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (f0s (N, MAX_M), scores (N, MAX_M), valid (N, MAX_M)) padded."""
    raw = np.loadtxt(dump_path)
    n = int(raw[:, 0].max()) + 1
    f0s = np.zeros((n, MAX_M)); scores = np.zeros((n, MAX_M))
    counts = np.zeros(n, dtype=int)
    dropped = 0
    for i, f0, sc in raw:
        i = int(i)
        if sc <= 0:
            continue
        if counts[i] >= MAX_M:
            dropped += 1
            continue
        f0s[i, counts[i]] = f0; scores[i, counts[i]] = sc; counts[i] += 1
    if dropped:
        print(f"  ({dropped} candidates over the MAX_M={MAX_M} pad dropped)")
    valid = np.arange(MAX_M)[None, :] < counts[:, None]
    return f0s, scores, valid


def make_dp():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def dp(f0s, scores, valid, lam, toggle, unvoiced, cand_base):
        """Viterbi over (candidates + unvoiced) per 1-ms frame; returns the
        selected f0 track (N,). Mirrors harvest.cc stage 5 exactly."""
        N, M = f0s.shape
        BIG = jnp.float32(1e9)
        log_f0 = jnp.where(valid, jnp.log2(jnp.maximum(f0s, 1e-6)), 0.0)
        local = jnp.where(valid, cand_base / (cand_base + scores), BIG)   # (N, M)
        local = jnp.concatenate([local, jnp.full((N, 1), unvoiced)], 1)   # (N, M+1)
        vmask = jnp.concatenate([valid, jnp.ones((N, 1), bool)], 1)

        def body(carry, inputs):
            prev_cost, prev_lf0, prev_v = carry
            cost_i, lf0_i, v_i = inputs
            # transition (M+1 prev) x (M+1 now)
            both = prev_v[:, None] & v_i[None, :-1]
            jump = lam * jnp.abs(lf0_i[None, :] - prev_lf0[:, None])
            tr_vv = jnp.where(both, jump, BIG)                       # (M+1, M)
            tr = jnp.concatenate(
                [tr_vv, jnp.full((M + 1, 1), toggle)], 1)            # to unvoiced
            tr = tr.at[M, :M].set(jnp.where(v_i[:-1], toggle, BIG))  # from unvoiced
            tr = tr.at[M, M].set(0.0)
            total = prev_cost[:, None] + tr
            best = jnp.min(total, axis=0)
            arg = jnp.argmin(total, axis=0)
            cost = jnp.where(v_i, cost_i + best, BIG)
            return (cost, jnp.concatenate([lf0_i, jnp.zeros(1)]), v_i), arg

        lf0_full = jnp.concatenate([log_f0, jnp.zeros((N, 1))], 1)
        init = (jnp.where(vmask[0], local[0], BIG), lf0_full[0], vmask[0])
        (last_cost, _, _), args = jax.lax.scan(
            body, init, (local[1:], log_f0[1:], vmask[1:]))

        def back(j, i_arg):
            return i_arg[j], j

        j_last = jnp.argmin(last_cost)
        j0, picks = jax.lax.scan(back, j_last, args, reverse=True)
        # ys[t] = pick at frame t+1; the final carry is frame 0's pick
        picks = jnp.concatenate([j0[None], picks])
        sel = jnp.take_along_axis(
            jnp.concatenate([f0s, jnp.zeros((N, 1))], 1), picks[:, None], 1)[:, 0]
        return sel

    return dp


def fix_jumps_and_short_runs(f0: np.ndarray) -> np.ndarray:
    f0 = f0.copy()
    prev = np.concatenate([[0.0], f0[:-1]])
    jump = (f0 > 0) & (prev > 0) & (np.abs(f0 - prev) / np.maximum(f0, 1e-9) > JUMP_RANGE)
    f0[jump] = 0.0
    # short-run removal
    v = f0 > 0
    n = len(f0)
    i = 0
    while i < n:
        if not v[i]:
            i += 1
            continue
        j = i
        while j < n and v[j]:
            j += 1
        if j - i < MIN_VOICED_RUN:
            f0[i:j] = 0.0
        i = j
    return f0


def extend_sections(f0: np.ndarray, f0s, scores, valid, tol: float) -> np.ndarray:
    f0 = f0.copy()
    n = len(f0)

    def best_match(frame, val):
        c = f0s[frame][valid[frame] & (scores[frame] > 0)]
        if not len(c):
            return 0.0
        err = np.abs(c / val - 1.0)
        k = np.argmin(err)
        return c[k] if err[k] < tol else 0.0

    for i in range(1, n):
        if f0[i] != 0.0 or f0[i - 1] == 0.0:
            continue
        val = f0[i - 1]
        for j in range(i, min(n, i + MAX_EXTEND)):
            if f0[j] != 0.0:
                break
            m = best_match(j, val)
            if m == 0.0:
                break
            f0[j] = m
            val = m
    for i in range(n - 2, -1, -1):
        if f0[i] != 0.0 or f0[i + 1] == 0.0:
            continue
        val = f0[i + 1]
        for j in range(i, max(-1, i - MAX_EXTEND), -1):
            if f0[j] != 0.0:
                break
            m = best_match(j, val)
            if m == 0.0:
                break
            f0[j] = m
            val = m
    return f0


def smooth_contour(f0: np.ndarray, frame_rate=1000.0) -> np.ndarray:
    from scipy.signal import lfilter, lfiltic

    K = np.tan(np.pi * SMOOTH_CUTOFF / frame_rate)
    norm = 1.0 / (1.0 + np.sqrt(2.0) * K + K * K)
    b0 = K * K * norm; b1 = 2 * b0; b2 = b0
    a1 = 2.0 * (K * K - 1.0) * norm
    a2 = (1.0 - np.sqrt(2.0) * K + K * K) * norm
    b = [b0, b1, b2]
    a = [1.0, a1, a2]

    def biquad(y):
        if not len(y):
            return y
        # initial conditions == the C++ filter's x1=x2=y1=y2=y[0] priming
        zi = lfiltic(b, a, [y[0], y[0]], [y[0], y[0]])
        out, _ = lfilter(b, a, y, zi=zi)
        return out

    f0 = f0.copy()
    n = len(f0)
    pad = 30
    i = 0
    while i < n:
        if f0[i] == 0.0:
            i += 1
            continue
        j = i
        while j < n and f0[j] > 0.0:
            j += 1
        ln = j - i
        k0 = min(5, ln - 1)
        sl = (f0[i + k0] - f0[i]) / k0 if k0 > 0 else 0.0
        sr = (f0[j - 1] - f0[j - 1 - k0]) / k0 if k0 > 0 else 0.0
        seg = np.concatenate([
            np.maximum(1.0, f0[i] - sl * np.arange(pad, 0, -1)),
            f0[i:j],
            np.maximum(1.0, f0[j - 1] + sr * np.arange(1, pad + 1)),
        ])
        seg = biquad(seg)
        seg = biquad(seg[::-1])[::-1]
        f0[i:j] = seg[pad:pad + ln]
        i = j
    return f0


def select(dp, data, lam, toggle, unvoiced, cand_base, extend_tol):
    """Full stage-5 replica for one file -> f0 on the 20 ms grid."""
    f0s, scores, valid, ref = data
    sel = np.asarray(dp(f0s, scores, valid, np.float32(lam), np.float32(toggle),
                        np.float32(unvoiced), np.float32(cand_base)))
    sel = fix_jumps_and_short_runs(sel)
    sel = extend_sections(sel, f0s, scores, valid, extend_tol)
    sel = smooth_contour(sel)
    n_out = len(ref)
    idx = np.minimum(np.round(np.arange(n_out) * STEP_MS).astype(int), len(sel) - 1)
    out = sel[idx]
    out[(out < 65.0) | (out > 1047.0)] = 0.0
    out[out < 80.0] = 0.0  # ref zeroes <80 Hz (ddsp_prematch_dataset.py:127)
    return out


def metrics(out, ref):
    rv, ov = ref > 0, out > 0
    tp = int((rv & ov).sum()); fp = int((~rv & ov).sum()); fn = int((rv & ~ov).sum())
    both = rv & ov
    cents = 1200 * np.abs(np.log2(out[both] / ref[both])) if both.any() else np.array([1e9])
    return {
        "tp": tp, "fp": fp, "fn": fn,
        "w50_hits": int((cents < 50).sum()), "co": int(both.sum()),
    }


def objective(ms):
    tp = sum(m["tp"] for m in ms); fp = sum(m["fp"] for m in ms)
    fn = sum(m["fn"] for m in ms)
    w50 = sum(m["w50_hits"] for m in ms) / max(sum(m["co"] for m in ms), 1)
    p = tp / max(tp + fp, 1); r = tp / max(tp + fn, 1)
    # distance to the parity gate, softly floored so all three terms matter
    return min(p / 0.95, 1.02) + min(r / 0.95, 1.02) + min(w50 / 0.95, 1.02), p, r, w50


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dumps", nargs="+", required=True,
                    help="dump.txt:audio.wav pairs (sidecar _f0.npy next to audio)")
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    datas = []
    for spec in args.dumps:
        dump, wav = spec.split(":")
        f0s, scores, valid = load_candidates(dump)
        ref = np.load(Path(wav).with_name(Path(wav).stem + "_f0.npy")).astype(np.float64)
        datas.append((f0s, scores, valid, ref))
        print(f"{dump}: {len(f0s)} frames, ref {len(ref)}")

    dp = make_dp()
    base = dict(lam=3.0, toggle=1.4, unvoiced=0.45, cand_base=6.0, extend_tol=0.15)

    def run(params):
        ms = [metrics(select(dp, d, **params), d[3]) for d in datas]
        return objective(ms)

    best = run(base)
    best_params = dict(base)
    print(f"base: obj={best[0]:.4f} P={best[1]:.4f} R={best[2]:.4f} w50={best[3]:.4f}")

    rng = np.random.default_rng(args.seed)
    ranges = dict(lam=(0.5, 12.0), toggle=(0.3, 4.0), unvoiced=(0.1, 1.2),
                  cand_base=(0.5, 30.0), extend_tol=(0.04, 0.4))
    for it in range(args.iters):
        cand = dict(best_params)
        # alternate: global random restart / local log-space jitter
        if it % 4 == 0:
            for k, (lo, hi) in ranges.items():
                cand[k] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        else:
            for k, (lo, hi) in ranges.items():
                if rng.random() < 0.6:
                    cand[k] = float(np.clip(cand[k] * np.exp(rng.normal(0, 0.25)), lo, hi))
        r = run(cand)
        if r[0] > best[0]:
            best, best_params = r, cand
            print(f"[{it}] obj={r[0]:.4f} P={r[1]:.4f} R={r[2]:.4f} w50={r[3]:.4f} {cand}")

    print("\nBEST:", best_params)
    print(f"obj={best[0]:.4f} P={best[1]:.4f} R={best[2]:.4f} w50={best[3]:.4f}")
    print("HARVEST_TUNE check: "
          f"\",{best_params['lam']:.3f},{best_params['toggle']:.3f},"
          f"{best_params['unvoiced']:.3f},{best_params['cand_base']:.3f},,"
          f"{best_params['extend_tol']:.3f},,\"")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
