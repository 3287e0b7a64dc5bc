"""Tune the device f0 extractor's economics knobs on the truth suite.

The device extractor (knnsvc_tpu/dsp/f0_device.py) splits into knob-free
features (STFT + comb matmul + IF) and a knob-dependent decode (Viterbi +
refinement) whose five economics scalars are TRACED. This tool exploits
that split: features are computed ONCE per tune file, then the decode is
vmapped over a whole batch of knob vectors — hundreds of candidate
settings per jitted dispatch, zero recompiles.

Protocol (same discipline as tune_harvest_*): fit on `--split tune` only;
the held-out split is evaluated exactly once at the end, clearly labeled.

Usage:
  python tools/f0_truth_suite.py --out /tmp/f0suite --split tune   # once
  JAX_PLATFORMS=cpu python tools/tune_f0_device.py --suite /tmp/f0suite \
      [--iters 6] [--batch 64] [--heldout]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("KNNSVC_TOOLS_CPU", "1") == "1":
    # the axon sitecustomize overrides the JAX_PLATFORMS env var at
    # interpreter start; the reliable CPU override is the config call (see
    # tests/conftest.py). Tuning decodes are small — the tunnel's per-
    # dispatch latency dominates any TPU win, and a tunnel outage hangs the
    # whole search. Set KNNSVC_TOOLS_CPU=0 to tune on the chip.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from knnsvc_tpu.dsp import f0_device as fd

HOP = 320
_FRAME_BUCKET = 256


def _load_split(suite: str, split: str):
    """-> list of (name, features..., grid, n_valid, truth, care)."""
    p = fd.DeviceF0Params()
    root = Path(suite) / split
    wavs = sorted(root.glob("*.wav"))
    if not wavs:
        raise SystemExit(f"no wavs in {root} — generate the suite first")
    from knnsvc_tpu.io.audio import load_audio, to_mono

    feats = jax.jit(fd._features, static_argnums=(1, 2))
    out = []
    for wav in wavs:
        truth = np.load(wav.with_name(wav.stem + "_truth.npy"))
        care = np.load(wav.with_name(wav.stem + "_care.npy"))
        x, sr = load_audio(str(wav))
        x = np.asarray(to_mono(x)[0], dtype=np.float32)
        n_frames = len(x) // HOP + 1
        n_pad = -n_frames % _FRAME_BUCKET
        frames = fd._frame(jnp.asarray(x), n_frames + n_pad, p.window, HOP)
        sal_c, energy, A, inst = jax.device_get(
            feats(frames, int(sr), p.static_key()))
        _, grid, _ = fd._comb_matrix(int(sr), p.static_key())
        n = min(n_frames, len(truth))
        out.append((wav.stem, sal_c, energy, A, inst, grid,
                    n_frames, truth[:n], care[:n], int(sr)))
    return out


def _make_batch_decode(sr: int):
    p = fd.DeviceF0Params()

    @jax.jit
    def run(sal_c, energy, A, inst, grid, knob_batch, n_valid):
        def one(knobs):
            return fd._decode(sal_c, energy, A, inst, grid, knobs,
                              sr, p.static_key(), n_valid)

        return jax.vmap(one)(knob_batch)

    return run


def _score(f0: np.ndarray, truth: np.ndarray, care: np.ndarray):
    n = min(len(f0), len(truth))
    f0, truth, care = f0[:n], truth[:n], care[:n]
    rv, ov = (truth > 0) & care, (f0 > 0) & care
    tp = int((rv & ov).sum())
    fp = int((~(truth > 0) & care & (f0 > 0)).sum())
    fn = int((rv & ~(f0 > 0)).sum())
    both = rv & ov
    cents = (1200 * np.abs(np.log2(f0[both] / truth[both]))
             if both.any() else np.zeros(0))
    return tp, fp, fn, cents


def _aggregate(per_file):
    tp = sum(r[0] for r in per_file)
    fp = sum(r[1] for r in per_file)
    fn = sum(r[2] for r in per_file)
    cents = np.concatenate([r[3] for r in per_file]) if per_file else np.zeros(0)
    P = tp / max(tp + fp, 1)
    R = tp / max(tp + fn, 1)
    w50 = float((cents < 50).mean()) if len(cents) else 0.0
    w20 = float((cents < 20).mean()) if len(cents) else 0.0
    med = float(np.median(cents)) if len(cents) else 99.0
    return P, R, w50, w20, med


def _objective(P, R, w50, w20, med):
    f1 = 2 * P * R / max(P + R, 1e-9)
    return f1 + 0.5 * w50 + 0.25 * w20


# search ranges: [unvoiced_cost(knee), switch, lam, energy_floor_db, gate,
#                 subharm2, subharm3]
LO = np.array([0.02, 0.01, 0.05, -70.0, 10.0, 0.0, 0.0], np.float32)
HI = np.array([0.90, 0.40, 4.00, -40.0, 120.0, 0.9, 0.9], np.float32)

SIDECARS = [
    "/root/reference/sample_content/Danakil-voice_resampled_16000_cut.wav",
    "/root/reference/sample_content/Tiken_lead_07_resampled_16000_cut.wav",
]


def _load_sidecars():
    """The two shipped pyworld-Harvest sidecar files — the only REAL-VOICE
    truth in the image (in-sample for fitting, same protocol as
    tune_harvest_joint.py; the synthetic suite regularizes)."""
    p = fd.DeviceF0Params()
    from knnsvc_tpu.io.audio import load_audio, to_mono

    feats = jax.jit(fd._features, static_argnums=(1, 2))
    out = []
    for path in SIDECARS:
        path = Path(path)
        truth = np.load(path.with_name(path.stem + "_f0.npy"))
        x, sr = load_audio(str(path))
        x = np.asarray(to_mono(x)[0], dtype=np.float32)
        n_frames = len(x) // HOP + 1
        n_pad = -n_frames % _FRAME_BUCKET
        frames = fd._frame(jnp.asarray(x), n_frames + n_pad, p.window, HOP)
        sal_c, energy, A, inst = jax.device_get(
            feats(frames, int(sr), p.static_key()))
        _, grid, _ = fd._comb_matrix(int(sr), p.static_key())
        n = min(n_frames, len(truth))
        care = np.ones(n, dtype=bool)   # f0_accuracy.py scores every frame
        out.append((path.stem, sal_c, energy, A, inst, grid,
                    n_frames, np.asarray(truth[:n], np.float64), care,
                    int(sr)))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="/tmp/f0suite")
    ap.add_argument("--iters", type=int, default=6,
                    help="shrinking-box rounds")
    ap.add_argument("--batch", type=int, default=64,
                    help="knob vectors per round")
    ap.add_argument("--heldout", action="store_true",
                    help="score the winner on the held-out split (ONCE)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    files = _load_split(args.suite, "tune")
    side = _load_sidecars()
    sr = files[0][9]
    run = _make_batch_decode(sr)
    print(f"tune split: {len(files)} suite files + {len(side)} sidecar "
          f"files", file=sys.stderr)

    def eval_batch(batch: np.ndarray, fileset) -> list:
        """-> per-knob (P, R, w50, w20, med) over the fileset."""
        kb = jnp.asarray(batch)
        f0s = []
        for (_, sal_c, energy, A, inst, grid, n_valid, _, _, _) in fileset:
            f0s.append(np.asarray(run(jnp.asarray(sal_c), jnp.asarray(energy),
                                      jnp.asarray(A), jnp.asarray(inst),
                                      jnp.asarray(grid), kb,
                                      jnp.int32(n_valid))))
        stats = []
        for b in range(len(batch)):
            per = [_score(f0s[i][b][: min(f[6], len(f[7]))], f[7], f[8])
                   for i, f in enumerate(fileset)]
            stats.append(_aggregate(per))
        return stats

    defaults = fd.DeviceF0Params().knob_vector()
    best_k, best_obj, best_stats = defaults, -1.0, None
    lo, hi = LO.copy(), HI.copy()
    for it in range(args.iters):
        batch = rng.uniform(lo, hi, size=(args.batch, len(LO))).astype(
            np.float32)
        batch[0] = best_k  # keep the incumbent in every round
        st_suite = eval_batch(batch, files)
        st_side = eval_batch(batch, side)
        for b in range(args.batch):
            # real voice is the target domain; the suite regularizes
            obj = (_objective(*st_side[b]) + 0.5 * _objective(*st_suite[b]))
            if obj > best_obj:
                best_obj, best_k = obj, batch[b].copy()
                best_stats = (st_side[b], st_suite[b])
                (P, R, w50, w20, med), (sP, sR, sw50, _, _) = best_stats
                print(f"  [{it}] obj={obj:.4f} side P={P:.3f} R={R:.3f} "
                      f"w50={w50:.3f} w20={w20:.3f} med={med:.2f}c | "
                      f"suite P={sP:.3f} R={sR:.3f} w50={sw50:.3f} "
                      f"k={np.round(batch[b], 3).tolist()}", file=sys.stderr)
        # shrink the box around the incumbent
        span = (hi - lo) * 0.55
        lo = np.maximum(LO, best_k - span / 2)
        hi = np.minimum(HI, best_k + span / 2)

    (P, R, w50, w20, med), _ = best_stats
    (sP, sR, sw50, sw20, smed) = best_stats[1]
    result = {"knobs": {"unvoiced_cost": float(best_k[0]),
                        "switch_cost": float(best_k[1]),
                        "lam": float(best_k[2]),
                        "energy_floor_db": float(best_k[3]),
                        "refine_gate_cents": float(best_k[4]),
                        "subharm2": float(best_k[5]),
                        "subharm3": float(best_k[6])},
              "sidecars": {"precision": P, "recall": R, "within_50": w50,
                           "within_20": w20, "median_cents": med},
              "tune_suite": {"precision": sP, "recall": sR,
                             "within_50": sw50, "within_20": sw20,
                             "median_cents": smed}}

    if args.heldout:
        held = _load_split(args.suite, "heldout")
        kb = jnp.asarray(best_k[None, :])
        per = []
        for (_, sal_c, energy, A, inst, grid, n_valid, truth, care,
             _) in held:
            f0 = np.asarray(run(jnp.asarray(sal_c), jnp.asarray(energy),
                                jnp.asarray(A), jnp.asarray(inst),
                                jnp.asarray(grid), kb,
                                jnp.int32(n_valid)))[0][:n_valid]
            per.append(_score(f0, truth, care))
        P, R, w50, w20, med = _aggregate(per)
        result["heldout"] = {"precision": P, "recall": R, "within_50": w50,
                             "within_20": w20, "median_cents": med}

    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    t0 = time.time()
    rc = main()
    print(f"# wall {time.time() - t0:.1f}s", file=sys.stderr)
    raise SystemExit(rc)
