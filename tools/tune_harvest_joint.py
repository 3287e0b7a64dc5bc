"""Joint offline tuner for ALL Harvest gate + DP parameters.

Round 2's offline tuner (tune_harvest_dp.py) replayed only stage 5 (the
selection DP) from a post-gate candidate dump, so the refine/amplitude
gates — which cap recall (R .891 with them, .976 without) — were out of
reach; round 2's binary-in-the-loop tuner (tune_harvest_gates.py) reached
them but at ~60 s per evaluation on this 1-CPU image.

This tool gets both: the binary dumps every refined candidate BEFORE the
gates (HARVEST_DUMP_PRE: "i f0 score snr amp" per line, native/harvest/
harvest.cc stage 4), and the full downstream pipeline — gating, overlap
sharing, neighbour-tolerance zeroing, dedup, DP, jump/short-run removal,
section extension, contour smoothing, grid sampling — is replayed here.
With `score_floor` fixed per outer combo, every SET-valued structure
(kept masks, neighbour flags, dedup groups, p90 normalizer, extension
candidates) is precomputable; the inner 8-parameter search only rescales
scores, so one evaluation is a gather + jitted DP + cheap post steps
(~seconds for all 14 files vs ~60 s through the binary).

Two deliberate approximations vs the binary (verified small with
--verify, and winning parameter vectors are ALWAYS re-measured with the
real binary before being baked in):
  - dedup groups are score-independent contiguous-run clusters (the
    binary's chain merge can shift a cluster boundary when a higher-score
    member replaces the comparison base);
  - the section-extension refine backstop is approximated by the frame's
    own pre-gate candidates at the backstop's score gate (the binary asks
    the instantaneous-frequency refiner directly).

Truth: the two pyworld sidecars (in-family truth the reference's live
path produces: ref ddsp_prematch_dataset.py:121-128) plus the synthetic
`tune` split of tools/f0_truth_suite.py as an out-of-family regularizer.
The `heldout` split is NEVER seen here.

ROUND-3 NOTE: this replay models the binary as of the round-2 pipeline.
The binary has since gained the value-dynamics stages (HARVEST_TUNE slots
17-19: chain_tol / cons_tol / snap_tol) and the tier-2 extension gate
(HARVEST_EXP slot 8), which this replay does NOT model — replay metrics at
the shipped defaults will undershoot the binary's. The round-3 fit used an
extended replay (chain re-walk + consensus extension + snap grafted onto
this file's machinery) with every winning vector re-measured through the
binary; the per-stage analysis and the measured candidate-value ceiling
live in native/harvest/harvest.cc's header and BASELINE.md. Start any
future w50 push from that ceiling analysis, not from another search here.

Usage:
  python tools/f0_truth_suite.py --out /tmp/f0suite --split tune
  python tools/tune_harvest_joint.py --capture /tmp/hj --wp 2.0 \
      --suite /tmp/f0suite
  python tools/tune_harvest_joint.py --data /tmp/hj --wp 2.0 --verify
  python tools/tune_harvest_joint.py --data /tmp/hj --wp 2.0 \
      --floor 1.277 --ov 2 --iters 300
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"  # the DP replay must not ride the TPU tunnel

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIDECARS = [
    "/root/reference/sample_content/Danakil-voice_resampled_16000_cut.wav",
    "/root/reference/sample_content/Tiken_lead_07_resampled_16000_cut.wav",
]

# mirrors native/harvest/harvest.cc constants
MAX_BASE = 12           # kMaxCandidates
NEIGHBOR_TOL = 0.05     # kNeighborTolerance
DEDUP_RATIO = 1.005
JUMP_RANGE = 0.008 * 4.0
MIN_VOICED_RUN = 9
MAX_EXTEND = 400
EXTEND_REFINE_SCORE = 5.0
EXTEND_REFINE_BUDGET = 120
SMOOTH_CUTOFF = 30.0
F0_FLOOR, F0_CEIL, F0_ZERO_BELOW = 65.0, 1047.0, 80.0
STEP_MS = 20.0
TOPK = 32               # DP state cap (binary applies the same top-32
                        # cap since r3: harvest.cc kDpCandidateCap)

NAMES = ["lambda", "toggle", "unvoiced", "cand_base", "energy_knee",
         "extend_tol", "snr_knee", "rel_gamma"]
DEFAULTS = dict(score_floor=1.277, lam=6.729, toggle=4.0, unvoiced=0.262,
                cand_base=0.766, energy_knee=0.13, extend_tol=0.235,
                snr_knee=6.342, rel_gamma=1.383)
RANGES = [(1.0, 40.0), (0.5, 12.0), (0.05, 1.5), (0.05, 30.0),
          (0.0003, 0.5), (0.04, 0.4), (0.2, 40.0), (0.0001, 3.0)]


# ---------------------------------------------------------------------------
# capture

def capture(data_dir: str, wp: float, suite: str | None) -> None:
    """Run the binary once per file with HARVEST_DUMP_PRE, save npz bundles."""
    from knnsvc_tpu.io.audio import load_audio, to_mono
    import knnsvc_tpu.dsp.harvest as h

    out = Path(data_dir) / f"wp{wp:g}"
    out.mkdir(parents=True, exist_ok=True)
    jobs = []
    for p in SIDECARS:
        jobs.append((p, "sidecar"))
    if suite:
        for wav in sorted((Path(suite) / "tune").glob("*.wav")):
            jobs.append((str(wav), "suite"))
    for path, kind in jobs:
        stem = Path(path).stem
        x, sr = load_audio(path)
        x = to_mono(x)[0]
        dump = out / f"{stem}.dump"
        os.environ["HARVEST_EXP"] = f"{wp:g}"
        os.environ["HARVEST_DUMP_PRE"] = str(dump)
        try:
            t0 = time.perf_counter()
            bin_f0 = np.asarray(h.harvest_f0(x, sr), dtype=np.float64)
            dt = time.perf_counter() - t0
        finally:
            os.environ.pop("HARVEST_EXP", None)
            os.environ.pop("HARVEST_DUMP_PRE", None)
        if kind == "sidecar":
            ref = np.load(Path(path).with_name(stem + "_f0.npy"))
            n = len(x) // 320 + 1
            ref = np.asarray(ref[:n], dtype=np.float64)
            care = np.ones(len(ref), bool)
        else:
            ref = np.load(Path(path).with_name(stem + "_truth.npy"))
            care = np.load(Path(path).with_name(stem + "_care.npy"))
        raw = np.loadtxt(dump, ndmin=2)
        dump.unlink()
        n_int = int(1000.0 * len(x) / sr) + 1
        np.savez_compressed(out / f"{stem}.npz", raw=raw, ref=ref, care=care,
                            bin_f0=bin_f0, n_int=n_int, kind=kind,
                            audio_path=path)
        print(f"  {stem}: {len(raw)} cands, {n_int} int frames, "
              f"{len(ref)} out frames [{dt:.0f}s]")


# ---------------------------------------------------------------------------
# static per-combo precomputation

class FileData:
    pass


def build_static(npz_path: Path, floor: float, ov: int) -> FileData:
    d = np.load(npz_path, allow_pickle=True)
    fd = FileData()
    fd.name = npz_path.stem
    fd.kind = str(d["kind"])
    fd.ref = d["ref"]
    fd.care = d["care"]
    fd.bin_f0 = d["bin_f0"]
    N = int(d["n_int"])
    fd.N = N
    raw = d["raw"]

    # ragged -> (N, MAX_BASE) padded base arrays
    f0 = np.zeros((N, MAX_BASE), np.float64)
    sc = np.zeros((N, MAX_BASE), np.float64)
    snr = np.zeros((N, MAX_BASE), np.float64)
    amp = np.zeros((N, MAX_BASE), np.float64)
    cnt = np.zeros(N, np.int32)
    for row in raw:
        i = int(row[0])
        if i >= N or cnt[i] >= MAX_BASE:
            continue
        k = cnt[i]
        f0[i, k], sc[i, k], snr[i, k], amp[i, k] = row[1:5]
        cnt[i] += 1
    valid = np.arange(MAX_BASE)[None, :] < cnt[:, None]
    kept = valid & (f0 > 0) & (sc >= floor)
    fd.base_f0, fd.base_sc, fd.base_snr, fd.base_amp = f0, sc, snr, amp
    fd.kept = kept

    # p90 of per-frame max kept amp (harvest.cc:449-460)
    frame_max = np.where(kept, amp, 0.0).max(axis=1)
    nz = np.sort(frame_max[frame_max > 0])
    fd.p90 = nz[int(0.9 * (len(nz) - 1))] if len(nz) else 0.0
    fd.frame_max = np.maximum(frame_max, 1e-12)

    # overlapped gather map: position i takes base frames i-ov..i+ov
    Mo = (2 * ov + 1) * MAX_BASE
    offs = np.arange(-ov, ov + 1)
    src_frame = (np.arange(N)[:, None, None] + offs[None, :, None])  # (N,2ov+1,1)
    src_frame = np.broadcast_to(src_frame, (N, 2 * ov + 1, MAX_BASE))
    src_slot = np.broadcast_to(np.arange(MAX_BASE)[None, None, :],
                               src_frame.shape)
    in_rng = (src_frame >= 0) & (src_frame < N)
    src_frame = np.clip(src_frame, 0, N - 1)
    ov_f0 = f0[src_frame, src_slot]
    ov_kept = kept[src_frame, src_slot] & in_rng
    fd.src_frame = src_frame.reshape(N, Mo)
    fd.src_slot = src_slot.reshape(N, Mo)
    fd.ov_f0 = ov_f0.reshape(N, Mo)
    fd.ov_kept = ov_kept.reshape(N, Mo)

    # neighbour-tolerance zero flags (harvest.cc:491-502): candidate at
    # position i is zeroed if, on either in-range side i+-1, no candidate of
    # overlapped[i+-1] is within 5 % relative f0. Computed by shifting the
    # per-position min-ratio tables.
    big = 1e18
    covf = np.where(fd.ov_kept, fd.ov_f0, np.nan)

    def min_ratio_to(pos_delta: int) -> np.ndarray:
        # for each (i, c in overlapped[i]): min over o in overlapped[i+d]
        nb_f0 = np.full_like(covf, np.nan)
        if pos_delta == -1:
            nb_f0[1:] = covf[:-1]
        else:
            nb_f0[:-1] = covf[1:]
        # (N, Mo, Mo) would blow memory; chunk over rows
        out = np.full((N, Mo), big)
        chunk = max(1, int(4e6 // (Mo * Mo)))
        with np.errstate(divide="ignore", invalid="ignore"):
            for s in range(0, N, chunk):
                e = min(N, s + chunk)
                r = np.abs(nb_f0[s:e, None, :] / fd.ov_f0[s:e, :, None] - 1.0)
                out[s:e] = np.where(np.isnan(r), big, r).min(axis=2)
        return out

    zero = np.zeros((N, Mo), bool)
    left = min_ratio_to(-1)
    zero[1:] |= left[1:] > NEIGHBOR_TOL
    right = min_ratio_to(+1)
    zero[:-1] |= right[:-1] > NEIGHBOR_TOL
    fd.ov_live = fd.ov_kept & ~zero & (fd.ov_f0 > 0)

    # dedup groups (approximate, score-independent): per position, sort live
    # candidates by f0, chain runs with consecutive ratio < 1.005
    order = np.argsort(np.where(fd.ov_live, fd.ov_f0, np.inf), axis=1,
                       kind="stable")
    sf0 = np.take_along_axis(np.where(fd.ov_live, fd.ov_f0, np.inf), order, 1)
    new_group = np.ones((N, Mo), bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = sf0[:, 1:] / np.maximum(sf0[:, :-1], 1e-12)
    new_group[:, 1:] = ~(ratio < DEDUP_RATIO)  # inf/nan (padding) start groups
    gid_local = np.cumsum(new_group, axis=1) - 1      # (N, Mo) group within row
    fd.order = order
    fd.gid = (np.arange(N)[:, None] * Mo + gid_local).astype(np.int64)
    fd.sorted_live = np.take_along_axis(fd.ov_live, order, 1)
    fd.sorted_f0 = np.where(fd.sorted_live,
                            np.take_along_axis(fd.ov_f0, order, 1), 0.0)
    fd.Mo = Mo

    # extension backstop surrogate: pre-gate candidates at refine-score gate
    fd.ext_f0 = np.where(valid & (f0 > 0) & (sc >= EXTEND_REFINE_SCORE),
                         f0, 0.0)
    return fd


# ---------------------------------------------------------------------------
# inner evaluation

def make_scorer(fd: FileData):
    """-> jitted fn(params) -> (sel_f0 (N,), live_f0 (N,K), live_sc (N,K))."""
    import jax

    # sitecustomize re-registers the axon plugin and overrides JAX_PLATFORMS
    # at interpreter start; config.update is the reliable CPU pin (conftest).
    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    base_sc = jnp.asarray(fd.base_sc, jnp.float32)
    base_snr = jnp.asarray(fd.base_snr, jnp.float32)
    base_amp = jnp.asarray(fd.base_amp, jnp.float32)
    kept = jnp.asarray(fd.kept)
    frame_max = jnp.asarray(fd.frame_max, jnp.float32)
    src_frame = jnp.asarray(fd.src_frame)
    src_slot = jnp.asarray(fd.src_slot)
    ov_live = jnp.asarray(fd.ov_live)
    order = jnp.asarray(fd.order)
    gid = jnp.asarray(fd.gid)
    sorted_f0 = jnp.asarray(fd.sorted_f0, jnp.float32)
    sorted_live = jnp.asarray(fd.sorted_live)
    p90 = float(fd.p90)
    N, Mo = fd.N, fd.Mo
    K = min(TOPK, Mo)
    BIG = jnp.float32(1e9)

    @jax.jit
    def run(lam, toggle, unvoiced, cand_base, energy_knee, snr_knee,
            rel_gamma):
        # gates (harvest.cc:439-469)
        s = base_sc * base_snr / (base_snr + snr_knee)
        knee = jnp.maximum(energy_knee * p90, 1e-12)
        rel = jnp.power(jnp.maximum(base_amp, 1e-30) / frame_max[:, None],
                        rel_gamma)
        s = s * rel * base_amp / (base_amp + knee)
        s = jnp.where(kept, s, 0.0)
        # overlap gather + neighbour zeroing + dedup group-max
        ov_s = jnp.where(ov_live, s[src_frame, src_slot], 0.0)
        ss = jnp.take_along_axis(ov_s, order, 1)          # sorted by f0
        flat_s = ss.reshape(-1)
        seg_max = jax.ops.segment_max(flat_s, gid.reshape(-1),
                                      num_segments=N * Mo,
                                      indices_are_sorted=True)
        smax = seg_max[gid]                                # (N, Mo) sorted view
        is_rep = sorted_live & (ss >= smax) & (ss > 0)
        # two reps can tie; keep only the first occurrence per group
        occ = jnp.cumsum(is_rep, axis=1)
        prev_occ = occ - is_rep.astype(occ.dtype)
        grp_first_occ = jax.ops.segment_min(
            jnp.where(is_rep, prev_occ, jnp.iinfo(jnp.int32).max).reshape(-1),
            gid.reshape(-1), num_segments=N * Mo, indices_are_sorted=True)[gid]
        is_rep = is_rep & (prev_occ == grp_first_occ)
        rep_s = jnp.where(is_rep, ss, 0.0)
        rep_f0 = jnp.where(is_rep, sorted_f0, 0.0)
        # top-K live candidates per frame
        top_s, top_i = jax.lax.top_k(rep_s, K)
        top_f0 = jnp.take_along_axis(rep_f0, top_i, 1)
        live = top_s > 0
        # DP (harvest.cc:539-598)
        log_f0 = jnp.where(live, jnp.log2(jnp.maximum(top_f0, 1e-6)), 0.0)
        local = jnp.where(live, cand_base / (cand_base + top_s), BIG)
        local = jnp.concatenate([local, jnp.full((N, 1), unvoiced,
                                                 jnp.float32)], 1)
        vmask = jnp.concatenate([live, jnp.ones((N, 1), bool)], 1)
        lf0 = jnp.concatenate([log_f0, jnp.zeros((N, 1), jnp.float32)], 1)

        def body(carry, inputs):
            prev_cost, prev_lf0, prev_v = carry
            cost_i, lf0_i, v_i = inputs
            both = prev_v[:, None] & v_i[None, :-1]
            jump = lam * jnp.abs(lf0_i[None, :-1] - prev_lf0[:, None])
            tr_vv = jnp.where(both, jump, BIG)
            tr_vv = jnp.where(prev_v[:, None] & ~v_i[None, :-1], BIG, tr_vv)
            toggle_in = jnp.where(prev_v, toggle, BIG)    # voiced -> unvoiced
            toggle_out = jnp.where(v_i[:-1], toggle, BIG)  # unvoiced -> voiced
            tr = jnp.concatenate([tr_vv, toggle_in[:, None]], 1)
            from_unv = jnp.concatenate([toggle_out, jnp.zeros(1)])
            tr = tr.at[-1, :].set(from_unv)
            total = prev_cost[:, None] + tr
            best = jnp.min(total, axis=0)
            arg = jnp.argmin(total, axis=0)
            cost = jnp.where(v_i, cost_i + best, BIG)
            return (cost, lf0_i, v_i), arg

        init = (jnp.where(vmask[0], local[0], BIG), lf0[0], vmask[0])
        (last_cost, _, _), args = jax.lax.scan(
            body, init, (local[1:], lf0[1:], vmask[1:]))
        j_last = jnp.argmin(last_cost)

        def back(j, arg_row):
            return arg_row[j], j

        j0, picks = jax.lax.scan(back, j_last, args, reverse=True)
        picks = jnp.concatenate([j0[None], picks])
        f0_ext = jnp.concatenate([top_f0, jnp.zeros((N, 1), jnp.float32)], 1)
        sel = jnp.take_along_axis(f0_ext, picks[:, None], 1)[:, 0]
        return sel, top_f0, top_s

    def scorer(params):
        f32 = np.float32
        sel, tf0, ts = run(f32(params["lam"]), f32(params["toggle"]),
                           f32(params["unvoiced"]), f32(params["cand_base"]),
                           f32(params["energy_knee"]), f32(params["snr_knee"]),
                           f32(params["rel_gamma"]))
        return (np.asarray(sel, np.float64), np.asarray(tf0, np.float64),
                np.asarray(ts, np.float64))

    return scorer


def fix_jumps_and_short_runs(f0: np.ndarray) -> np.ndarray:
    f0 = f0.copy()
    n = len(f0)
    for i in range(1, n):
        if f0[i] == 0.0 or f0[i - 1] == 0.0:
            continue
        if abs(f0[i] - f0[i - 1]) / f0[i] > JUMP_RANGE:
            f0[i] = 0.0
    v = f0 > 0
    edges = np.flatnonzero(np.diff(np.concatenate([[0], v.view(np.int8),
                                                   [0]])))
    for s, e in zip(edges[::2], edges[1::2]):
        if e - s < MIN_VOICED_RUN:
            f0[s:e] = 0.0
    return f0


def extend_sections(f0: np.ndarray, live_f0, live_sc, ext_f0,
                    tol: float) -> np.ndarray:
    """harvest.cc:253-310 with the refine backstop approximated by the
    frame's own pre-gate candidates at the backstop's score gate."""
    f0 = f0.copy()
    n = len(f0)

    def best_match(j, v, budget):
        c = live_f0[j][live_sc[j] > 0]
        if len(c):
            err = np.abs(c / v - 1.0)
            k = np.argmin(err)
            if err[k] < tol:
                return c[k], budget
        if budget > 0:
            c = ext_f0[j][ext_f0[j] > 0]
            if len(c):
                err = np.abs(c / v - 1.0)
                k = np.argmin(err)
                if err[k] < tol:
                    return c[k], budget - 1
        return 0.0, budget

    for i in range(1, n):
        if f0[i] != 0.0 or f0[i - 1] == 0.0:
            continue
        v = f0[i - 1]
        budget = EXTEND_REFINE_BUDGET
        for j in range(i, min(n, i + MAX_EXTEND)):
            if f0[j] != 0.0:
                break
            m, budget = best_match(j, v, budget)
            if m == 0.0:
                break
            f0[j] = m
            v = m
    for i in range(n - 2, -1, -1):
        if f0[i] != 0.0 or f0[i + 1] == 0.0:
            continue
        v = f0[i + 1]
        budget = EXTEND_REFINE_BUDGET
        for j in range(i, max(-1, i - MAX_EXTEND), -1):
            if f0[j] != 0.0:
                break
            m, budget = best_match(j, v, budget)
            if m == 0.0:
                break
            f0[j] = m
            v = m
    return f0


def smooth_contour(f0: np.ndarray) -> np.ndarray:
    from scipy.signal import lfilter, lfiltic

    K = np.tan(np.pi * SMOOTH_CUTOFF / 1000.0)
    norm = 1.0 / (1.0 + np.sqrt(2.0) * K + K * K)
    b = [K * K * norm, 2 * K * K * norm, K * K * norm]
    a = [1.0, 2.0 * (K * K - 1.0) * norm,
         (1.0 - np.sqrt(2.0) * K + K * K) * norm]

    def biquad(y):
        zi = lfiltic(b, a, [y[0], y[0]], [y[0], y[0]])
        return lfilter(b, a, y, zi=zi)[0]

    f0 = f0.copy()
    n = len(f0)
    pad = 30
    v = f0 > 0
    edges = np.flatnonzero(np.diff(np.concatenate([[0], v.view(np.int8),
                                                   [0]])))
    for s, e in zip(edges[::2], edges[1::2]):
        ln = e - s
        k0 = min(5, ln - 1)
        sl = (f0[s + k0] - f0[s]) / k0 if k0 > 0 else 0.0
        sr = (f0[e - 1] - f0[e - 1 - k0]) / k0 if k0 > 0 else 0.0
        seg = np.concatenate([
            np.maximum(1.0, f0[s] - sl * np.arange(pad, 0, -1)),
            f0[s:e],
            np.maximum(1.0, f0[e - 1] + sr * np.arange(1, pad + 1)),
        ])
        seg = biquad(seg)
        seg = biquad(seg[::-1])[::-1]
        f0[s:e] = seg[pad:pad + ln]
    return f0


def finish(sel: np.ndarray, n_out: int) -> np.ndarray:
    idx = np.minimum(np.round(np.arange(n_out) * STEP_MS).astype(int),
                     len(sel) - 1)
    out = sel[idx].copy()
    out[(out < F0_FLOOR) | (out > F0_CEIL)] = 0.0
    out[out < F0_ZERO_BELOW] = 0.0
    return out


def replay(fd: FileData, scorer, params) -> np.ndarray:
    sel, live_f0, live_sc = scorer(params)
    sel = fix_jumps_and_short_runs(sel)
    sel = extend_sections(sel, live_f0, live_sc, fd.ext_f0,
                          params["extend_tol"])
    sel = smooth_contour(sel)
    return finish(sel, len(fd.ref))


def metrics(out: np.ndarray, ref: np.ndarray, care: np.ndarray) -> dict:
    rv = (ref > 0) & care
    ov = (out > 0) & care
    tp = int((rv & ov).sum())
    fp = int((~(ref > 0) & care & (out > 0)).sum())
    fn = int((rv & ~(out > 0)).sum())
    both = rv & ov
    cents = (1200 * np.abs(np.log2(out[both] / ref[both]))
             if both.any() else np.zeros(0))
    return {"tp": tp, "fp": fp, "fn": fn,
            "w50": int((cents < 50).sum()), "co": int(both.sum())}


def pool_metrics(ms) -> tuple[float, float, float]:
    tp = sum(m["tp"] for m in ms)
    fp = sum(m["fp"] for m in ms)
    fn = sum(m["fn"] for m in ms)
    w50 = sum(m["w50"] for m in ms) / max(sum(m["co"] for m in ms), 1)
    return tp / max(tp + fp, 1), tp / max(tp + fn, 1), w50


def gate_score(p, r, w50, cap=1.05, w50_weight=1.0):
    return (min(p / 0.95, cap) + min(r / 0.95, cap)
            + w50_weight * min(w50 / 0.95, cap))


# ---------------------------------------------------------------------------

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--capture", help="capture dumps into this directory")
    ap.add_argument("--data", help="directory with captured npz bundles")
    ap.add_argument("--suite", help="f0_truth_suite directory (capture)")
    ap.add_argument("--wp", type=float, default=3.0,
                    help="refine window periods (dump dimension)")
    ap.add_argument("--floor", type=float, default=DEFAULTS["score_floor"])
    ap.add_argument("--ov", type=int, default=2)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verify", action="store_true",
                    help="compare the replay to the binary at defaults")
    ap.add_argument("--start", default=None,
                    help="comma list for the 8 inner params")
    ap.add_argument("--suite-weight", type=float, default=1.0)
    ap.add_argument("--w50-weight", type=float, default=1.0,
                    help="extra weight on sidecar within-50-cents in the "
                         "objective (refinement passes: the P/R frontier "
                         "saturates before the cents accuracy does)")
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    if args.capture:
        capture(args.capture, args.wp, args.suite)
        return 0

    data_dir = Path(args.data) / f"wp{args.wp:g}"
    files = sorted(data_dir.glob("*.npz"))
    if not files:
        print(f"no npz bundles under {data_dir}", file=sys.stderr)
        return 1
    print(f"building static structures (floor={args.floor}, ov={args.ov}) …")
    t0 = time.time()
    fds = [build_static(p, args.floor, args.ov) for p in files]
    scorers = [make_scorer(fd) for fd in fds]
    print(f"  {len(fds)} files, {sum(fd.N for fd in fds)} frames "
          f"[{time.time() - t0:.0f}s]")

    params = dict(DEFAULTS)
    params["score_floor"] = args.floor
    if args.start:
        for k, v in zip(NAMES, args.start.split(",")):
            params[{"lambda": "lam"}.get(k, k)] = float(v)

    def evaluate(params):
        ms_side, ms_suite = [], []
        for fd, scorer in zip(fds, scorers):
            out = replay(fd, scorer, params)
            m = metrics(out, fd.ref, fd.care)
            (ms_side if fd.kind == "sidecar" else ms_suite).append(m)
        ps, rs, ws = pool_metrics(ms_side)
        if ms_suite:
            pu, ru, wu = pool_metrics(ms_suite)
        else:
            pu = ru = wu = 1.0
        obj = (2.0 * gate_score(ps, rs, ws, w50_weight=args.w50_weight)
               + args.suite_weight * gate_score(pu, ru, wu))
        return obj, (ps, rs, ws), (pu, ru, wu)

    if args.verify:
        mism = []
        for fd, scorer in zip(fds, scorers):
            out = replay(fd, scorer, params)
            b = fd.bin_f0[:len(out)]
            o = out[:len(b)]
            vdiff = (o > 0) != (b > 0)
            cents = np.zeros(len(o))
            both = (o > 0) & (b > 0)
            cents[both] = 1200 * np.abs(np.log2(o[both] / b[both]))
            mism.append((fd.name, vdiff.mean(), (cents > 10).mean()))
            print(f"  {fd.name:24s} voicing mismatch {vdiff.mean():.4f}  "
                  f">10c {(cents > 10).mean():.4f}")
        obj, sc, su = evaluate(params)
        print(f"replay @ defaults: sidecars P={sc[0]:.4f} R={sc[1]:.4f} "
              f"w50={sc[2]:.4f} | suite P={su[0]:.4f} R={su[1]:.4f} "
              f"w50={su[2]:.4f}")
        return 0

    best, sc, su = evaluate(params)
    best_p = dict(params)
    print(f"start: obj={best:.4f} | sidecars P={sc[0]:.4f} R={sc[1]:.4f} "
          f"w50={sc[2]:.4f} | suite P={su[0]:.4f} R={su[1]:.4f} "
          f"w50={su[2]:.4f}")
    if args.eval_only:
        return 0

    keys = ["lam", "toggle", "unvoiced", "cand_base", "energy_knee",
            "extend_tol", "snr_knee", "rel_gamma"]
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for it in range(args.iters):
        cand = dict(best_p)
        if it % 6 == 0:
            for k, (lo, hi) in zip(keys, RANGES):
                if rng.random() < 0.4:
                    cand[k] = float(np.exp(rng.uniform(np.log(lo),
                                                       np.log(hi))))
        else:
            for k, (lo, hi) in zip(keys, RANGES):
                if rng.random() < 0.5:
                    cand[k] = float(np.clip(
                        cand[k] * np.exp(rng.normal(0, 0.25)), lo, hi))
        obj, sc, su = evaluate(cand)
        if obj > best:
            best, best_p = obj, cand
            vals = ",".join(f"{cand[k]:.6g}" for k in keys)
            print(f"[{it} {time.time() - t0:.0f}s] obj={obj:.4f} | "
                  f"sc P={sc[0]:.4f} R={sc[1]:.4f} w50={sc[2]:.4f} | "
                  f"su P={su[0]:.4f} R={su[1]:.4f} w50={su[2]:.4f}\n"
                  f"   inner={vals}")

    tune = ",".join(f"{x:.6g}" for x in [
        best_p["score_floor"], best_p["lam"], best_p["toggle"],
        best_p["unvoiced"], best_p["cand_base"], best_p["energy_knee"],
        best_p["extend_tol"], best_p["snr_knee"], best_p["rel_gamma"]])
    print(f"\nBEST obj={best:.4f}")
    print(f"HARVEST_TUNE={tune}")
    print(f"HARVEST_EXP={args.wp:g},{args.ov}")
    print(json.dumps(best_p, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
