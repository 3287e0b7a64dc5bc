"""Device-resident f0 extraction (spectral harmonic summation, pure JAX).

The serving fast path's f0 has always been the one compute stage left on the
host (the reference binds pyworld's C++ Harvest — ddsp_prematch_dataset.py:
121-128 — and this rebuild's budget Harvest is a native C++ port). On a
TPU-first design that is backwards: the accelerator sits idle while one host
core crunches zero-crossing statistics, and at sustained serving depth the
host extractor becomes the pipeline's serializer (30 s of audio at ~120x RT
costs ~0.5 s of host time per conversion — alone enough to cap a >50x
steady-state rate). This module moves the whole extractor onto the device as
three XLA-friendly pieces:

1. **Salience**: zero-padded STFTs (hop 320, nfft 4096) at THREE analysis
   windows — 1024/512/256 samples, each serving the candidate octave range
   whose periods it spans ~4x (65-130 / 130-260 / 260-1047 Hz; pitch-
   adaptive windows are how Harvest/SWIPE keep time resolution at high f0,
   where a fixed 64 ms window smears natural vibrato and speech prosody
   into tens of cents of error) — and one MXU matmul `A @ M.T` against a
   precomputed harmonic-comb matrix M over the band-concatenated spectra:
   log-spaced f0 candidates (65..1047 Hz, 10-cent grid), each row the
   linear-interpolation stencil of its first K harmonics (1/k weighted) in
   its band's spectrum segment, minus half-harmonic negative evidence
   (octave-error suppression, SWIPE' style — Camacho & Harris 2008, public
   method). Salience is contrast-normalized per frame (max-vs-mean over
   candidates): a flat noise spectrum excites every comb row near-equally
   (~0.55 after the 1/k normalization), so raw salience cannot separate
   voiced from unvoiced — the per-frame candidate mean is the noise floor
   and is subtracted.
2. **Viterbi smoothing**: a (C+1)-state min-cost path with
   lam * |delta log2 f| transition cost and an explicit unvoiced state —
   replaces Harvest's contour stitching. Because the candidate grid is
   uniform in log2, the voiced->voiced min reduces to a 1-D distance
   transform (two cumulative-min passes, O(C) per frame instead of O(C^2)).
3. **Refinement**: instantaneous frequency from a unit-sample-delay phase
   difference (arg(S2 conj(S1)) * sr / 2pi, unambiguous in (-sr/2, sr/2]);
   the selected candidate's first harmonics vote f_k = IF(bin_k)/k and a
   consistency-gated weighted mean sharpens the 10-cent grid to ~cents.

The economics knobs (voicing knee, switch cost, transition weight, energy
floor, refinement gate) are TRACED scalars — retuning never recompiles, and
`tools/tune_f0_device.py` grid-searches them against the synthetic truth
suite's tune split (the held-out split is never touched during fitting).

Output contract matches the reference extractor family (and dsp/f0.py):
n_frames = T//hop + 1, frame i centered at sample i*hop, 0 = unvoiced,
voiced estimates below 80 Hz zeroed (ref ddsp_matcher.py:410-426).

Everything is shape-static per frame-count bucket; the host wrapper pads to
a bucket and jits once per bucket.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

F0_FLOOR = 65.0
F0_CEIL = 1047.0
F0_ZERO_BELOW = 80.0
DEFAULT_HOP = 320

# (f0_lo, f0_hi, analysis window): each candidate's comb reads the spectrum
# of the window spanning ~4 of its periods — the pitch-adaptive analysis
# that keeps high-f0 time resolution (see module docstring).
BANDS = ((65.0, 130.0, 1024), (130.0, 260.0, 512), (260.0, 1200.0, 256))


@dataclass(frozen=True)
class DeviceF0Params:
    """Comb-shape fields (window..neg_weight) are static — changing them
    rebuilds M and recompiles. Economics fields (unvoiced_cost..
    refine_gate_cents) are traced — see `knob_vector`."""

    window: int = 1024
    nfft: int = 4096
    n_harmonics: int = 8
    grid_cents: float = 10.0
    neg_weight: float = 0.45        # half-harmonic negative evidence
    # --- traced economics (fit via tools/tune_f0_device.py on the suite's
    # tune split + the two real-voice sidecar files, never the held-out
    # split; measured: held-out synthetic P 1.000 / R .949 / w50 .974 /
    # w20 .971 / median 0.51 cents — ABOVE the native full Harvest's .936 —
    # and sidecar real voice P .849 / R .931 / w50 .810 / median 8.7 cents,
    # below budget Harvest's .953/.877: the residual errors concentrate on
    # fast pitch transitions (>60 cents/frame), where a windowed analysis
    # disagrees with pyworld's 1-ms contours about WHEN the pitch moved.
    # See BASELINE.md for the end-to-end fidelity impact. ------------------
    unvoiced_cost: float = 0.796    # voicing knee on per-frame contrast
    switch_cost: float = 0.291     # voiced<->unvoiced transition
    lam: float = 0.753              # transition cost per |delta log2 f0|
    energy_floor_db: float = -68.1  # absolute silence gate (vs file peak)
    refine_gate_cents: float = 115.7
    # super-harmonic suppression: penalize candidate c by the salience of
    # c/2 and c/3 — if a sub-harmonic ALSO explains the spectrum, c is
    # probably harmonic 2/3 of the true pitch. (The comb's half-harmonic
    # negatives kill the 2f error; the 3f error has no such hole — all of
    # 3f's harmonics AND its half-harmonic positions are clean for a true
    # pitch at f, so only this cross-candidate evidence catches it.)
    subharm2: float = 0.030
    subharm3: float = 0.082

    def static_key(self) -> "DeviceF0Params":
        """The recompile identity: economics zeroed out."""
        return DeviceF0Params(self.window, self.nfft, self.n_harmonics,
                              self.grid_cents, self.neg_weight)

    def knob_vector(self) -> np.ndarray:
        return np.array([self.unvoiced_cost, self.switch_cost, self.lam,
                         self.energy_floor_db, self.refine_gate_cents,
                         self.subharm2, self.subharm3],
                        dtype=np.float32)


def _candidate_grid(p: DeviceF0Params) -> np.ndarray:
    n = int(np.floor(1200.0 * np.log2(F0_CEIL / F0_FLOOR) / p.grid_cents)) + 1
    return (F0_FLOOR * 2.0 ** (np.arange(n) * p.grid_cents / 1200.0)).astype(
        np.float32)


@functools.lru_cache(maxsize=4)
def _comb_matrix(
        sr: int, p: DeviceF0Params
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(C, n_bands*F) harmonic-comb interpolation stencils, the (C,)
    candidate grid, and the (C,) int32 spectrum-segment offset of each
    candidate's band. Row c sums |S| at bins k*f_c (1/k weights) in its
    band's segment and subtracts neg_weight * the same comb at (k-0.5)*f_c.
    Built once on the host."""
    grid = _candidate_grid(p)
    n_bins = p.nfft // 2 + 1
    bin_hz = sr / p.nfft
    band_idx = np.zeros(len(grid), dtype=np.int64)
    for b, (lo_hz, hi_hz, _) in enumerate(BANDS):
        band_idx[(grid >= lo_hz) & (grid < hi_hz)] = b
    M = np.zeros((len(grid), len(BANDS) * n_bins), dtype=np.float32)
    wsum = np.zeros(len(grid), dtype=np.float32)
    seg = band_idx * n_bins
    for k in range(1, p.n_harmonics + 1):
        w = 1.0 / k
        for sign, mul, ww in ((1.0, float(k), w),
                              (-p.neg_weight, k - 0.5, w)):
            pos = grid * mul / bin_hz
            lo = np.floor(pos).astype(np.int64)
            frac = (pos - lo).astype(np.float32)
            ok = pos < n_bins - 1
            idx = np.where(ok, lo, 0) + seg
            np.add.at(M, (np.arange(len(grid)), idx),
                      np.where(ok, sign * ww * (1 - frac), 0.0))
            np.add.at(M, (np.arange(len(grid)),
                          np.minimum(idx + 1, seg + n_bins - 1)),
                      np.where(ok, sign * ww * frac, 0.0))
        wsum += np.where(grid * k / bin_hz < n_bins - 1, w, 0.0)
    # normalize each row by its live positive weight so low/high candidates
    # (fewer in-band harmonics) are comparable
    M /= np.maximum(wsum, 1e-6)[:, None]
    return M, grid, (seg).astype(np.int32)


def _frame(x: jnp.ndarray, n_frames: int, window: int,
           hop: int) -> jnp.ndarray:
    """(T,) -> (N, window+1) frames centered at i*hop (one extra sample for
    the unit-delay IF pair)."""
    half = window // 2
    xp = jnp.pad(x, (half, half + window))
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(window + 1)[None, :]
    return xp[idx]


def _cummin_arg(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Running (min, leftmost argmin) along axis 0 — associative."""
    idx = jnp.arange(v.shape[0], dtype=jnp.int32)

    def op(a, b):
        va, ia = a
        vb, ib = b
        take_a = va <= vb
        return jnp.where(take_a, va, vb), jnp.where(take_a, ia, ib)

    return jax.lax.associative_scan(op, (v, idx))


def _dt_min(dv: jnp.ndarray, lam_s: jnp.ndarray,
            ramp: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """best[j] = min_i dv[i] + lam_s*|i-j| (and its argmin), in O(C).

    Exploits the log-uniform grid: the transition cost is a 1-D distance
    transform — a forward and a backward cumulative-min of dv -+ i*lam_s.
    `ramp` is arange(C) as floats (hoisted by the caller)."""
    shift = ramp * lam_s
    lv, li = _cummin_arg(dv - shift)
    left = lv + shift              # min over i <= j of dv[i] + (j-i)*lam
    rv, ri = _cummin_arg((dv + shift)[::-1])
    right = rv[::-1] - shift       # min over i >= j of dv[i] + (i-j)*lam
    ri = (dv.shape[0] - 1 - ri)[::-1]
    take_l = left <= right
    return jnp.where(take_l, left, right), jnp.where(take_l, li, ri)


def _viterbi(cost_v: jnp.ndarray, cost_u: jnp.ndarray, lam_s: jnp.ndarray,
             switch: jnp.ndarray) -> jnp.ndarray:
    """Min-cost path over N frames x (C voiced states + unvoiced).

    cost_v (N, C): per-frame voiced emission cost; cost_u (N,): unvoiced.
    lam_s: transition cost per unit grid-index distance (traced). Returns
    (N,) int32 state indices, C meaning unvoiced."""
    N, C = cost_v.shape
    ramp = jnp.arange(C, dtype=cost_v.dtype)

    def fwd(carry, em):
        dv, du = carry                       # running costs (C,), ()
        ev, eu = em
        # into voiced state j: from the best voiced i (distance transform)
        # or from unvoiced (+switch)
        best_v, arg_v = _dt_min(dv, lam_s, ramp)
        stay_u = du + switch
        new_dv = jnp.minimum(best_v, stay_u) + ev
        ptr_v = jnp.where(best_v <= stay_u, arg_v, C)
        # into unvoiced: from unvoiced or the best voiced + switch
        best_from_v = jnp.min(dv) + switch
        arg_from_v = jnp.argmin(dv).astype(jnp.int32)
        new_du = jnp.minimum(du, best_from_v) + eu
        ptr_u = jnp.where(du <= best_from_v, C, arg_from_v)
        # keep running costs near zero (cheap; N*1e3 pad emissions otherwise
        # push fp32 toward precision loss on long files)
        m = jnp.minimum(jnp.min(new_dv), new_du)
        return (new_dv - m, new_du - m), (ptr_v, ptr_u)

    init = (cost_v[0], cost_u[0])
    (dv, du), (ptr_v, ptr_u) = jax.lax.scan(fwd, init,
                                            (cost_v[1:], cost_u[1:]))
    last = jnp.where(jnp.min(dv) <= du, jnp.argmin(dv), C).astype(jnp.int32)

    def back(state, ptrs):
        # ptrs[k] maps frame k+1's state to frame k's; the emitted value
        # must be the PREDECESSOR (frame k's state), not the carry — the
        # carry is frame k+1's, already emitted by the previous step
        pv, pu = ptrs
        prev = jnp.where(state == C, pu, pv[jnp.minimum(state, C - 1)])
        prev = prev.astype(jnp.int32)
        return prev, prev

    _, states = jax.lax.scan(back, last, (ptr_v, ptr_u), reverse=True)
    return jnp.concatenate([states, last[None]])


def _features(frames: jnp.ndarray, sr: int, p: DeviceF0Params
              ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Knob-independent per-frame features: contrast-normalized salience
    (N, C), frame energy (N,), band-concatenated sqrt-magnitude
    (N, n_bands*F), instantaneous frequency per bin (N, n_bands*F). The
    expensive half (FFTs + the MXU matmul)."""
    M_np, _, seg_np = _comb_matrix(sr, p.static_key())
    M = jnp.asarray(M_np)
    n_bins = p.nfft // 2 + 1
    half0 = p.window // 2

    A_parts, inst_parts, norms = [], [], []
    # silence gate energy: the widest analysis span (first band's window)
    w0 = BANDS[0][2]
    c0 = frames[:, half0 - w0 // 2 : half0 + w0 // 2]
    energy = jnp.mean(c0 * c0, axis=1)
    for _, _, w in BANDS:
        # each band's frames are the CENTER w(+1) samples of the max-window
        # frame — same 20 ms centers, shorter analysis span
        off = half0 - w // 2
        win = jnp.asarray(np.hanning(w), dtype=frames.dtype)
        f1 = frames[:, off : off + w] * win
        f2 = frames[:, off + 1 : off + w + 1] * win
        S1 = jnp.fft.rfft(f1, p.nfft, axis=1)
        S2 = jnp.fft.rfft(f2, p.nfft, axis=1)
        Ab = jnp.sqrt(jnp.abs(S1) + 1e-12)     # sqrt compression: tames
        #                                        formant/partial dominance
        A_parts.append(Ab)
        phase = jnp.angle(S2 * jnp.conj(S1))   # rad/sample
        inst_parts.append(phase * (sr / (2.0 * jnp.pi)))  # Hz per bin
        norms.append(jnp.mean(Ab, axis=1) + 1e-9)

    A = jnp.concatenate(A_parts, axis=1)       # (N, n_bands*F)
    inst = jnp.concatenate(inst_parts, axis=1)

    sal = A @ M.T                              # (N, C) — the MXU matmul
    # scale-free salience: each candidate normalized by ITS band's mean
    # sqrt-magnitude (bands see different window gains)
    band_of = jnp.asarray(seg_np // n_bins)    # (C,) int32
    norm = jnp.stack(norms, axis=1)            # (N, n_bands)
    sal_n = sal / norm[:, band_of]
    # contrast normalization: a flat (noise) spectrum lights every comb row
    # near-equally; the per-frame candidate mean IS that noise floor
    sal_c = sal_n - jnp.mean(sal_n, axis=1, keepdims=True)
    return sal_c, energy, A, inst


def _decode(sal_c: jnp.ndarray, energy: jnp.ndarray, A: jnp.ndarray,
            inst: jnp.ndarray, grid: jnp.ndarray, knobs: jnp.ndarray,
            sr: int, p: DeviceF0Params, n_valid: jnp.ndarray) -> jnp.ndarray:
    """Features -> (N,) f0. Everything knob-dependent; knobs (7,) traced:
    [unvoiced_cost, switch_cost, lam, energy_floor_db, refine_gate_cents,
    subharm2, subharm3]."""
    knee, switch, lam, floor_db, gate = (knobs[0], knobs[1], knobs[2],
                                         knobs[3], knobs[4])
    N, C = sal_c.shape

    # super-harmonic suppression (see DeviceF0Params.subharm2/3): subtract
    # the (relu'd) salience of the candidate an octave / a twelfth below
    def _shift(steps: int) -> jnp.ndarray:
        return jnp.pad(jnp.maximum(sal_c, 0.0),
                       ((0, 0), (steps, 0)))[:, :C]

    s2 = int(round(1200.0 / p.grid_cents))
    s3 = int(round(1200.0 * np.log2(3.0) / p.grid_cents))
    sal_c = sal_c - knobs[5] * _shift(s2) - knobs[6] * _shift(s3)

    # absolute silence gate (vs the utterance's own peak frame energy)
    peak = jnp.max(jnp.where(jnp.arange(N) < n_valid, energy, 0.0)) + 1e-12
    silent = 10.0 * jnp.log10(energy / peak + 1e-12) < floor_db

    # emissions: voiced cost = -contrast; unvoiced = -knee
    cost_v = -sal_c
    cost_v = jnp.where(silent[:, None], 1e3, cost_v)
    cost_u = jnp.full((N,), 1.0, dtype=sal_c.dtype) * (-knee)
    # padding frames: force unvoiced so they never route the path
    pad = jnp.arange(N) >= n_valid
    cost_v = jnp.where(pad[:, None], 1e3, cost_v)

    lam_s = lam * (p.grid_cents / 1200.0)      # per grid-index step
    states = _viterbi(cost_v, cost_u, lam_s.astype(sal_c.dtype),
                      switch.astype(sal_c.dtype))

    voiced = states < C
    cand = grid[jnp.minimum(states, C - 1)]

    # --- instantaneous-frequency refinement -------------------------------
    # bins are read from the selected candidate's own band segment (the
    # band's shorter window gives the least-smeared phase at that f0)
    _, _, seg_np = _comb_matrix(sr, p.static_key())
    seg = jnp.asarray(seg_np)[jnp.minimum(states, C - 1)]  # (N,)
    bin_hz = sr / p.nfft
    ks = jnp.arange(1, p.n_harmonics + 1, dtype=cand.dtype)
    bins = jnp.round(cand[:, None] * ks[None, :] / bin_hz).astype(jnp.int32)
    bins = jnp.clip(bins, 0, p.nfft // 2) + seg[:, None]
    fi = jnp.take_along_axis(inst, bins, axis=1) / ks[None, :]  # (N, K)
    mag = jnp.take_along_axis(A, bins, axis=1)
    cents_off = 1200.0 * jnp.abs(jnp.log2(jnp.abs(fi) /
                                          jnp.maximum(cand[:, None], 1e-6)
                                          + 1e-9))
    w = mag * (1.0 / ks[None, :]) * (cents_off < gate)
    w = w * (fi > 0)
    refined = jnp.sum(w * fi, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-9)
    f0 = jnp.where(jnp.sum(w, axis=1) > 1e-9, refined, cand)
    f0 = jnp.clip(f0, 0.0, F0_CEIL)

    f0 = jnp.where(voiced, f0, 0.0)
    f0 = jnp.where(f0 < F0_ZERO_BELOW, 0.0, f0)   # ref zeroing contract
    return f0.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _device_f0_core(frames: jnp.ndarray, sr: int, p: DeviceF0Params,
                    knobs: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """(N, window+1) frames -> (N,) f0 Hz (0 = unvoiced). Pure device."""
    _, grid_np, _ = _comb_matrix(sr, p.static_key())
    sal_c, energy, A, inst = _features(frames, sr, p)
    return _decode(sal_c, energy, A, inst, jnp.asarray(grid_np), knobs,
                   sr, p, n_valid)


_BUCKET = 256


def device_f0(x: np.ndarray, sr: int, hop: int = DEFAULT_HOP,
              params: DeviceF0Params | None = None) -> np.ndarray:
    """Host wrapper: (T,) waveform -> (T//hop + 1,) f0. Frames on device,
    jitted once per frame-count bucket (knob changes never recompile)."""
    p = params or DeviceF0Params()
    x = np.asarray(x, dtype=np.float32).reshape(-1)
    n_frames = len(x) // hop + 1
    n_pad = -n_frames % _BUCKET
    frames = _frame(jnp.asarray(x), n_frames + n_pad, p.window, hop)
    f0 = _device_f0_core(frames, int(sr), p.static_key(),
                         jnp.asarray(p.knob_vector()), jnp.int32(n_frames))
    return np.asarray(f0[:n_frames])


def device_f0_jax(x: jnp.ndarray, sr: int, n_frames: int,
                  hop: int = DEFAULT_HOP,
                  params: DeviceF0Params | None = None) -> jnp.ndarray:
    """Traceable variant for fusing into pool-build dispatches: x (T,) on
    device (static T), returns (n_frames,) f0 without leaving the device."""
    p = params or DeviceF0Params()
    frames = _frame(x, n_frames, p.window, hop)
    _, grid_np, _ = _comb_matrix(sr, p.static_key())
    sal_c, energy, A, inst = _features(frames, sr, p)
    return _decode(sal_c, energy, A, inst, jnp.asarray(grid_np),
                   jnp.asarray(p.knob_vector()), sr, p,
                   jnp.int32(n_frames))
