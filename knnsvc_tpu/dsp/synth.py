"""Additive-harmonic DDSP synthesis, TPU-first.

Reference semantics (ref ddsp_prematch_dataset.py:131-267, consumed by the
vocoder at hifigan/ddsp_models.py:432 and hifigan/ddsp_models_f0.py:344-352):

- f0 is upsampled x hop (nearest), amplitudes x hop (bicubic, torch
  align_corners=False).
- phase = 2*pi*(cumsum(f0/sr) - round(cumsum(f0/sr))), computed in fp64 by
  the reference to avoid cumsum error growth.
- harmonic k phase = k*phase; amplitudes masked above Nyquist (+1e-7 floor);
  signal = sum_k sin(k*phase)*amp_k.

TPU redesign: fp64 on TPU is emulated and slow, so the wrapped phase is
computed with an *associative* frac-scan in fp32: combine(a,b) =
wrap(a+b) where wrap(x) = x - round(x). Mathematically
wrap(prefix-sum) == fp64's (cumsum - round(cumsum)) because wrap only ever
subtracts integers; numerically each partial stays in [-0.5, 0.5] so fp32
precision is preserved (error ~ eps * log2(T) instead of eps * T).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def upsample_nearest(signal: jax.Array, factor: int) -> jax.Array:
    """(B, T, C) -> (B, T*factor, C), torch F.interpolate(mode='nearest')
    semantics for integer factor (each frame repeated `factor` times)."""
    return jnp.repeat(signal, factor, axis=1)


@functools.lru_cache(maxsize=8)
def _bicubic_weights(factor: int) -> np.ndarray:
    """Cubic-convolution weights (a=-0.75, align_corners=False) for integer
    upsampling. Returns (factor, 4): for output phase p the 4 taps apply to
    input indices floor(src)-1..floor(src)+2 with src = (p+0.5)/factor - 0.5."""
    a = -0.75

    def cubic(x):
        x = np.abs(x)
        return np.where(
            x <= 1,
            ((a + 2) * x - (a + 3)) * x * x + 1,
            np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0),
        )

    p = np.arange(factor, dtype=np.float64)
    src = (p + 0.5) / factor - 0.5
    frac = src - np.floor(src)
    offs = np.array([-1.0, 0.0, 1.0, 2.0])
    w = cubic(offs[None, :] - frac[:, None])
    return w.astype(np.float64)


@functools.lru_cache(maxsize=8)
def _bicubic_tap_matrix(factor: int) -> np.ndarray:
    """5-tap filter bank W (factor, 5): out[t, p] = sum_d x[clip(t+d-2)] *
    W[p, d]. Derived from the 4-tap cubic weights at src offset floor(src) in
    {-1, 0} — reindexed onto the fixed absolute-offset window t-2..t+2 so the
    upsample becomes 5 shifted copies + one einsum instead of a (T, factor, 4)
    gather (which made XLA materialize a ~400 MB intermediate and compile for
    minutes at 30-s lengths)."""
    w4 = _bicubic_weights(factor)                       # (factor, 4)
    p = np.arange(factor)
    src_floor = np.floor((p + 0.5) / factor - 0.5).astype(int)  # -1 or 0
    W = np.zeros((factor, 5))
    for pp in range(factor):
        for k in range(4):
            d = src_floor[pp] - 1 + k                   # absolute offset in [-2, 2]
            W[pp, d + 2] += w4[pp, k]
    return W


def upsample_bicubic(signal: jax.Array, factor: int) -> jax.Array:
    """(B, T, C) -> (B, T*factor, C) cubic upsampling along T; matches torch
    F.interpolate(mode='bicubic', align_corners=False) on a height-1 image
    (ref ddsp_prematch_dataset.py:135-141: only the width axis is scaled, so
    the 2-D bicubic degenerates to 1-D cubic along T). Border replication ==
    torch's neighbor-index clamping."""
    B, T, C = signal.shape
    W = jnp.asarray(_bicubic_tap_matrix(factor), dtype=signal.dtype)  # (factor, 5)
    padded = jnp.pad(signal, ((0, 0), (2, 2), (0, 0)), mode="edge")
    shifts = jnp.stack([padded[:, d : d + T] for d in range(5)], axis=0)  # (5, B, T, C)
    from knnsvc_tpu.precision import get_precision

    out = jnp.einsum("dbtc,pd->btpc", shifts, W,
                     preferred_element_type=jnp.float32,
                     precision=get_precision())
    return out.reshape(B, T * factor, C)


def remove_above_nyquist(amplitudes: jax.Array, pitch: jax.Array, sampling_rate: int) -> jax.Array:
    """Zero (to 1e-7) harmonics above Nyquist. amplitudes (..., n_harm),
    pitch broadcastable to (..., 1). Ref ddsp_prematch_dataset.py:146-156."""
    n_harm = amplitudes.shape[-1]
    k = jnp.arange(1, n_harm + 1, dtype=pitch.dtype)
    pitches = pitch * k
    aa = (pitches < sampling_rate / 2).astype(amplitudes.dtype) + 1e-7
    return amplitudes * aa


def wrapped_phase_cumsum(step: jax.Array, axis: int = 1) -> jax.Array:
    """frac-centered prefix sum: returns cumsum(step) - round(cumsum(step))
    exactly (mathematically), via an associative wrap-scan that stays in
    [-0.5, 0.5] so fp32 suffices on TPU."""

    def combine(a, b):
        s = a + b
        return s - jnp.round(s)

    return jax.lax.associative_scan(combine, step, axis=axis)


@functools.partial(jax.jit, static_argnames=("sample_rate", "hop_size"))
def harmonic_synth(
    f0: jax.Array, amp: jax.Array, sample_rate: int = 16000, hop_size: int = 320
) -> jax.Array:
    """Additive harmonic synthesis == ref get_bulk_dsp_choral
    (ddsp_prematch_dataset.py:165-208).

    f0: (B, T, 1) frame-rate pitch; amp: (B, T, n_harm) harmonic amplitudes.
    Returns (B, T*hop_size, 1).
    """
    f0_up = upsample_nearest(f0, hop_size)            # (B, Tw, 1)
    amp_up = upsample_bicubic(amp, hop_size)          # (B, Tw, n_harm)
    n_harm = amp_up.shape[-1]

    phase = wrapped_phase_cumsum(f0_up.astype(jnp.float32) / sample_rate, axis=1)
    phase = 2.0 * jnp.pi * phase                      # (B, Tw, 1)
    k = jnp.arange(1, n_harm + 1, dtype=phase.dtype)
    phases = phase * k                                # (B, Tw, n_harm)
    amp_masked = remove_above_nyquist(amp_up, f0_up, sample_rate)
    return jnp.sum(jnp.sin(phases) * amp_masked, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("sample_rate", "hop_size"))
def sine_excitation(f0: jax.Array, sample_rate: int = 16000, hop_size: int = 320) -> jax.Array:
    """Pure-sine excitation used by the f0-only vocoder variant
    (ref hifigan/ddsp_models_f0.py:344-352). f0 (B, T, 1) -> (B, 1, T*hop)."""
    f0_up = upsample_nearest(f0, hop_size)
    phase = wrapped_phase_cumsum(f0_up.astype(jnp.float32) / sample_rate, axis=1)
    omega = 2.0 * jnp.pi * phase
    return jnp.swapaxes(jnp.sin(omega), 1, 2)


@functools.partial(jax.jit, static_argnames=("sample_rate", "hop_size", "dsp_type"))
def harmonic_synth_zero_phase(
    f0: jax.Array,
    amp: jax.Array,
    sample_rate: int = 16000,
    hop_size: int = 320,
    dsp_type: str = "sin",
) -> jax.Array:
    """== ref get_bulk_dsp (ddsp_prematch_dataset.py:212-267): variant with an
    explicit initial phase (0 for sin, quarter-cycle for cos) and nearest amp
    upsampling; amplitudes zeroed where f0 == 0. f0 (B, T), amp (B, T, N) ->
    (B, T*hop)."""
    amp = jnp.where(f0[..., None] == 0, 0.0, amp)
    f0_up = upsample_nearest(f0[..., None], hop_size)[..., 0]   # (B, Tw)
    amp_up = upsample_nearest(amp, hop_size)                     # (B, Tw, N)

    if dsp_type == "sin":
        initial = jnp.zeros_like(f0_up[:, :1])
    elif dsp_type == "cos":
        initial = jnp.ones_like(f0_up[:, :1]) / 4
    else:
        raise NotImplementedError(dsp_type)
    step = jnp.concatenate([initial, f0_up / sample_rate], axis=1)[:, :-1]
    phase = 2.0 * jnp.pi * wrapped_phase_cumsum(step, axis=1)
    n_harm = amp.shape[-1]
    k = jnp.arange(1, n_harm + 1, dtype=phase.dtype)
    phases = phase[..., None] * k
    amp_masked = remove_above_nyquist(amp_up, f0_up[..., None], sample_rate)
    return jnp.sum(jnp.sin(phases) * amp_masked, axis=-1)
