"""Spectral losses (ref ddsp_matcher.py:100-145 — SSSLoss / RSSLoss).

Orphaned on the reference's live path but part of its surface; provided here
as jittable JAX functions for DDSP-style vocoder experiments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from knnsvc_tpu.dsp.stft import stft_magnitude


@functools.partial(jax.jit, static_argnames=("n_fft", "overlap"))
def sss_loss(x_true: jax.Array, x_pred: jax.Array, n_fft: int = 1024,
             alpha: float = 1.0, overlap: float = 0.0, eps: float = 1e-7) -> jax.Array:
    """Single-scale spectral loss: normalized convergence term + log-L1
    (ref :113-122). x_* (B, T)."""
    hop = int(n_fft * (1 - overlap))

    def spec(x):
        # torchaudio Spectrogram(power=1, normalized=True, center=False)
        s = stft_magnitude(x, n_fft=n_fft, hop_length=hop, center=False, power=1.0)
        return s / jnp.sqrt(jnp.sum(jnp.hanning(n_fft) ** 2)) + eps

    s_true, s_pred = spec(x_true), spec(x_pred)
    diff_norm = jnp.sqrt(jnp.sum((s_true - s_pred) ** 2, axis=(1, 2)))
    sum_norm = jnp.sqrt(jnp.sum((s_true + s_pred) ** 2, axis=(1, 2)))
    converge = jnp.mean(diff_norm / sum_norm)
    log_term = jnp.mean(jnp.abs(jnp.log(s_true) - jnp.log(s_pred)))
    return converge + alpha * log_term


def rss_loss(key: jax.Array, x_pred: jax.Array, x_true: jax.Array,
             fft_min: int = 256, fft_max: int = 2048, n_scale: int = 4,
             alpha: float = 1.0) -> jax.Array:
    """Random-scale spectral loss (ref :125-145): average SSS over n_scale
    random FFT sizes. Randomness is explicit (jax PRNG key) instead of
    torch's global RNG."""
    sizes = jax.random.randint(key, (n_scale,), fft_min, fft_max)
    total = 0.0
    for i in range(n_scale):
        n_fft = int(sizes[i])  # concrete (host) loop — jit per size bucket
        total = total + sss_loss(x_true, x_pred, n_fft=n_fft, alpha=alpha)
    return total / n_scale
