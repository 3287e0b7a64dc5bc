"""Learned harmonic-amplitude head (Generator_Harm).

The reference defines this module (hifigan/ddsp_models.py:245-333, duplicated
in ddsp_models_f0.py) but it is DEAD CODE there: it calls an undefined
`scale_function` and never gets instantiated (ref :311,412). Reconstructed
here as a working component: prenet Conv1d -> ConvReluNorm stack -> postnet
projecting to n_harmonic+1 amplitudes, the DDSP-standard exp-sigmoid scale
function, Nyquist masking, normalization by total amplitude, and additive
sine synthesis at the upsampled pitch.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from knnsvc_tpu.dsp.synth import remove_above_nyquist, upsample_nearest, wrapped_phase_cumsum
from knnsvc_tpu.models.hifigan.layers import conv1d

Params = dict[str, Any]


def scale_function(x: jax.Array) -> jax.Array:
    """DDSP exp-sigmoid amplitude nonlinearity: 2 * sigmoid(x)^log(10) + 1e-7."""
    return 2.0 * jax.nn.sigmoid(x) ** jnp.log(10.0) + 1e-7


def _layer_norm_c(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the channel axis of (B, C, T)."""
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"][None, :, None] + p["bias"][None, :, None]


def conv_relu_norm_apply(x: jax.Array, p: Params, kernel_size: int) -> jax.Array:
    """(ref ddsp_models.py:245-281): conv->LN->relu, then residual-averaged
    conv blocks, zero-init projection."""
    pad = kernel_size // 2
    x = conv1d(x, p["convs"][0], padding=pad)
    x = jax.nn.relu(_layer_norm_c(x, p["norms"][0]))
    for c, n in zip(p["convs"][1:], p["norms"][1:]):
        h = conv1d(x, c, padding=pad)
        h = jax.nn.relu(_layer_norm_c(h, n))
        x = (x + h) / 2
    return conv1d(x, p["proj"])


def generator_harm_apply(params: Params, f0: jax.Array, harm: jax.Array,
                         sample_rate: int = 16000, hop_size: int = 320,
                         kernel_size: int = 3) -> jax.Array:
    """f0 (B, T, 1), harm (B, C, T) hidden features -> per-harmonic sine bank
    (B, n_harmonic, T*hop) (ref ddsp_models.py:301-333 semantics)."""
    h = conv1d(harm, params["prenet"], padding=1)
    h = conv_relu_norm_apply(h, params["net"], kernel_size)
    h = conv1d(h, params["postnet"], padding=1)
    param = jnp.swapaxes(h, 1, 2)                      # (B, T, n_harm+1)
    param = scale_function(param)
    total_amp = param[..., :1]
    amplitudes = remove_above_nyquist(param[..., 1:], f0, sample_rate)
    amplitudes = amplitudes / jnp.sum(amplitudes, axis=-1, keepdims=True)
    amplitudes = amplitudes * total_amp

    amp_up = upsample_nearest(amplitudes, hop_size)
    pitch_up = upsample_nearest(f0, hop_size)
    phase = 2.0 * jnp.pi * wrapped_phase_cumsum(pitch_up / sample_rate, axis=1)
    n_harm = amp_up.shape[-1]
    phases = phase * jnp.arange(1, n_harm + 1, dtype=phase.dtype)
    signal = jnp.sin(phases) * amp_up
    return jnp.swapaxes(signal, 1, 2)                  # (B, n_harm, T*hop)


def init_generator_harm_params(key: jax.Array, hidden: int, n_harmonic: int,
                               n_layers: int = 8, kernel_size: int = 3) -> Params:
    keys = iter(jax.random.split(key, 64))

    def conv(out_c, in_c, k, zero=False):
        w = jnp.zeros((out_c, in_c, k)) if zero else jax.random.normal(next(keys), (out_c, in_c, k)) * 0.02
        return {"w": w, "b": jnp.zeros((out_c,))}

    def ln(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    return {
        "prenet": conv(hidden, hidden, 3),
        "net": {
            "convs": [conv(hidden, hidden, kernel_size) for _ in range(n_layers)],
            "norms": [ln(hidden) for _ in range(n_layers)],
            "proj": conv(hidden, hidden, 1, zero=True),  # zero-init (ref :267-268)
        },
        "postnet": conv(n_harmonic + 1, hidden, 3),
    }
