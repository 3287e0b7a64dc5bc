"""HiFi-GAN generator variants, TPU-native.

Three model families selected by ckpt_type (knnsvc_tpu.config):

- MIX ("mix*"): DDSP additive-harmonic excitation conditioning. Down-branch of
  strided convs (channels doubling n_harm*2^i) mirrors the upsample rates in
  reverse, caching a skip feature per scale; mel trunk upsamples through
  ConvTranspose stages, concatenating the cached skip at each scale
  (ref hifigan/ddsp_models.py:108-233, 405-493).
- F0_ONLY ("wavlm_only" / "*no_harm_no_amp*"): same topology but the
  excitation is a bare sine at f0 and the down-branch keeps constant
  n_harm+2 channels (ref hifigan/ddsp_models_f0.py:106-381).
- ORIGINAL ("wavlm_only_original"): plain HiFi-GAN v1 generator on features
  alone. The reference *dispatches* to hifigan/models.py which is missing
  from its repo (ref ddsp_hubconf.py:48 — ImportError in the reference);
  reconstructed here from the HiFi-GAN v1 architecture so the 5th ckpt_type
  actually works (documented divergence, SURVEY.md §1).

All stages are static-shape convs -> XLA fuses the whole stack; upsample
factors multiply to hop_size so frames*320 == samples exactly.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from knnsvc_tpu.config import HiFiGANConfig, ModelFamily
from knnsvc_tpu.dsp.synth import harmonic_synth, sine_excitation
from knnsvc_tpu.models.hifigan.layers import (
    conv1d,
    conv_transpose1d,
    leaky_relu,
    resblock1_apply,
    resblock2_apply,
    resblock3_apply,
)
from knnsvc_tpu.precision import get_precision

Params = dict[str, Any]


def _down_channels(h: HiFiGANConfig, family: ModelFamily) -> list[tuple[int, int]]:
    """(in, out) channels of each down-branch conv."""
    n = len(h.upsample_rates)
    if family == ModelFamily.MIX:
        return [(h.n_harmonic * 2 ** i, h.n_harmonic * 2 ** (i + 1)) for i in range(n)]
    return [(h.n_harmonic + 2, h.n_harmonic + 2) for _ in range(n)]


def generator_apply(params: Params, h: HiFiGANConfig, family: ModelFamily,
                    feats: jax.Array, ddsp: jax.Array | None) -> jax.Array:
    """feats (B, T, hubert_dim); ddsp (B, C_exc, T*hop) excitation condition
    (None for ORIGINAL). Returns (B, 1, T*hop) waveform in [-1, 1]."""
    rates = h.upsample_rates
    kernels = h.upsample_kernel_sizes
    n_up = len(rates)

    if family != ModelFamily.ORIGINAL:
        x = jnp.einsum("btd,dh->bth", feats, params["lin_pre"]["w"],
                       preferred_element_type=jnp.float32, precision=get_precision())
        x = (x + params["lin_pre"]["b"]).astype(feats.dtype)   # fp32 accum, compute-dtype store
        x = jnp.swapaxes(x, 1, 2)                              # (B, hifi_dim, T)
    else:
        # HiFi-GAN v1 takes features straight into conv_pre (no lin_pre)
        x = jnp.swapaxes(feats, 1, 2)
    x = conv1d(x, params["conv_pre"], padding=3)               # k=7

    if family != ModelFamily.ORIGINAL:
        assert ddsp is not None
        # DDSP down-branch: strided convs over the excitation, rates reversed
        # (ref ddsp_models.py:123-143,184-195)
        se = ddsp
        res_features = [se]
        for i in range(n_up):
            j = n_up - 1 - i
            u, k = rates[j], kernels[j]
            in_size = se.shape[-1]
            se = conv1d(se, params["downs"][i], stride=u, padding=k // 2)
            se = resblock3_apply(se, params["resblocks_downs"][i])
            se = se[:, :, : in_size // u]
            res_features.append(se)
        x = jnp.concatenate([x, se], axis=1)
        x = conv1d(x, params["concat_pre"], padding=1)         # k=3

    for i in range(n_up):
        x = leaky_relu(x)
        x = conv_transpose1d(x, params["ups"][i], stride=rates[i],
                             padding=(kernels[i] - rates[i]) // 2)
        if family != ModelFamily.ORIGINAL:
            x = jnp.concatenate([x, res_features[n_up - 1 - i]], axis=1)
            x = conv1d(x, params["concat_conv"][i], padding=1)
        acc = None
        for j, (rk, rd) in enumerate(zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)):
            rb = params["resblocks"][i * len(h.resblock_kernel_sizes) + j]
            if h.resblock == "1":
                y = resblock1_apply(x, rb, rk, rd)
            else:
                y = resblock2_apply(x, rb, rk, rd)
            acc = y if acc is None else acc + y
        x = acc / len(h.resblock_kernel_sizes)

    x = leaky_relu(x, slope=0.01)  # bare F.leaky_relu default (ref ddsp_models.py:229)
    x = conv1d(x, params["conv_post"], padding=3)
    return jnp.tanh(x)


# ------------------------------------------------------------ synthesizers


def synthesizer_mix_apply(params: Params, h: HiFiGANConfig, feats: jax.Array,
                          f0: jax.Array, harmonics: jax.Array) -> jax.Array:
    """ckpt_type "mix": excitation = additive harmonic synth of (f0, 49
    harmonic amps), passed through sin_prenet Conv1d(1 -> n_harmonic)
    (ref hifigan/ddsp_models.py:405-493). f0 (B, T, 1), harmonics (B, T, 49)."""
    exc = harmonic_synth(f0, harmonics, h.sampling_rate, h.hop_size)  # (B, Tw, 1)
    exc = jnp.swapaxes(exc, 1, 2)                                     # (B, 1, Tw)
    cond = conv1d(exc, params["sin_prenet"], padding=1)
    return generator_apply(params["dec"], h, ModelFamily.MIX, feats, cond)


def synthesizer_f0_apply(params: Params, h: HiFiGANConfig, feats: jax.Array,
                         f0: jax.Array) -> jax.Array:
    """ckpt_type "wavlm_only"/"*no_harm_no_amp*": sine-at-f0 excitation through
    sin_prenet Conv1d(1 -> n_harmonic+2) (ref hifigan/ddsp_models_f0.py:320-381)."""
    exc = sine_excitation(f0, h.sampling_rate, h.hop_size)            # (B, 1, Tw)
    cond = conv1d(exc, params["sin_prenet"], padding=1)
    return generator_apply(params["dec"], h, ModelFamily.F0_ONLY, feats, cond)


def synthesizer_original_apply(params: Params, h: HiFiGANConfig, feats: jax.Array) -> jax.Array:
    """ckpt_type "wavlm_only_original": plain HiFi-GAN v1 on features."""
    return generator_apply(params["dec"], h, ModelFamily.ORIGINAL, feats, None)


@functools.partial(jax.jit, static_argnames=("h", "family"))
def vocode(params: Params, h: HiFiGANConfig, family: ModelFamily, feats: jax.Array,
           f0: jax.Array | None = None, harmonics: jax.Array | None = None) -> jax.Array:
    """Unified vocode dispatch (ref ddsp_matcher.py:374-406). Returns (B, Tw)."""
    if family == ModelFamily.MIX:
        wav = synthesizer_mix_apply(params, h, feats, f0, harmonics)
    elif family == ModelFamily.F0_ONLY:
        wav = synthesizer_f0_apply(params, h, feats, f0)
    else:
        wav = synthesizer_original_apply(params, h, feats)
    return wav[:, 0, :]


# ------------------------------------------------------------ init


@functools.partial(jax.jit,
                   static_argnames=("h", "family", "weight_norm_parametrized"))
def init_generator_params(key: jax.Array, h: HiFiGANConfig, family: ModelFamily,
                          weight_norm_parametrized: bool = False) -> Params:
    """Random init with reference-matching shapes, as ONE jitted program
    (see init_wavlm_params: per-op dispatch+compile dominates on tunneled
    TPU setups). With
    weight_norm_parametrized=True, weight-normed convs get {"g", "v"} params
    (training); otherwise folded {"w"} (inference)."""
    keys = iter(jax.random.split(key, 512))
    rates, kernels = h.upsample_rates, h.upsample_kernel_sizes
    n_up = len(rates)

    def conv(out_c, in_c, k, bias=True, wn=False, std=0.01):
        w = jax.random.normal(next(keys), (out_c, in_c, k)) * std
        p: Params
        if wn and weight_norm_parametrized:
            p = {"v": w, "g": jnp.linalg.norm(w.reshape(out_c, -1), axis=1).reshape(out_c, 1, 1)}
        else:
            p = {"w": w}
        if bias:
            p["b"] = jnp.zeros((out_c,))
        return p

    def convT(in_c, out_c, k, wn=True, std=0.01):
        w = jax.random.normal(next(keys), (in_c, out_c, k)) * std
        p: Params
        if wn and weight_norm_parametrized:
            p = {"v": w, "g": jnp.linalg.norm(w.reshape(in_c, -1), axis=1).reshape(in_c, 1, 1)}
        else:
            p = {"w": w}
        p["b"] = jnp.zeros((out_c,))
        return p

    def resblock1(ch, k):
        return {
            "convs1": [conv(ch, ch, k, wn=True) for _ in range(3)],
            "convs2": [conv(ch, ch, k, wn=True) for _ in range(3)],
        }

    def resblock3(ch):
        return {"convs": [conv(ch, ch, 3, wn=True)]}

    uic = h.upsample_initial_channel
    conv_pre_in = h.hifi_dim if family != ModelFamily.ORIGINAL else h.hubert_dim
    dec: Params = {
        "conv_pre": conv(uic, conv_pre_in, 7, wn=(family == ModelFamily.ORIGINAL)),
        "ups": [convT(uic // (2 ** i), uic // (2 ** (i + 1)), kernels[i]) for i in range(n_up)],
        "resblocks": [
            resblock1(uic // (2 ** (i + 1)), k)
            for i in range(n_up)
            for k in h.resblock_kernel_sizes
        ],
        "conv_post": conv(1, uic // (2 ** n_up), 7, bias=False),
    }

    if family != ModelFamily.ORIGINAL:
        dec["lin_pre"] = {
            "w": jax.random.normal(next(keys), (h.hubert_dim, h.hifi_dim)) * 0.02,
            "b": jnp.zeros((h.hifi_dim,)),
        }
        downs_ch = _down_channels(h, family)
        exc_ch = downs_ch[0][0]
        # skip-feature channels per scale: [excitation] + each down's output
        res_ch = [exc_ch] + [oc for _, oc in downs_ch]
        dec["downs"] = [conv(oc, ic, kernels[n_up - 1 - i], wn=True)
                        for i, (ic, oc) in enumerate(downs_ch)]
        dec["resblocks_downs"] = [resblock3(oc) for _, oc in downs_ch]
        dec["concat_pre"] = conv(uic, uic + res_ch[n_up], 3)
        dec["concat_conv"] = [
            conv(uic // (2 ** (i + 1)), uic // (2 ** (i + 1)) + res_ch[n_up - 1 - i], 3, bias=False)
            for i in range(n_up)
        ]
        params: Params = {"dec": dec, "sin_prenet": conv(exc_ch, 1, 3)}
    else:
        params = {"dec": dec}
    return params
