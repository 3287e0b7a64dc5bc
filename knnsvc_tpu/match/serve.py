"""Fused single-dispatch serving path: harmonics gather + kNN match
(+post_opt) + HiFi-GAN vocode + int16 quantize as ONE compiled XLA program.

Motivation (round-5 TPU measurement): on tunneled single-chip setups the
serving critical path after the background f0 join was a chain of 4-6
separate dispatches (per-pool f0 upload, per-pool harmonics gather, match,
vocode, quantize) — each one a host round trip, and the host-side hops
serialized against the single-core native f0 extraction. Fusing everything
downstream of the f0 join into one program leaves exactly:

    join f0 (host, overlapped with the encode since build_device_pool
    submitted it before the first chunk upload)
    -> two tiny f0 uploads (async)
    -> ONE fused dispatch (this module)
    -> ONE int16 waveform download

Selection/waveform semantics are identical to the step-by-step path
(match_utterance + vocode + _quantize_int16) — the fused program calls the
very same jitted cores (they inline under the outer trace); tested equal in
tests/test_pipeline.py.

Reference analogue: none — the reference runs eager PyTorch per stage
(ddsp_matcher.py:959-967: match_at_inference_time then vocode). This is the
TPU-first redesign of that seam.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from knnsvc_tpu import SAMPLE_RATE
from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, PostOpt, uses_harmonics
from knnsvc_tpu.match.pipeline import _match_core, _match_core_post_opt
from knnsvc_tpu.match.pool import DevicePool, harmonic_amplitudes_jax
from knnsvc_tpu.models.hifigan.generator import vocode


@functools.partial(
    jax.jit,
    static_argnames=("h", "family", "topk", "approx", "use_harm",
                     "harm_from_spec", "concat_weight", "opt_enabled", "sr"))
def _convert_core(gen_params, src_matching, src_f0, ref_matching, ref_synth,
                  ref_f0, ref_spec_or_harm, qmed, *, h: HiFiGANConfig,
                  family: ModelFamily, topk: int, approx: bool,
                  use_harm: bool, harm_from_spec: bool, concat_weight: float,
                  opt_enabled: bool, sr: int):
    """match (+post_opt) + vocode + int16, one dispatch. ref_spec_or_harm is
    the ref pool's (T, 200) linear spec when harm_from_spec (the harmonic
    gather runs inline) else its precomputed (T, 49) harmonics."""
    if use_harm:
        harm_pool = (harmonic_amplitudes_jax(ref_spec_or_harm, ref_f0, sr)
                     if harm_from_spec else ref_spec_or_harm)
    else:
        harm_pool = ref_synth[:, :1]

    if not opt_enabled and concat_weight == -1.0:
        out, shifted, harm = _match_core(
            src_matching, ref_matching, ref_synth, ref_f0, harm_pool,
            src_f0, qmed, topk=topk, approx=approx, use_harmonics=use_harm)
    else:
        out, shifted, harm = _match_core_post_opt(
            src_matching, ref_matching, ref_synth, ref_f0, harm_pool,
            src_f0, qmed, topk=topk, approx=approx, use_harmonics=use_harm,
            concat_weight=concat_weight, opt_enabled=opt_enabled)

    wav = vocode(gen_params, h, family, out[None],
                 None if family == ModelFamily.ORIGINAL
                 else shifted.reshape(1, -1, 1),
                 None if harm is None else harm[None])
    q = jnp.clip(jnp.round(wav[0] * 32768.0), -32768, 32767).astype(jnp.int16)
    return q, shifted


def convert_pools_fused(gen_params, h: HiFiGANConfig, family: ModelFamily,
                        ckpt_type: str, src: DevicePool, ref: DevicePool,
                        post_opt: PostOpt, topk: int = 4,
                        matcher: str = "approx", sr: int = SAMPLE_RATE):
    """Convert src -> ref through the fused program. Joins both pools'
    background f0 (the only host work on the critical path), then issues the
    single fused dispatch. Returns (int16 device array, shifted f0 device
    array) — the caller owns the one download."""
    assert matcher in ("exact", "approx"), (
        f"fused serving supports 'exact'/'approx', not {matcher!r}")
    use_harm = uses_harmonics(ckpt_type)
    src_f0 = src.f0        # joins the background thread; never gathers
    ref_f0 = ref.f0        # the src pool's (unused) harmonics
    if use_harm and ref.spec is not None:
        ref_sh, harm_from_spec = ref.spec, True
    elif use_harm:
        ref_sh, harm_from_spec = ref.harmonics, False
    else:
        ref_sh, harm_from_spec = ref.synth[:, :1], False
    return _convert_core(
        gen_params, src.matching, src_f0, ref.matching, ref.synth, ref_f0,
        ref_sh, jnp.float32(np.nan), h=h, family=family, topk=topk,
        approx=(matcher == "approx"), use_harm=use_harm,
        harm_from_spec=harm_from_spec, concat_weight=post_opt.concat_weight,
        opt_enabled=post_opt.enabled, sr=sr)
