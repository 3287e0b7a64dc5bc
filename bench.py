"""End-to-end conversion benchmark (driver-run, one real TPU chip).

Measures the BASELINE.md headline: audio-seconds of converted output per
wall-clock second per chip (RTF), end to end — WavLM encode of source AND
target pools, kNN match (32 candidates), f0 register shift, f0-priority
re-rank, and mix-variant HiFi-GAN vocoding with the DDSP harmonic branch —
on the reference's own sample_content pair (30-s slices), random full-size
weights (throughput is weight-independent).

Prints ONE JSON line:
  {"metric": ..., "value": RTF, "unit": "audio_sec/sec/chip", "vs_baseline": RTF/50}
vs_baseline is against the BASELINE.json target of 50x realtime.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, WavLMConfig
    from knnsvc_tpu.io.audio import load_audio, to_mono
    from knnsvc_tpu.match.knn import knn_topk
    from knnsvc_tpu.match.f0_logic import shift_f0_to_target_register, sort_by_f0_compatibility
    from knnsvc_tpu.models.hifigan import init_generator_params, vocode
    from knnsvc_tpu.models.wavlm import init_wavlm_params, wavlm_extract_layer

    SR, HOP, SECONDS = 16000, 320, 30
    SAMPLES = SR * SECONDS

    sample_dir = "/root/reference/sample_content"
    src_wav = to_mono(load_audio(f"{sample_dir}/Danakil-voice_resampled_16000_cut.wav")[0])[0][:SAMPLES]
    ref_wav = to_mono(load_audio(f"{sample_dir}/Tiken_lead_07_resampled_16000_cut.wav")[0])[0][:SAMPLES]
    src_f0 = np.load(f"{sample_dir}/Danakil-voice_resampled_16000_cut_f0.npy")
    ref_f0 = np.load(f"{sample_dir}/Tiken_lead_07_resampled_16000_cut_f0.npy")

    wavlm_cfg = WavLMConfig()
    h = HiFiGANConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    wavlm_params = init_wavlm_params(k1, wavlm_cfg)
    gen_params = init_generator_params(k2, h, ModelFamily.MIX)

    # pad to hop multiple + full extra hop (pool-builder convention)
    def prep(w):
        n_pad = HOP - (len(w) % HOP)
        return jnp.asarray(np.pad(w, (0, n_pad)))[None]

    src_j, ref_j = prep(src_wav), prep(ref_wav)
    rng = np.random.default_rng(0)

    def convert_once():
        # encode both pools at layer 6
        q = wavlm_extract_layer(wavlm_params, wavlm_cfg, src_j, output_layer=6)[0]
        p = wavlm_extract_layer(wavlm_params, wavlm_cfg, ref_j, output_layer=6)[0]
        Tq, Tp = q.shape[0], p.shape[0]
        qf0 = jnp.asarray(src_f0[:Tq])
        pf0 = jnp.asarray(ref_f0[:Tp])
        nbrs, _ = knn_topk(q, p, k=32)
        shifted = shift_f0_to_target_register(qf0, pf0)
        pitched = sort_by_f0_compatibility(shifted, pf0, nbrs)[:, :4]
        feats = jnp.mean(p[nbrs[:, :4]], axis=1)
        harm = jnp.asarray((rng.random((Tq, 49)) * 0.05).astype(np.float32))
        wav = vocode(gen_params, h, ModelFamily.MIX, feats[None],
                     shifted.reshape(1, -1, 1), harm[None])
        # device->host copy forces completion (block_until_ready does not
        # reliably block through the axon tunnel)
        return np.asarray(wav)

    t0 = time.time()
    wav = convert_once()  # compile
    compile_s = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        wav = convert_once()
        times.append(time.time() - t0)
    best = min(times)
    audio_sec = wav.shape[-1] / SR
    rtf = audio_sec / best

    print(json.dumps({
        "metric": "end_to_end_conversion_rtf",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / 50.0, 3),
    }))
    print(f"# compile {compile_s:.1f}s, steady-state {best*1000:.0f}ms for {audio_sec:.1f}s audio,"
          f" device={jax.devices()[0]}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
