"""End-to-end conversion benchmark (driver-run, one real TPU chip).

Measures the BASELINE.md headline: audio-seconds of converted output per
wall-clock second per chip (RTF), end to end — WavLM encode of source AND
target pools, kNN match (32 candidates), f0 register shift, f0-priority
re-rank, and mix-variant HiFi-GAN vocoding with the DDSP harmonic branch —
on the reference's own sample_content pair (30-s slices), random full-size
weights (throughput is weight-independent).

Two configs are timed:
- production fast path (bf16 MXU matmuls/convs + approx top-k) -> headline
- parity path (fp32 HIGHEST + exact top-k, the <=1e-3 waveform config)

Timing note: this box reaches the TPU through a slow network tunnel, so
completion is forced with a 4-byte scalar transfer (pulling the waveform
would time the tunnel, and block_until_ready does not block here).

Prints ONE JSON line; vs_baseline is against the BASELINE.json 50x target.
"""

import json
import sys
import time

import numpy as np


def run_config(precision: str, approx: bool):
    import jax
    import jax.numpy as jnp

    from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, WavLMConfig
    from knnsvc_tpu.io.audio import load_audio, to_mono
    from knnsvc_tpu.match.knn import knn_topk
    from knnsvc_tpu.match.f0_logic import shift_f0_to_target_register, sort_by_f0_compatibility
    from knnsvc_tpu.models.hifigan import init_generator_params, vocode
    from knnsvc_tpu.models.wavlm import init_wavlm_params, wavlm_extract_layer
    from knnsvc_tpu.precision import set_precision

    print(f"# config precision={precision} approx={approx} starting", file=sys.stderr, flush=True)
    set_precision(precision)
    jax.clear_caches()

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

    def prep(w):
        n_pad = HOP - (len(w) % HOP)
        return jnp.asarray(np.pad(w, (0, n_pad)))[None]

    src_j, ref_j = prep(src_wav), prep(ref_wav)
    rng = np.random.default_rng(0)

    def convert_once():
        q = wavlm_extract_layer(wavlm_params, wavlm_cfg, src_j, output_layer=6)[0]
        p = wavlm_extract_layer(wavlm_params, wavlm_cfg, ref_j, output_layer=6)[0]
        Tq, Tp = q.shape[0], p.shape[0]
        qf0 = jnp.asarray(src_f0[:Tq])
        pf0 = jnp.asarray(ref_f0[:Tp])
        nbrs, _ = knn_topk(q, p, k=32, approx=approx)
        shifted = shift_f0_to_target_register(qf0, pf0)
        _ = sort_by_f0_compatibility(shifted, pf0, nbrs)[:, :4]
        feats = jnp.mean(p[nbrs[:, :4]], axis=1)
        harm = jnp.asarray((rng.random((Tq, 49)) * 0.05).astype(np.float32))
        return vocode(gen_params, h, ModelFamily.MIX, feats[None],
                      shifted.reshape(1, -1, 1), harm[None])

    def sync(x):
        return float(jnp.sum(x))  # 4-byte transfer forces completion

    t0 = time.time()
    sync(convert_once())
    compile_s = time.time() - t0
    print(f"# compiled in {compile_s:.1f}s", file=sys.stderr, flush=True)

    times = []
    for _ in range(3):
        t0 = time.time()
        wav = convert_once()
        sync(wav)
        times.append(time.time() - t0)
    audio_sec = wav.shape[-1] / SR
    return audio_sec / min(times), compile_s, min(times)


def main() -> int:
    import os

    import jax

    fast_rtf, fast_compile, fast_t = run_config("fastest", approx=True)
    # emit the headline immediately — the parity config is informational and
    # adds minutes of compile the driver may not wait for
    print(json.dumps({
        "metric": "end_to_end_conversion_rtf",
        "value": round(fast_rtf, 1),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(fast_rtf / 50.0, 3),
    }), flush=True)
    print(f"# fast path (bf16+approx-topk): {fast_t*1000:.0f}ms/30s audio = "
          f"{fast_rtf:.1f}x RT; device={jax.devices()[0]}", file=sys.stderr, flush=True)

    if os.environ.get("KNNSVC_BENCH_FAST_ONLY") != "1":
        parity_rtf, parity_compile, parity_t = run_config("highest", approx=False)
        print(f"# parity path (fp32+exact): {parity_t*1000:.0f}ms = {parity_rtf:.1f}x RT",
              file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
