"""End-to-end conversion benchmark (driver-run, one real TPU chip).

Measures the BASELINE.md headline: audio-seconds of converted output per
wall-clock second per chip (RTF), end to end on the reference's own
sample_content pair (30-s slices) — the FULL `get_complete_spk_pool`-
equivalent pipeline, nothing stubbed:

  load/resample -> WavLM encode (source AND target pools) -> linear
  spectrogram -> native f0 extraction (worldline DIO fast path; no sidecars)
  -> harmonic-amplitude gather -> kNN match (32 candidates) -> f0 register
  shift + f0-priority re-rank -> [post_opt: concat-cost reselect + Adam
  smoothness weights] -> mix-variant HiFi-GAN vocode with the DDSP harmonic
  branch.

Random full-size weights (throughput is weight-independent). Three configs:

  fast      bf16 MXU + approx top-k + DIO f0, no_post_opt      -> headline
  post_opt  same device settings, post_opt_0.2 (OPT+CAT paper config)
  parity    fp32 HIGHEST + exact top-k (the <=1e-3 waveform config); runs
            by default after the headline JSON (set KNNSVC_BENCH_SKIP_PARITY=1
            to skip its minutes of compile)

A per-stage wall-clock split (encode/f0/spec+harm/match/vocode) is printed
to stderr via utils.profiling.StageTimer.

Timing note: this box reaches the TPU through a slow network tunnel, so
device completion is forced with small host transfers (block_until_ready
does not block here; pulling big arrays would time the tunnel).

Prints ONE JSON line; vs_baseline is against the BASELINE.json 50x target.
"""

import json
import os
import sys
import time

import numpy as np

SR, HOP, SECONDS = 16000, 320, 30
SAMPLE_DIR = "/root/reference/sample_content"
SRC = f"{SAMPLE_DIR}/Danakil-voice_resampled_16000_cut.wav"
REF = f"{SAMPLE_DIR}/Tiken_lead_07_resampled_16000_cut.wav"


def _prep_slices(tmp_dir: str) -> tuple[str, str]:
    """Write 30-s slices of the sample pair (no f0 sidecars next to them, so
    the timed path runs the native extractor like a cold production request)."""
    from knnsvc_tpu.io.audio import load_audio, save_audio, to_mono

    paths = []
    for tag, src in (("src", SRC), ("ref", REF)):
        x, sr = load_audio(src)
        w = to_mono(x)[0][: SR * SECONDS]
        p = os.path.join(tmp_dir, f"bench_{tag}.wav")
        save_audio(p, w, sr)
        paths.append(p)
    return paths[0], paths[1]


def run_config(name: str, precision: str, matcher: str, post_opt: str,
               src_path: str, ref_path: str):
    import jax.numpy as jnp
    import jax

    from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, PostOpt, WavLMConfig
    from knnsvc_tpu.match.pipeline import match_utterance
    from knnsvc_tpu.match.pool import build_device_pool, load_utterance
    from knnsvc_tpu.models.hifigan import init_generator_params
    from knnsvc_tpu.models.hifigan.generator import vocode
    from knnsvc_tpu.models.wavlm import init_wavlm_params
    from knnsvc_tpu.precision import set_precision
    from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index
    from knnsvc_tpu.utils.profiling import StageTimer

    print(f"# config {name}: precision={precision} matcher={matcher} "
          f"post_opt={post_opt}", file=sys.stderr, flush=True)
    set_precision(precision)
    jax.clear_caches()

    wavlm_cfg = WavLMConfig()
    h = HiFiGANConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    wavlm_params = init_wavlm_params(k1, wavlm_cfg)
    gen_params = init_generator_params(k2, h, ModelFamily.MIX)
    weights = generate_matrix_from_index(6)
    popt = PostOpt.parse(post_opt)

    # device-resident pools: features/spec/harmonics never leave HBM; the
    # host<->device traffic per conversion is two waveform uploads, the tiny
    # native-f0 vectors and one waveform download
    def build_pool(timer: StageTimer, path: str):
        with timer.stage("load+resample"):
            wav = load_utterance(path, SR)
        with timer.stage("pool_build"):
            pool = build_device_pool(wav, wavlm_params, wavlm_cfg,
                                     weights, weights, SR, f0_method="fast")
            timer.observe(pool.harmonics)
        return pool

    def convert_once(timer: StageTimer):
        src = build_pool(timer, src_path)
        ref = build_pool(timer, ref_path)
        with timer.stage("match"):
            feats = match_utterance(
                src.matching, src.f0, ref.matching, ref.synth, ref.f0,
                ref.harmonics, ckpt_type="mix", post_opt=popt,
                matcher=matcher, as_numpy=False)
        with timer.stage("vocode+download"):
            wav = vocode(gen_params, h, ModelFamily.MIX,
                         feats.out_feats_weighted[None],
                         feats.shifted_query_f0.reshape(1, -1, 1),
                         feats.harmonics_out_feats_weighted[None])
            # production (hub fast path) downloads int16 — half the bytes
            q = jnp.clip(jnp.round(wav * 32768.0), -32768, 32767).astype(jnp.int16)
            wav = np.asarray(q).astype(np.float32) / 32768.0
        return wav

    t0 = time.time()
    wav = convert_once(StageTimer())
    print(f"# {name}: compiled+first-run in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    # attribution pass: per-stage wall clock with device sync at stage exits
    timer = StageTimer()
    convert_once(timer)
    print("# stage split (1 synchronized run):", file=sys.stderr)
    for line in timer.report().splitlines():
        print(f"#   {line}", file=sys.stderr)

    # headline pass: NO intermediate syncs — device work is dispatched
    # asynchronously, so the native f0 (host CPU) overlaps the WavLM/spec
    # compute in flight, and the single sync is the waveform download the
    # production path needs anyway
    times = []
    for _ in range(12):  # min-of-12: the shared tunnel/chip shows ~40% swings
        t0 = time.time()
        wav = convert_once(StageTimer(sync=False))
        times.append(time.time() - t0)
    audio_sec = wav.shape[-1] / SR
    rtf = audio_sec / min(times)
    ts = sorted(times)
    print(f"# {name}: {min(times)*1000:.0f}ms / {audio_sec:.1f}s audio = "
          f"{rtf:.1f}x RT (pipelined)", file=sys.stderr)
    # per-run spread: a congested-tunnel number should be self-diagnosing
    # (median >> min means the box was busy, not the code slow)
    print(f"# {name}: run spread ms min/med/max = {ts[0]*1000:.0f}/"
          f"{ts[len(ts)//2]*1000:.0f}/{ts[-1]*1000:.0f}  "
          f"all={[round(t*1000) for t in times]}", file=sys.stderr)
    sys.stderr.flush()
    return rtf


def _probe_device(timeout_s: float = 180.0) -> str | None:
    """Bounded TPU reachability check. jax.devices() through a dead axon
    tunnel hangs indefinitely (observed: multi-hour outages) and would hang
    the whole driver-run benchmark with it — probe in a subprocess with a
    timeout and return the error string instead."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0])"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return f"device probe timed out after {timeout_s:.0f}s (tunnel down?)"
    if r.returncode != 0:
        return f"device probe failed: {r.stderr.strip()[-300:]}"
    return None


def main() -> int:
    import tempfile

    err = _probe_device()
    if err is not None:
        # one honest JSON line the driver can record + diagnose, instead of
        # an indefinite hang with no BENCH output at all
        print(json.dumps({
            "metric": "end_to_end_conversion_rtf",
            "value": 0.0,
            "unit": "audio_sec/sec/chip",
            "vs_baseline": 0.0,
            "error": err,
        }), flush=True)
        print(f"# {err}", file=sys.stderr, flush=True)
        return 1

    import jax

    with tempfile.TemporaryDirectory() as td:
        src_path, ref_path = _prep_slices(td)

        fast_rtf = run_config("fast", "fastest", "approx", "no_post_opt",
                              src_path, ref_path)
        # emit the headline immediately — later configs are informational and
        # add minutes of compile the driver may not wait for
        print(json.dumps({
            "metric": "end_to_end_conversion_rtf",
            "value": round(fast_rtf, 1),
            "unit": "audio_sec/sec/chip",
            "vs_baseline": round(fast_rtf / 50.0, 3),
        }), flush=True)
        print(f"# device={jax.devices()[0]}", file=sys.stderr, flush=True)

        popt_rtf = run_config("post_opt", "fastest", "approx", "post_opt_0.2",
                              src_path, ref_path)
        print(f"# post_opt_0.2 mix RTF: {popt_rtf:.1f}x RT (target >=50x)",
              file=sys.stderr, flush=True)

        # parity is the config the <=1e-3 waveform claim stands on: measure it
        # every run (KNNSVC_BENCH_SKIP_PARITY=1 opts out for quick iterations)
        if os.environ.get("KNNSVC_BENCH_SKIP_PARITY") != "1":
            parity_rtf = run_config("parity", "highest", "exact", "no_post_opt",
                                    src_path, ref_path)
            print(f"# parity path RTF: {parity_rtf:.1f}x RT (target >=50x)",
                  file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
