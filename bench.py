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

Outage resilience (VERDICT r3: a 5h tunnel outage zeroed round 3's record):
- the TPU reachability probe RETRIES across a window
  (KNNSVC_BENCH_PROBE_BUDGET_S, default 600 s) instead of one-shot;
- each config runs in its OWN subprocess with a hard timeout and one retry,
  re-probing between configs — a mid-run blip costs one config, not the
  whole record, and the headline JSON is emitted the moment `fast` lands.

Per config, stderr carries a per-stage wall-clock split AND an MFU table
(analytic matmul/conv FLOPs over measured stage time as %-of-peak — see
utils/flops.py; peak via KNNSVC_TPU_PEAK_TFLOPS, default 197 = v5e bf16).

Timing note: this box reaches the TPU through a slow network tunnel, so
device completion is forced with small host transfers (block_until_ready
does not block here; pulling big arrays would time the tunnel).

Prints ONE JSON line; vs_baseline is against the BASELINE.json 50x target.
"""

import json
import os
import subprocess
import sys
import time

SR, HOP = 16000, 320
SECONDS = int(os.environ.get("KNNSVC_BENCH_SECONDS", "30"))
SAMPLE_DIR = "/root/reference/sample_content"
SRC = f"{SAMPLE_DIR}/Danakil-voice_resampled_16000_cut.wav"
REF = f"{SAMPLE_DIR}/Tiken_lead_07_resampled_16000_cut.wav"

CONFIGS = {
    # name: (precision, matcher, post_opt)
    "fast": ("fastest", "approx", "no_post_opt"),
    "post_opt": ("fastest", "approx", "post_opt_0.2"),
    "parity": ("highest", "exact", "no_post_opt"),
}


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
    import numpy as np
    import jax.numpy as jnp
    import jax

    from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, PostOpt, WavLMConfig
    from knnsvc_tpu.match.pipeline import match_utterance
    from knnsvc_tpu.match.pool import build_device_pool, load_utterance, one_hot_layer
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
        return wav, src, ref

    t0 = time.time()
    wav, _, _ = convert_once(StageTimer())
    print(f"# {name}: compiled+first-run in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    # attribution pass: per-stage wall clock with device sync at stage exits
    timer = StageTimer()
    _, src_pool, ref_pool = convert_once(timer)
    print("# stage split (1 synchronized run):", file=sys.stderr)
    for line in timer.report().splitlines():
        print(f"#   {line}", file=sys.stderr)

    # ---- MFU accounting (VERDICT r3 #5): analytic matmul/conv FLOPs over
    # the synchronized stage times as %-of-peak. Stage bundles are labeled
    # by what the measured window actually contains.
    from knnsvc_tpu.utils.flops import (conv_frontend_flops, format_mfu_table,
                                        hifigan_flops, match_flops,
                                        wavlm_encoder_flops)

    n_layers = one_hot_layer(weights)
    t_src = int(src_pool.matching.shape[0])
    t_ref = int(ref_pool.matching.shape[0])
    enc_flops = 0
    for t_frames in (t_src, t_ref):
        cf, _ = conv_frontend_flops(wavlm_cfg.conv_feature_layers,
                                    SECONDS * SR)
        enc_flops += cf + wavlm_encoder_flops(
            wavlm_cfg.encoder_embed_dim, wavlm_cfg.encoder_ffn_embed_dim,
            n_layers, t_frames, wavlm_cfg.conv_pos, wavlm_cfg.conv_pos_groups)
    m_flops = match_flops(t_src, t_ref, src_pool.matching.shape[1],
                          concat=popt.concat_weight != -1.0)
    v_flops = hifigan_flops(h, t_src, family="mix")
    peak = float(os.environ.get("KNNSVC_TPU_PEAK_TFLOPS", "197"))
    rows = [
        ("encode+f0 (x2)", enc_flops, timer.totals["pool_build"]),
        ("match", m_flops, timer.totals["match"]),
        ("vocode+download", v_flops, timer.totals["vocode+download"]),
    ]
    print(f"# MFU vs {peak:.0f} TFLOP/s peak (bf16; fp32-HIGHEST configs run"
          f" multi-pass, so their true ceiling is ~6x lower):",
          file=sys.stderr)
    for line in format_mfu_table(rows, peak).splitlines():
        print(f"#   {line}", file=sys.stderr)

    # headline pass: NO intermediate syncs — device work is dispatched
    # asynchronously, so the native f0 (host CPU) overlaps the WavLM/spec
    # compute in flight, and the single sync is the waveform download the
    # production path needs anyway
    times = []
    reps = int(os.environ.get("KNNSVC_BENCH_REPS", "12"))
    for _ in range(reps):  # min-of-12: the shared tunnel/chip shows ~40% swings
        t0 = time.time()
        wav, _, _ = convert_once(StageTimer(sync=False))
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


def _child_main(name: str) -> int:
    """Run ONE config end to end and print 'RESULT {json}' on stdout."""
    import tempfile

    precision, matcher, post_opt = CONFIGS[name]
    with tempfile.TemporaryDirectory() as td:
        src_path, ref_path = _prep_slices(td)
        rtf = run_config(name, precision, matcher, post_opt,
                         src_path, ref_path)
    print(f"RESULT {json.dumps({'config': name, 'rtf': round(rtf, 1)})}",
          flush=True)
    return 0


def _probe_once(timeout_s: float) -> str | None:
    """Bounded TPU reachability check. jax.devices() through a dead axon
    tunnel hangs indefinitely (observed: multi-hour outages) — probe in a
    subprocess with a timeout and return the error string instead."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0])"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return f"device probe timed out after {timeout_s:.0f}s (tunnel down?)"
    if r.returncode != 0:
        return f"device probe failed: {r.stderr.strip()[-300:]}"
    return None


def _probe_with_retries(budget_s: float, probe_timeout_s: float = 120.0,
                        retry_sleep_s: float = 20.0) -> str | None:
    """Probe repeatedly until success or the budget runs out — a transient
    tunnel blip must not zero a whole round's record (VERDICT r3 #1)."""
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        left = deadline - time.time()
        if left <= 0:
            return (f"device unreachable after {attempt - 1} probes over "
                    f"{budget_s:.0f}s (tunnel down)")
        err = _probe_once(min(probe_timeout_s, max(left, 10.0)))
        if err is None:
            return None
        print(f"# probe {attempt}: {err} — "
              f"{max(deadline - time.time(), 0):.0f}s of budget left",
              file=sys.stderr, flush=True)
        if time.time() + retry_sleep_s >= deadline:
            return (f"device unreachable after {attempt} probes over "
                    f"{budget_s:.0f}s (tunnel down)")
        time.sleep(retry_sleep_s)


def _run_config_subprocess(name: str, timeout_s: float) -> float | None:
    """Run one config in a child process (stderr passes through); returns
    the RTF or None. A hung/dead child costs this config only."""
    cmd = [sys.executable, os.path.abspath(__file__), "--config", name]
    try:
        r = subprocess.run(cmd, stdout=subprocess.PIPE, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"# config {name}: killed after {timeout_s:.0f}s",
              file=sys.stderr, flush=True)
        return None
    for line in (r.stdout or "").splitlines():
        if line.startswith("RESULT "):
            return float(json.loads(line[len("RESULT "):])["rtf"])
    print(f"# config {name}: exited {r.returncode} without a RESULT line",
          file=sys.stderr, flush=True)
    return None


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--config":
        return _child_main(sys.argv[2])

    budget = float(os.environ.get("KNNSVC_BENCH_PROBE_BUDGET_S", "600"))
    err = _probe_with_retries(budget)
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

    config_timeout = float(os.environ.get("KNNSVC_BENCH_CONFIG_TIMEOUT_S",
                                          "1500"))
    names = ["fast", "post_opt"]
    if os.environ.get("KNNSVC_BENCH_SKIP_PARITY") != "1":
        # parity is the config the <=1e-3 waveform claim stands on: measure
        # it every run (the env var opts out for quick iterations)
        names.append("parity")

    results: dict[str, float] = {}
    for i, name in enumerate(names):
        if i > 0:
            # re-probe between configs: a mid-run outage salvages the
            # configs already measured instead of hanging the rest
            err = _probe_with_retries(min(budget, 240.0))
            if err is not None:
                print(f"# stopping after {list(results)}: {err}",
                      file=sys.stderr, flush=True)
                break
        rtf = _run_config_subprocess(name, config_timeout)
        if rtf is None and _probe_with_retries(min(budget, 240.0)) is None:
            rtf = _run_config_subprocess(name, config_timeout)  # one retry
        if rtf is not None:
            results[name] = rtf
        if name == "fast":
            # emit the headline immediately — later configs are
            # informational and add minutes of compile the driver may not
            # wait for
            payload = {
                "metric": "end_to_end_conversion_rtf",
                "value": results.get("fast", 0.0),
                "unit": "audio_sec/sec/chip",
                "vs_baseline": round(results.get("fast", 0.0) / 50.0, 3),
            }
            if "fast" not in results:
                payload["error"] = "fast config failed twice with the device reachable"
            print(json.dumps(payload), flush=True)
    for name in ("post_opt", "parity"):
        if name in results:
            print(f"# {name} RTF: {results[name]:.1f}x RT (target >=50x)",
                  file=sys.stderr, flush=True)
    return 0 if "fast" in results else 1


if __name__ == "__main__":
    raise SystemExit(main())
