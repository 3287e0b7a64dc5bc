"""Fast-path fidelity table: serving config vs parity config (BASELINE.md).

Re-measures the neighbor-selection agreement and waveform deviation of the
production fast path (bf16 MXU matmuls + approx top-k + budget-Harvest f0)
against the parity path (fp32 HIGHEST + exact top-k + parity-Harvest f0) on
the sample_content pair — the r1 table tracked only precision+matcher; this
one also captures the serving f0 extractor (VERDICT r4 #4: the budget-Harvest
swap changed the fast path after the table was last measured). A third
ablation row (fast precision + parity f0) separates the f0-extractor effect
from the numerics effect.

Must run on the real chip: on CPU, Precision.DEFAULT is fp32, so the bf16
MXU effect does not exist there.

    PYTHONPATH=.:$AXON python tools/fidelity_table.py [--seconds 30]

Prints a markdown table (for BASELINE.md) plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SAMPLE_DIR = "/root/reference/sample_content"
SRC = f"{SAMPLE_DIR}/Danakil-voice_resampled_16000_cut.wav"
REF = f"{SAMPLE_DIR}/Tiken_lead_07_resampled_16000_cut.wav"
SR = 16000

# mode -> (precision, matcher, f0_method)
MODES = {
    "parity": ("highest", "exact", "harvest"),
    "fast": ("fastest", "approx", "fast"),
    "fast_parity_f0": ("fastest", "approx", "harvest"),  # f0-effect ablation
    "fast_device_f0": ("fastest", "approx", "device"),   # zero-host-f0 mode
}


def _slice_wavs(seconds: int, tmp: str) -> list[np.ndarray]:
    from knnsvc_tpu.io.audio import load_audio, to_mono

    wavs = []
    for p in (SRC, REF):
        x, sr = load_audio(p)
        assert sr == SR
        wavs.append(np.asarray(to_mono(x)[0][: seconds * SR], np.float32))
    return wavs


def run_mode(mode: str, wavs, wavlm_params, wavlm_cfg, weights, gen_params,
             h) -> dict:
    import jax.numpy as jnp

    from knnsvc_tpu.config import ModelFamily, PostOpt
    from knnsvc_tpu.match.f0_logic import (shift_f0_to_target_register,
                                           sort_by_f0_compatibility)
    from knnsvc_tpu.match.knn import knn_topk
    from knnsvc_tpu.match.pool import build_device_pool
    from knnsvc_tpu.match.serve import convert_pools_fused
    from knnsvc_tpu.precision import set_precision

    precision, matcher, f0_method = MODES[mode]
    set_precision(precision)

    src, ref = (build_device_pool(w, wavlm_params, wavlm_cfg, weights,
                                  weights, SR, f0_method=f0_method)
                for w in wavs)
    idx32, _ = knn_topk(src.matching, ref.matching, k=32,
                        approx=(matcher == "approx"))
    shifted = shift_f0_to_target_register(src.f0, ref.f0)
    pitched = sort_by_f0_compatibility(shifted, ref.f0, idx32)
    q, _ = convert_pools_fused(gen_params, h, ModelFamily.MIX, "mix", src,
                               ref, PostOpt.parse("no_post_opt"), topk=4,
                               matcher=matcher, sr=SR)
    return dict(
        feats=np.asarray(src.matching, np.float32),
        src_f0=np.asarray(src.f0, np.float32),
        idx32=np.asarray(idx32),
        top4=np.asarray(idx32[:, :4]),
        pitched4=np.asarray(pitched[:, :4]),
        wav=np.asarray(q).astype(np.float32) / 32768.0,
    )


def _set_overlap(a: np.ndarray, b: np.ndarray) -> float:
    """Mean per-row |intersection| / k for (T, k) index arrays."""
    hits = sum(float(len(np.intersect1d(ra, rb))) for ra, rb in zip(a, b))
    return hits / (a.shape[0] * a.shape[1])


def compare(base: dict, other: dict) -> dict:
    feat_dev = float(np.max(np.abs(other["feats"] - base["feats"]))
                     / np.std(base["feats"]))
    n = min(len(base["wav"]), len(other["wav"]))
    wav_dev = float(np.max(np.abs(other["wav"][:n] - base["wav"][:n])))
    voiced = (base["src_f0"] > 0) & (other["src_f0"] > 0)
    cents = (1200 * np.abs(np.log2(other["src_f0"][voiced]
                                   / base["src_f0"][voiced]))
             if voiced.any() else np.zeros(1))
    return {
        "feat_max_dev_over_std": round(feat_dev, 4),
        "top1_agreement": round(float(np.mean(
            other["idx32"][:, 0] == base["idx32"][:, 0])), 4),
        "top4_overlap": round(_set_overlap(other["top4"], base["top4"]), 4),
        "pitched_top4_overlap": round(
            _set_overlap(other["pitched4"], base["pitched4"]), 4),
        "top32_overlap": round(
            _set_overlap(other["idx32"], base["idx32"]), 4),
        "waveform_max_dev": round(wav_dev, 4),
        "src_f0_voiced_agreement": round(float(np.mean(
            (base["src_f0"] > 0) == (other["src_f0"] > 0))), 4),
        "src_f0_median_cents": round(float(np.median(cents)), 2),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=30)
    ap.add_argument("--skip_ablation", action="store_true")
    args = ap.parse_args(argv)

    import jax

    from knnsvc_tpu.config import HiFiGANConfig, WavLMConfig
    from knnsvc_tpu.models.hifigan import init_generator_params
    from knnsvc_tpu.models.wavlm import init_wavlm_params
    from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index
    from knnsvc_tpu.config import ModelFamily

    dev = jax.devices()[0]
    print(f"# device={dev}", file=sys.stderr, flush=True)
    if dev.platform == "cpu":
        print("# WARNING: CPU backend — Precision.DEFAULT is fp32 here, so "
              "this measures matcher+f0 effects only", file=sys.stderr)

    wavlm_cfg = WavLMConfig()
    h = HiFiGANConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    wavlm_params = init_wavlm_params(k1, wavlm_cfg)
    gen_params = init_generator_params(k2, h, ModelFamily.MIX)
    weights = generate_matrix_from_index(6)

    with tempfile.TemporaryDirectory() as td:
        wavs = _slice_wavs(args.seconds, td)

    results = {}
    modes = ["parity", "fast"] + ([] if args.skip_ablation
                                  else ["fast_parity_f0", "fast_device_f0"])
    for mode in modes:
        print(f"# running {mode} ...", file=sys.stderr, flush=True)
        results[mode] = run_mode(mode, wavs, wavlm_params, wavlm_cfg,
                                 weights, gen_params, h)

    out = {"seconds": args.seconds,
           "fast_vs_parity": compare(results["parity"], results["fast"])}
    for abl in ("fast_parity_f0", "fast_device_f0"):
        if abl in results:
            out[f"{abl}_vs_parity"] = compare(results["parity"],
                                              results[abl])

    rows = [("fast (bf16+approx+budget-Harvest)", out["fast_vs_parity"])]
    if "fast_parity_f0_vs_parity" in out:
        rows.append(("fast, parity f0 (bf16+approx only)",
                     out["fast_parity_f0_vs_parity"]))
    if "fast_device_f0_vs_parity" in out:
        rows.append(("fast, device f0 (zero-host-f0 serving)",
                     out["fast_device_f0_vs_parity"]))
    print("\n| Config vs parity | feat dev/std | top-1 | top-4 | pitched "
          "top-4 | top-32 | wav max dev | f0 voiced agree | f0 med cents |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name, m in rows:
        print(f"| {name} | {m['feat_max_dev_over_std']} "
              f"| {m['top1_agreement']:.1%} | {m['top4_overlap']:.1%} "
              f"| {m['pitched_top4_overlap']:.1%} | {m['top32_overlap']:.1%} "
              f"| {m['waveform_max_dev']} | {m['src_f0_voiced_agreement']:.1%} "
              f"| {m['src_f0_median_cents']} |")
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
