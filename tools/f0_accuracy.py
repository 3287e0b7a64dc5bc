"""Measure a native f0 extractor against the shipped pyworld-Harvest sidecars.

The reference caches Harvest output as `<stem>_f0.npy` next to the audio
(ref ddsp_prematch_dataset.py:372-386) and ships sidecars for the two
sample_content files — the only Harvest ground truth available in this
zero-egress image. Reports voicing precision/recall, cents accuracy on
co-voiced frames, and runtime.

Usage: python tools/f0_accuracy.py [--method harvest|fast] [--seconds N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SAMPLES = [
    "/root/reference/sample_content/Danakil-voice_resampled_16000_cut.wav",
    "/root/reference/sample_content/Tiken_lead_07_resampled_16000_cut.wav",
]


def evaluate(extract, seconds: float | None = None) -> dict:
    from knnsvc_tpu.io.audio import load_audio, to_mono

    tp = fp = fn = 0
    all_cents = []
    total_audio = 0.0
    total_wall = 0.0
    for path in SAMPLES:
        x, sr = load_audio(path)
        x = to_mono(x)[0]
        if seconds is not None:
            x = x[: int(sr * seconds)]
        ref = np.load(Path(path).with_name(Path(path).stem + "_f0.npy"))
        n = len(x) // 320 + 1
        ref = np.asarray(ref[:n], dtype=np.float64)

        t0 = time.perf_counter()
        ours = np.asarray(extract(x, sr), dtype=np.float64)[:n]
        total_wall += time.perf_counter() - t0
        total_audio += len(x) / sr

        rv, ov = ref > 0, ours > 0
        tp += int((rv & ov).sum())
        fp += int((~rv & ov).sum())
        fn += int((rv & ~ov).sum())
        both = rv & ov
        all_cents.append(1200 * np.abs(np.log2(ours[both] / ref[both])))

    cents = np.concatenate(all_cents)
    return {
        "precision": tp / max(tp + fp, 1),
        "recall": tp / max(tp + fn, 1),
        "within_50_cents": float((cents < 50).mean()),
        "within_20_cents": float((cents < 20).mean()),
        "median_cents": float(np.median(cents)),
        "rtf": total_audio / max(total_wall, 1e-9),
        "wall_s": total_wall,
        "audio_s": total_audio,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="harvest",
                    choices=["harvest", "fast", "dio", "yin", "device"])
    ap.add_argument("--seconds", type=float, default=None)
    args = ap.parse_args()

    if args.method == "yin":
        from knnsvc_tpu.dsp.f0 import yin_f0 as fn
    elif args.method == "device":
        from knnsvc_tpu.dsp.f0_device import device_f0 as fn
    else:
        import knnsvc_tpu.dsp.harvest as h

        fn = {"harvest": h.harvest_f0, "fast": h.harvest_fast_f0,
              "dio": h.dio_f0}[args.method]
    stats = evaluate(fn, args.seconds)
    for k, v in stats.items():
        print(f"{k:>18}: {v:.4f}" if isinstance(v, float) else f"{k:>18}: {v}")
    ok = (stats["precision"] >= 0.95 and stats["recall"] >= 0.95
          and stats["within_50_cents"] >= 0.95)
    print(f"{'PARITY GATE':>18}: {'PASS' if ok else 'fail'} "
          "(>=.95 precision & recall, >=95% within 50 cents)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
