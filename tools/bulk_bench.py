"""Bulk dataset->dataset serving benchmark (one real TPU chip).

Reconstructs BASELINE.md's bulk workload (round-2 config 3): a 2x2-speaker
world cut from the sample pair — 4 source utterances x 2 target speakers =
8 conversions of 30 s each (240 s of audio generated per pass). Runs
bulk_convert(fast=True) twice and reports the WARM pass (pools, sidecars
and compiles in place — the steady serving regime).

Usage:
    python tools/bulk_bench.py [--matcher approx|int8|sharded|sharded_int8]
                               [--data_batch N] [--post_opt no_post_opt]

On a single chip the sharded matchers run on a 1-device mesh (measures the
shard_map path's overhead, not scaling); data_batch batches utterances
through the vmapped fused match on the 'data' axis.
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import REF, SR, SRC  # the sample pair

UTT_S = 30  # overridable via --utt_s (CPU smoke)


def build_world(root: Path) -> tuple[Path, Path]:
    from knnsvc_tpu.io.audio import load_audio, save_audio, to_mono

    src_root, tgt_root = root / "src_data", root / "tgt_data"
    for source_file, out_root, prefix in ((SRC, src_root, "s"), (REF, tgt_root, "t")):
        x, sr = load_audio(source_file)
        w = to_mono(x)[0]
        n = int(SR * UTT_S)
        # 2 speakers x 2 utterances of 30 s, tiled over the sample audio
        for spk in range(2):
            d = out_root / f"{prefix}spk{spk}"
            d.mkdir(parents=True)
            for u in range(2):
                off = (spk * 2 + u) * (len(w) // 4)
                seg = w[off:off + n]
                if len(seg) < n:  # wrap: the samples are ~60 s
                    seg = np.concatenate([seg, w[: n - len(seg)]])
                save_audio(d / f"utt{u}.wav", seg, sr)
    return src_root, tgt_root


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--matcher", default="approx",
                    choices=["exact", "approx", "int8", "sharded", "sharded_int8"])
    ap.add_argument("--data_batch", type=int, default=None)
    ap.add_argument("--post_opt", default="no_post_opt")
    ap.add_argument("--precision", default="fastest")
    ap.add_argument("--f0_method", default="fast",
                    choices=["fast", "harvest", "dio", "yin", "device"])
    ap.add_argument("--utt_s", type=int, default=30,
                    help="utterance length (short for CPU smoke runs)")
    args = ap.parse_args()
    global UTT_S
    UTT_S = args.utt_s

    from knnsvc_tpu.hub import KnnSvc
    from knnsvc_tpu.precision import set_precision

    set_precision(args.precision)
    knn = KnnSvc.random_init("mix")
    knn.f0_method = args.f0_method

    root = Path(tempfile.mkdtemp(prefix="bulk_bench_"))
    try:
        src_root, tgt_root = build_world(root)
        passes = []
        for tag in ("cold", "warm"):
            out_dir = root / f"out_{tag}"
            t0 = time.perf_counter()
            outs = knn.bulk_convert(
                str(src_root), str(tgt_root), str(out_dir),
                post_opt=args.post_opt, matcher=args.matcher,
                fast=True, data_batch=args.data_batch)
            wall = time.perf_counter() - t0
            audio_s = len(outs) * UTT_S
            passes.append((tag, len(outs), audio_s, wall))
            print(f"{tag}: {len(outs)} conversions, {audio_s:.0f} s audio in "
                  f"{wall:.1f} s = {audio_s / wall:.1f}x RT "
                  f"(matcher={args.matcher}, data_batch={args.data_batch})",
                  flush=True)
        tag, n, audio_s, wall = passes[-1]
        print(f"RESULT bulk_{args.matcher}"
              f"{'_b' + str(args.data_batch) if args.data_batch else ''}: "
              f"{audio_s / wall:.1f}x RT warm", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
