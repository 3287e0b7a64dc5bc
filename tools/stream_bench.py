"""Streaming-conversion latency benchmark (one real TPU chip).

Measures per-chunk wall-clock latency of hub.stream_convert_chunks on the
sample pair at production-ish settings (random full-size weights; latency
is weight-independent). The number that matters for interactive serving is
the per-chunk compute latency vs the chunk duration: compute << chunk means
the stream runs ahead of realtime and total latency ~= chunk_s + context_s
(the algorithmic window) + one chunk's compute.

Usage: python tools/stream_bench.py [--chunk_s 2.0] [--context_s 1.0]
       [--post_opt no_post_opt] [--matcher approx] [--precision fastest]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import REF, SR, SRC  # one source of truth for the sample pair

SECONDS = 30


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk_s", type=float, default=2.0)
    ap.add_argument("--context_s", type=float, default=1.0)
    ap.add_argument("--post_opt", default="no_post_opt")
    ap.add_argument("--matcher", default="approx")
    ap.add_argument("--precision", default="fastest")
    args = ap.parse_args()

    from knnsvc_tpu.hub import KnnSvc
    from knnsvc_tpu.io.audio import load_audio, to_mono
    from knnsvc_tpu.precision import set_precision

    set_precision(args.precision)
    knn = KnnSvc.random_init("mix")

    wav = to_mono(load_audio(SRC)[0])[0][: SR * SECONDS]

    for run in ("cold", "warm"):
        lat = []
        t_prev = time.perf_counter()
        total = 0
        for chunk in knn.stream_convert_chunks(
                wav, REF, chunk_s=args.chunk_s, context_s=args.context_s,
                post_opt=args.post_opt, matcher=args.matcher):
            now = time.perf_counter()
            lat.append(now - t_prev)
            t_prev = now
            total += len(chunk)
        lat = np.asarray(lat)
        # chunk 0 includes the target-pool build; compiles dominate the cold
        # run and are cached for the warm one
        line = (f"{run}: {len(lat)} chunks, {total / SR:.1f} s audio | "
                f"first {lat[0]*1e3:.0f} ms")
        if len(lat) > 1:
            med = float(np.median(lat[1:]))
            line += (f" | steady median {med*1e3:.0f} ms / "
                     f"{args.chunk_s*1e3:.0f} ms chunk "
                     f"({args.chunk_s / med:.1f}x realtime) | "
                     f"p95 {np.percentile(lat[1:], 95)*1e3:.0f} ms")
        print(line, flush=True)
    print(f"algorithmic latency = chunk+context = "
          f"{(args.chunk_s + args.context_s)*1e3:.0f} ms; end-to-end ~= that "
          f"+ one steady chunk compute", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
