"""Conversion CLI — the reference's ddsp_inference.py surface
(ref ddsp_inference.py:17-110), argument-for-argument:

  python -m knnsvc_tpu.cli.inference SRC TGT --ckpt_dir D --ckpt_type mix \
      --post_opt post_opt_0.2 --topk 4 --prioritize_f0 true \
      --tgt_loudness_db -16 --dur_limit N --required_subset_file f.csv

Both positionals are files (pair mode) or both are dataset roots (bulk mode);
bulk output dir naming replicates ref :79-103 including the
`duration_limit_N_` prefix. `--device` is accepted for compatibility but the
device is whatever JAX platform is active (TPU under axon).

Documented divergences: no sys.exit after pair conversion (ref
ddsp_matcher.py:1022); `--topk` is honored instead of being ignored
(ref ddsp_prematch_dataset.py:1246); loudness normalization actually applies
when --apply_loudness is passed (the reference's is commented out).
"""

from __future__ import annotations

import argparse
import os


def str2bool(v: str) -> bool:
    v = v.lower()
    if v in ("yes", "true", "t", "1", "y"):
        return True
    if v in ("no", "false", "f", "0", "n"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="kNN-SVC inference (TPU): file or folder mode")
    parser.add_argument("src", help="content source: audio file OR dataset root of speaker folders")
    parser.add_argument("tgt", help="style target: audio file OR dataset root of speaker folders")
    parser.add_argument("--ckpt_dir", type=str, default=None,
                        help="directory holding the HiFi-GAN + WavLM checkpoints")
    parser.add_argument("--ckpt_type", type=str, default="mix",
                        help="mix, mix_harm_no_amp_*, mix_no_harm_no_amp_*, wavlm_only, wavlm_only_original")
    parser.add_argument("--post_opt", type=str, default="no_post_opt",
                        help="no_post_opt or post_opt_<concat_weight>, e.g. post_opt_0.2")
    parser.add_argument("--required_subset_file", type=str, default=None)
    parser.add_argument("--topk", type=int, default=4)
    parser.add_argument("--device", type=str, default="tpu", help="accepted for compatibility")
    parser.add_argument("--prioritize_f0", type=str2bool, default=True)
    parser.add_argument("--tgt_loudness_db", type=float, default=-16)
    parser.add_argument("--apply_loudness", type=str2bool, default=False,
                        help="actually apply loudness normalization (reference keeps it disabled)")
    parser.add_argument("--dur_limit", type=int, default=None,
                        help="duration limit (s) on the target pool")
    parser.add_argument("--resume", type=str2bool, default=False,
                        help="bulk mode: skip outputs that already exist (crash recovery)")
    parser.add_argument("--pool_cache_dir", type=str, default=None,
                        help="bulk mode: on-disk speaker-pool cache (reuse across runs)")
    parser.add_argument("--wavlm_ckpt", type=str, default=None)
    parser.add_argument("--random_init", type=str2bool, default=False,
                        help="random full-size weights (smoke tests / benchmarks; no checkpoints needed)")
    parser.add_argument("--config", type=str, default=None, help="HiFi-GAN config json")
    parser.add_argument("--precision", type=str, default="highest",
                        choices=["highest", "high", "fastest"],
                        help="matmul/conv precision: highest = fp32 parity, fastest = bf16 MXU")
    parser.add_argument("--matcher", type=str, default="exact",
                        choices=["exact", "approx", "int8", "sharded",
                                 "sharded_int8"],
                        help="kNN candidate search: exact (parity), approx (aggregated "
                             "top-k), int8 (quantized pool), sharded (pool sharded over "
                             "all devices' Mesh 'pool' axis, distributed top-k merge), "
                             "sharded_int8 (int8 pool AND sharded: P/(4*n) bytes/device)")
    parser.add_argument("--out", type=str, default=None,
                        help="pair mode: explicit output path (default: the "
                             "reference's convention of writing next to the "
                             "source file, ref ddsp_matcher.py:1013-1023)")
    parser.add_argument("--fast", type=str2bool, default=False,
                        help="device-resident serving path (pools/match/vocode "
                             "stay in HBM, fast native f0, int16 downloads; "
                             "~10x lower pair latency / ~3x bulk throughput on "
                             "tunneled setups; identical selections for "
                             "--matcher exact)")
    parser.add_argument("--f0_method", default="fast",
                        choices=["fast", "harvest", "dio", "yin", "device"],
                        help="--fast/--stream_chunk_s paths: f0 extractor. "
                             "'fast' = native budget Harvest on a background "
                             "host thread (quality-proven default); 'device' "
                             "= the accelerator-resident extractor fused "
                             "into the pool-build dispatch (zero host "
                             "compute — max sustained throughput)")
    parser.add_argument("--upload_depth", choices=["float32", "int16"],
                        default="float32",
                        help="--fast pair mode: int16 halves the waveform "
                             "uploads (lossless for 16-bit-sourced audio, "
                             "-96 dBFS quantization noise otherwise) — the "
                             "upload dominates congested-tunnel requests")
    parser.add_argument("--stream_chunk_s", type=float, default=None,
                        help="pair mode only: convert through the streaming "
                             "path in chunks of this many seconds (bounded "
                             "latency; see KnnSvc.stream_convert_chunks)")
    parser.add_argument("--stream_context_s", type=float, default=1.0,
                        help="lookahead/lookback context per streamed chunk")
    parser.add_argument("--stream_right_context_s", type=float, default=None,
                        help="decouple LOOKAHEAD from lookback: only the "
                             "right context adds algorithmic latency "
                             "(default: symmetric --stream_context_s)")
    parser.add_argument("--stream_encoder", default="windowed",
                        choices=("windowed", "cached"),
                        help="'cached' uses the incremental KV-cache encoder "
                             "(encodes only new frames per chunk instead of "
                             "re-encoding the context window; see "
                             "KnnSvc.stream_convert_chunks)")
    parser.add_argument("--stream_cache_s", type=float, default=4.0,
                        help="cached encoder only: seconds of finalized "
                             "frames kept as attention left context")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # pure-argument validation BEFORE the (minutes-long, tunneled) model load
    if args.stream_chunk_s is not None:
        # same surface the hub streams through (test_streaming covers all 4)
        if args.matcher not in ("exact", "approx", "sharded", "sharded_int8"):
            raise SystemExit(f"--stream_chunk_s supports --matcher "
                             f"exact|approx|sharded|sharded_int8, "
                             f"not {args.matcher!r}")
        if args.matcher == "sharded_int8" and args.post_opt != "no_post_opt":
            raise SystemExit("--matcher sharded_int8 streams no_post_opt "
                             "configs only (concat/smoothness read fp32 "
                             "matching rows; use --matcher sharded)")
        if os.path.isdir(args.src) or os.path.isdir(args.tgt):
            raise SystemExit("--stream_chunk_s applies to pair (file-file) "
                             "mode only; bulk mode converts whole utterances")

    from knnsvc_tpu.precision import set_precision

    set_precision(args.precision)

    from knnsvc_tpu.hub import KnnSvc

    if args.random_init:
        knn = KnnSvc.random_init(args.ckpt_type)
    else:
        knn = KnnSvc.load(args.ckpt_dir, args.ckpt_type, args.wavlm_ckpt, args.config)
    knn.f0_method = args.f0_method

    src_is_file, tgt_is_file = os.path.isfile(args.src), os.path.isfile(args.tgt)
    src_is_dir, tgt_is_dir = os.path.isdir(args.src), os.path.isdir(args.tgt)

    loudness = args.tgt_loudness_db if args.apply_loudness else None

    if src_is_file and tgt_is_file:
        if args.stream_chunk_s is not None:
            out = knn.stream_convert(
                args.src, args.tgt, output_path=args.out,
                tgt_loudness_db=loudness, chunk_s=args.stream_chunk_s,
                context_s=args.stream_context_s, topk=args.topk,
                prioritize_f0=args.prioritize_f0, post_opt=args.post_opt,
                matcher=args.matcher,
                right_context_s=args.stream_right_context_s,
                encoder=args.stream_encoder, cache_s=args.stream_cache_s,
            )
            print("->", out)
            return 0
        out = knn.convert_pair(
            args.src, args.tgt, topk=args.topk, prioritize_f0=args.prioritize_f0,
            post_opt=args.post_opt, tgt_loudness_db=loudness, matcher=args.matcher,
            fast=args.fast, output_path=args.out,
            upload_dtype=args.upload_depth,
        )
        print("->", out)
        return 0

    if src_is_dir and tgt_is_dir:
        tgt_parent = f"{os.path.dirname(os.path.abspath(args.tgt))}/"
        converted_audio_dir = (
            f"{tgt_parent}"
            f"{os.path.basename(args.src)}_to_{os.path.basename(args.tgt)}_"
            f"{args.ckpt_type}_post_opt_{args.post_opt}/"
        )
        if args.dur_limit is not None:
            converted_audio_dir = converted_audio_dir.replace(
                tgt_parent, tgt_parent + f"duration_limit_{args.dur_limit}_"
            )
        written = knn.bulk_convert(
            src_dataset_path=args.src, tgt_dataset_path=args.tgt,
            converted_audio_dir=converted_audio_dir, topk=args.topk,
            prioritize_f0=args.prioritize_f0, post_opt=args.post_opt,
            required_subset_file=args.required_subset_file,
            duration_limit=args.dur_limit, tgt_loudness_db=loudness,
            resume=args.resume, pool_cache_dir=args.pool_cache_dir,
            matcher=args.matcher, fast=args.fast,
        )
        print(f"wrote {len(written)} files under {converted_audio_dir}")
        return 0

    raise SystemExit("Both inputs must be files or both must be folders.")


if __name__ == "__main__":
    raise SystemExit(main())
