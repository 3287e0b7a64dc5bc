"""API demo (the reference's knnvc_demo.py equivalent): single-pair
conversion with the hub API, plus the legacy matching-set surface.

    PYTHONPATH=. python examples/demo.py --ckpt_dir CKPTS [--random_init]
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_dir", default=None)
    parser.add_argument("--ckpt_type", default="wavlm_only",
                        help="the legacy match() demo below needs a non-mix family")
    parser.add_argument("--random_init", action="store_true",
                        help="random weights (no checkpoints; output is noise-like)")
    parser.add_argument("--src", default="/root/reference/sample_content/Danakil-voice_resampled_16000_cut.wav")
    parser.add_argument("--ref", default="/root/reference/sample_content/Tiken_lead_07_resampled_16000_cut.wav")
    parser.add_argument("--out", default="/tmp/demo_out.wav")
    args = parser.parse_args()

    from knnsvc_tpu.hub import KnnSvc

    knn = (KnnSvc.random_init(args.ckpt_type) if args.random_init
           else KnnSvc.load(args.ckpt_dir, args.ckpt_type))

    # high-level: one call
    out = knn.convert_pair(args.src, args.ref, topk=4, post_opt="no_post_opt",
                           output_path=args.out)
    print("converted ->", out)

    # low-level legacy surface (the original knn-vc API shape)
    query = knn.get_features(args.src)
    pool = knn.get_matching_set([args.ref])
    f0 = knn.get_f0(args.src)
    wav = knn.match(query, pool, query_f0=f0, topk=4)
    print("legacy match output:", wav.shape)

    # streaming surface (r3; no reference analogue): bounded-latency chunks
    n = 0
    for chunk in knn.stream_convert_chunks(args.src, args.ref, chunk_s=2.0,
                                           context_s=1.0):
        n += len(chunk)
    print(f"streamed {n / 16000:.1f} s in 2 s chunks (3 s window latency)")

    # live surface (r4): push-based session — samples arrive incrementally
    # (mic/socket), converted audio comes back as each chunk becomes final
    from knnsvc_tpu.io.audio import load_audio, to_mono

    wav = to_mono(load_audio(args.src)[0])[0]
    sess = knn.stream_session(args.ref, chunk_s=2.0, context_s=1.0)
    got = 0
    for piece_start in range(0, len(wav), 4800):  # 0.3 s "mic callbacks"
        got += len(sess.push(wav[piece_start : piece_start + 4800]))
    got += len(sess.flush())
    print(f"live session: pushed {len(wav) / 16000:.1f} s in 0.3 s pieces, "
          f"got {got / 16000:.1f} s back")


if __name__ == "__main__":
    main()
