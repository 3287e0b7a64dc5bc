"""Convert reference torch checkpoints to framework-native pytrees
(.knnsvc.pkl — loadable without torch at runtime).

    PYTHONPATH=. python tools/convert_ckpt.py --wavlm WavLM-Large.pt \
        --hifigan g_02500000.pt --ckpt_type mix --out_dir converted/
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--wavlm", default=None, help="WavLM-Large.pt")
    parser.add_argument("--hifigan", default=None, help="g_*.pt")
    parser.add_argument("--ckpt_type", default="mix")
    parser.add_argument("--config", default=None, help="HiFi-GAN config json")
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args(argv)

    from knnsvc_tpu.config import HiFiGANConfig, model_family_for_ckpt_type
    from knnsvc_tpu.io.checkpoints import (
        load_hifigan_checkpoint,
        load_wavlm_checkpoint,
        save_params,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    if args.wavlm:
        params, cfg = load_wavlm_checkpoint(args.wavlm)
        out = os.path.join(args.out_dir, "WavLM-Large.knnsvc.pkl")
        save_params(out, params)
        print(f"wavlm -> {out} (cfg: {cfg.encoder_layers} layers, dim {cfg.encoder_embed_dim})")
    if args.hifigan:
        h = HiFiGANConfig() if args.config is None else HiFiGANConfig.from_json(args.config)
        family = model_family_for_ckpt_type(args.ckpt_type)
        params = load_hifigan_checkpoint(args.hifigan, h, family)
        base = os.path.basename(args.hifigan).rsplit(".", 1)[0]
        out = os.path.join(args.out_dir, f"{base}_{args.ckpt_type}.knnsvc.pkl")
        save_params(out, params)
        print(f"hifigan ({family}) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
