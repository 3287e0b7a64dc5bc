"""Measure the vocoder GAN train step at the REAL config on one TPU chip.

Reference hparams (hifigan/config_v1_wavlm.json:3-8): batch 16, segment 7040
samples (22 frames), 512 initial channels, full MPD (periods 2,3,5,7,11) +
MSD (3 scales), AdamW. Reports steps/sec, samples/sec and device HBM for the
fp32 and bf16 (mixed-precision) train steps. Results go into BASELINE.md's
"vocoder fine-tune recipe" row.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/train_bench.py [--steps 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def tiny_batch(h, B, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    T = h.segment_size // h.hop_size
    n_mel = (h.segment_size + (h.n_fft - h.hop_size) - h.n_fft) // h.hop_size + 1
    return {
        "feats": jnp.asarray(rng.standard_normal((B, T, h.hubert_dim)).astype(np.float32)),
        "audio": jnp.asarray((rng.standard_normal((B, h.segment_size)) * 0.1).astype(np.float32)),
        "mel_loss": jnp.full((B, h.num_mels, n_mel), -5.0, dtype=jnp.float32),
        "f0": jnp.asarray((rng.random((B, T, 1)) * 200 + 80).astype(np.float32)),
        "harmonics": jnp.asarray((rng.random((B, T, 49)) * 0.05).astype(np.float32)),
    }


def mem_gb() -> float | None:
    import jax

    stats = jax.local_devices()[0].memory_stats() or {}
    b = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return None if b is None else b / 2**30


def run(compute_dtype, n_steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from knnsvc_tpu.config import HiFiGANConfig, ModelFamily
    from knnsvc_tpu.train.trainer import init_train_state, make_optimizers, make_train_step

    h = HiFiGANConfig()  # the reference's full config_v1_wavlm
    family = ModelFamily.MIX
    opt_g, opt_d = make_optimizers(h)
    state = init_train_state(jax.random.PRNGKey(0), h, family)
    dtype = jnp.bfloat16 if compute_dtype == "bf16" else None
    step = make_train_step(h, family, opt_g, opt_d, compute_dtype=dtype)
    batch = tiny_batch(h, h.batch_size)

    t0 = time.time()
    state, metrics = step(state, batch)
    _ = float(metrics["loss_gen_total"])  # forces completion (axon tunnel)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    last = float(metrics["loss_gen_total"])  # sync once at the end
    wall = time.time() - t0
    assert np.isfinite(last), last
    return {
        "dtype": compute_dtype,
        "compile_s": round(compile_s, 1),
        "steps_per_sec": round(n_steps / wall, 2),
        "samples_per_sec": round(n_steps * h.batch_size / wall, 1),
        "peak_hbm_gb": None if (m := mem_gb()) is None else round(m, 2),
        "loss_gen_total": round(last, 3),
    }


def main() -> int:
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", flush=True)
    for dtype in ("fp32", "bf16"):
        r = run(dtype, args.steps)
        print(r, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
