"""Training loop orchestration (the reference's hifigan/ddsp_train.py:29-440
train() function, re-built around one jitted DP train step).

- mesh DP: global batch sharded on 'data'; replicated params; XLA psum = the
  DDP all-reduce (ref :135-139). The reference's `num_gpus = device_count()-1`
  quirk (ref :434) is NOT replicated — all mesh devices are used.
- per-epoch ExponentialLR decay (ref :149-150,387-388); 1e6 hard step cap
  (ref :172); periodic validation on full utterances; best-val-only
  checkpoint retention with deletion of the previous best (ref :344-372).
- checkpoints: g_<steps>.knnsvc.pkl {generator} and do_<steps>.knnsvc.pkl
  {mpd, msd, optim states, steps, epoch} mirroring the reference's pair
  (ref :352-366); scan_checkpoint-compatible names.
- metrics go to a JSONL log (logs/train_log.jsonl) instead of tensorboard —
  same scalars (gen_loss_total, mel_spec_error, disc_loss_total, validation
  mel error — ref :281-284,336).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from knnsvc_tpu.config import HiFiGANConfig, ModelFamily
from knnsvc_tpu.io.checkpoints import save_params
from knnsvc_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from knnsvc_tpu.train.dataset import MelDataset, batch_iterator
from knnsvc_tpu.train.trainer import (
    TrainState,
    eval_bucket,
    eval_step_padded,
    init_train_state,
    make_optimizers,
    make_train_step,
    set_learning_rate,
)

MAX_STEPS = 1_000_000  # ref ddsp_train.py:172


def train(
    h: HiFiGANConfig,
    audio_root_train: str,
    feat_root_train: str,
    audio_root_valid: str,
    feat_root_valid: str,
    checkpoint_path: str,
    training_epochs: int = 1800,
    validation_interval: int = 1000,
    summary_interval: int = 25,
    stdout_interval: int = 25,
    with_harm: bool | None = None,
    max_steps: int = MAX_STEPS,
    max_val_items: int | None = None,
    mesh=None,
    seed: int | None = None,
    resume_from: str | None = None,
    compute_dtype: str | None = None,
    checkpoint_backend: str = "pickle",
    val_artifacts: int = 2,
    ckpt_type: str | None = None,
    disc_width_scale: int = 1,
) -> TrainState:
    """compute_dtype='bfloat16' enables the mixed-precision train step (the
    reference's fp16 AMP analogue, ref ddsp_train.py:153-155).
    checkpoint_backend='orbax' stores best-val TrainStates through
    orbax.CheckpointManager (async-capable, multi-host-safe) instead of the
    reference-shaped g_/do_ pickle pair. val_artifacts: save the first N
    validation utterances' generated audio + mel to logs/ at each validation
    (the reference's tensorboard audio/spectrogram artifacts,
    ref ddsp_train.py:320-336)."""
    family = ModelFamily.MIX if (h.with_harm if with_harm is None else with_harm) else ModelFamily.F0_ONLY
    # checkpoint names carry the ckpt_type so the deploy path's
    # scan_checkpoint(ckpt_dir, ckpt_type) finds them directly
    # (ref ddsp_hubconf.py:85: cp_g = scan_checkpoint(local_ckpt_dir, ckpt_type))
    if ckpt_type is None:
        ckpt_type = "mix" if family == ModelFamily.MIX else "wavlm_only"
    os.makedirs(checkpoint_path, exist_ok=True)
    log_dir = Path(checkpoint_path) / "logs"
    os.makedirs(log_dir, exist_ok=True)
    log_file = open(log_dir / "train_log.jsonl", "a")

    if mesh is None:
        # data axis must divide the global batch; use the largest such device
        # count (the reference instead divides batch_size per GPU, ref :429)
        n_dev = len(jax.devices())
        n_data = max(d for d in range(1, n_dev + 1) if h.batch_size % d == 0 and d <= n_dev)
        mesh = make_mesh(n_data=n_data, n_pool=1)
    batch_sharding = data_sharding(mesh)
    rep = replicated(mesh)

    opt_g, opt_d = make_optimizers(h)
    state = init_train_state(jax.random.PRNGKey(h.seed if seed is None else seed), h, family,
                             disc_width_scale=disc_width_scale)
    start_epoch, start_steps = 0, 0
    if resume_from is not None and checkpoint_backend == "orbax":
        from knnsvc_tpu.io.orbax_ckpt import restore_train_state

        try:
            state, start_steps, ckpt_epoch = restore_train_state(
                os.path.join(resume_from, "orbax"), jax.device_get(state))
            start_steps += 1
            start_epoch = ckpt_epoch + 1
            print(f"restored orbax checkpoint at step {start_steps} "
                  f"(epoch {start_epoch})", flush=True)
        except FileNotFoundError:
            pass
    elif resume_from is not None:
        # restore from a g_/do_ checkpoint pair (ref ddsp_train.py:113-133;
        # note the reference force-disables its own restore at :118-119)
        from knnsvc_tpu.hub import scan_checkpoint
        from knnsvc_tpu.io.checkpoints import load_params as _load

        cp_g, cp_do = scan_checkpoint(resume_from, "g_"), scan_checkpoint(resume_from, "do_")
        if cp_g and cp_do:
            g = _load(cp_g)["generator"]
            do = _load(cp_do)
            state = state._replace(
                g_params=g, mpd_params=do["mpd"], msd_params=do["msd"],
                opt_g=do.get("optim_g", state.opt_g),
                opt_d=do.get("optim_d", state.opt_d),
                # keep the in-state global step counter continuous across
                # resume, matching the orbax path (which restores the whole
                # TrainState, steps included)
                steps=jnp.int32(int(do.get("steps", 0))),
            )
            start_steps = int(do.get("steps", 0)) + 1
            start_epoch = int(do.get("epoch", -1)) + 1
            print(f"restored from {cp_g} / {cp_do} at step {start_steps}", flush=True)
    state = jax.device_put(state, rep)
    dtype = jnp.bfloat16 if compute_dtype in ("bfloat16", "bf16") else None
    step_fn = make_train_step(h, family, opt_g, opt_d, compute_dtype=dtype)

    trainset = MelDataset(h, audio_root_train, feat_root_train, split=True, seed=h.seed)
    validset = MelDataset(h, audio_root_valid, feat_root_valid, split=False, shuffle=False)

    prev_min_val_err = float("inf")
    prev_min_val_err_step = -1
    cur_best_ckpts: list[str] = []
    steps = start_steps

    def log(scalars: dict):
        log_file.write(json.dumps({"step": steps, **scalars}) + "\n")
        log_file.flush()

    def run_validation():
        nonlocal prev_min_val_err, prev_min_val_err_step, cur_best_ckpts
        errs = []
        for j in range(len(validset) if max_val_items is None else min(max_val_items, len(validset))):
            item = validset[j]
            # pad to a frame bucket: one compile per bucket, not per utterance
            # length (masked error — see trainer.eval_step_padded)
            T = item["feats"].shape[0]
            Tb = eval_bucket(T)
            mel_true = item["mel_loss"].shape[-1]

            def fit(a, n, axis=0):
                # clip-then-pad to exactly n along axis (full-utterance audio
                # and mel can each run a hair past T*hop / T+1)
                sl = [slice(None)] * a.ndim
                sl[axis] = slice(0, n)
                a = a[tuple(sl)]
                widths = [(0, 0)] * a.ndim
                widths[axis] = (0, n - a.shape[axis])
                return np.pad(a, widths)

            batch = {
                "feats": jnp.asarray(fit(item["feats"], Tb))[None],
                "audio": jnp.asarray(fit(item["audio"], Tb * h.hop_size))[None],
                "mel_loss": jnp.asarray(fit(item["mel_loss"], Tb + 1, axis=-1))[None],
                "f0": jnp.asarray(fit(item["f0"], Tb))[None],
                "harmonics": jnp.asarray(fit(item["harmonics"], Tb))[None],
            }
            err, y_hat = eval_step_padded(state.g_params, h, family, batch,
                                          jnp.int32(min(mel_true, Tb + 1)))
            errs.append(float(err))
            if j < val_artifacts:
                # the reference's tensorboard audio + mel-figure artifacts
                # (ref ddsp_train.py:320-336) as plain files
                from knnsvc_tpu.dsp.stft import log_mel_spectrogram
                from knnsvc_tpu.io.audio import save_audio

                wav = np.asarray(y_hat[0, 0, : T * h.hop_size])
                save_audio(log_dir / f"val_{steps:08d}_{j}.wav", wav, h.sampling_rate)
                mel = np.asarray(log_mel_spectrogram(
                    jnp.asarray(wav)[None], n_fft=h.n_fft, num_mels=h.num_mels,
                    sampling_rate=h.sampling_rate, hop_size=h.hop_size,
                    win_size=h.win_size, fmin=h.fmin, fmax=h.fmax)[0])
                np.save(log_dir / f"val_{steps:08d}_{j}_mel.npy", mel)
                try:
                    from knnsvc_tpu.utils.plotting import save_mel_figure

                    save_mel_figure(log_dir / f"val_{steps:08d}_{j}_mel.png", mel)
                except Exception:
                    pass  # matplotlib absent: the .npy artifact remains
        val_err = float(np.mean(errs)) if errs else float("inf")
        log({"validation/mel_spec_error": val_err})
        print(f"validation at {steps}: mel err {val_err:.4f}", flush=True)

        if val_err < prev_min_val_err:
            prev_min_val_err, prev_min_val_err_step = val_err, steps
            if checkpoint_backend == "orbax":
                from knnsvc_tpu.io.orbax_ckpt import save_train_state

                save_train_state(os.path.join(checkpoint_path, "orbax"),
                                 steps, jax.device_get(state), keep=1,
                                 epoch=epoch)
                cur_best_ckpts = []
            else:
                new_ckpts = [
                    os.path.join(checkpoint_path,
                                 f"g_{ckpt_type}_{steps:08d}.knnsvc.pkl"),
                    os.path.join(checkpoint_path,
                                 f"do_{ckpt_type}_{steps:08d}.knnsvc.pkl"),
                ]
                save_params(new_ckpts[0], {"generator": jax.device_get(state.g_params)})
                save_params(new_ckpts[1], {
                    "mpd": jax.device_get(state.mpd_params),
                    "msd": jax.device_get(state.msd_params),
                    "optim_g": jax.device_get(state.opt_g),
                    "optim_d": jax.device_get(state.opt_d),
                    "steps": steps,
                    "epoch": epoch,
                })
                for old in cur_best_ckpts:
                    if os.path.exists(old):
                        os.remove(old)
                cur_best_ckpts = new_ckpts

    for epoch in range(start_epoch, training_epochs):
        if steps > max_steps:
            break
        epoch_start = time.time()
        lr = h.learning_rate * (h.lr_decay ** epoch)
        state = state._replace(
            opt_g=set_learning_rate(state.opt_g, lr),
            opt_d=set_learning_rate(state.opt_d, lr),
        )

        for batch in batch_iterator(trainset, h.batch_size, shuffle=True,
                                    seed=h.seed + epoch,
                                    num_workers=h.num_workers):
            # device_put straight from numpy: one host->device transfer with
            # the target sharding (jnp.asarray first would upload twice)
            arrays = {k: jax.device_put(np.asarray(batch[k]), batch_sharding)
                      for k in ("feats", "audio", "mel_loss", "f0", "harmonics")}
            state, metrics = step_fn(state, arrays)

            if steps % summary_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                log(m)
            if steps % stdout_interval == 0:
                print(f"step {steps}: gen {float(metrics['loss_gen_total']):.3f} "
                      f"mel {float(metrics['mel_spec_error']):.3f} "
                      f"(best val {prev_min_val_err:.3f} @ {prev_min_val_err_step})", flush=True)
            if steps % validation_interval == 0:
                run_validation()
            steps += 1
            if steps > max_steps:
                break

        print(f"epoch {epoch + 1} took {int(time.time() - epoch_start)}s", flush=True)

    log_file.close()
    return state


def export_servable_checkpoint(checkpoint_path: str, h: HiFiGANConfig,
                               with_harm: bool | None = None,
                               ckpt_type: str | None = None,
                               out_dir: str | None = None) -> tuple[str, str]:
    """Materialize the best-val orbax TrainState as the reference-shaped
    g_/do_ pickle pair, servable by `KnnSvc.load(out_dir, ckpt_type)` and
    resumable by `train(resume_from=out_dir)` (the deploy artifact of
    ref ddsp_train.py:352-367). Returns (g_path, do_path)."""
    from knnsvc_tpu.io.orbax_ckpt import restore_train_state
    from knnsvc_tpu.train.trainer import init_train_state

    family = ModelFamily.MIX if (h.with_harm if with_harm is None else with_harm) else ModelFamily.F0_ONLY
    if ckpt_type is None:
        ckpt_type = "mix" if family == ModelFamily.MIX else "wavlm_only"
    template = jax.device_get(init_train_state(jax.random.PRNGKey(0), h, family))
    state, steps, epoch = restore_train_state(
        os.path.join(checkpoint_path, "orbax"), template)
    out_dir = checkpoint_path if out_dir is None else out_dir
    os.makedirs(out_dir, exist_ok=True)
    g_path = os.path.join(out_dir, f"g_{ckpt_type}_{steps:08d}.knnsvc.pkl")
    do_path = os.path.join(out_dir, f"do_{ckpt_type}_{steps:08d}.knnsvc.pkl")
    save_params(g_path, {"generator": jax.device_get(state.g_params)})
    save_params(do_path, {
        "mpd": jax.device_get(state.mpd_params),
        "msd": jax.device_get(state.msd_params),
        "optim_g": jax.device_get(state.opt_g),
        "optim_d": jax.device_get(state.opt_d),
        "steps": steps,
        "epoch": epoch,
    })
    return g_path, do_path
