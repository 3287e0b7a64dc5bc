"""Vocoder GAN trainer, TPU-native data parallelism.

Reference recipe (hifigan/ddsp_train.py): AdamW(lr 2e-4, betas (0.8, 0.99)),
per-epoch ExponentialLR decay 0.999, D step (MPD+MSD LSGAN) then G step
(adv + feature-matching + 45*L1 log-mel), batch 16, segment 7040 samples,
DDP over NCCL for multi-GPU.

TPU redesign: ONE jitted `train_step` over a jax.sharding.Mesh — the batch is
sharded on the 'data' axis, parameters replicated; XLA GSPMD inserts the
gradient psum over ICI (the DDP all-reduce equivalent,
ref ddsp_train.py:135-139). The D update happens before the G gradient is
taken, so the generator sees the *updated* discriminators exactly like the
reference's sequential optim_d.step() -> G forward.

Divergences (documented):
- the reference's mix-variant training passes f0 as (B, 1, T) which cannot
  broadcast inside get_bulk_dsp_choral (phases (B, hop, T) * arange(49) ->
  shape error); we use the inference-path layout (B, T, 1) which is what the
  released checkpoints consume.
- spectral-norm power iteration updates once per step (on the real pass)
  instead of torch's once-per-module-call.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from knnsvc_tpu.config import HiFiGANConfig, ModelFamily
from knnsvc_tpu.dsp.stft import log_mel_spectrogram
from knnsvc_tpu.models.hifigan.generator import synthesizer_mix_apply, synthesizer_f0_apply
from knnsvc_tpu.models.hifigan.discriminator import mpd_apply, msd_apply
from knnsvc_tpu.models.hifigan.losses import discriminator_loss, feature_loss, generator_loss

Params = dict[str, Any]

MEL_LOSS_WEIGHT = 45.0  # ref ddsp_train.py:240


class TrainState(NamedTuple):
    g_params: Params
    mpd_params: Params
    msd_params: Params
    opt_g: optax.OptState
    opt_d: optax.OptState
    steps: jax.Array


def make_optimizers(h: HiFiGANConfig):
    """AdamW with torch defaults (weight_decay 0.01) and injectable lr for the
    per-epoch exponential decay (ref ddsp_train.py:141-150)."""
    def make():
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=h.learning_rate, b1=h.adam_b1, b2=h.adam_b2,
            eps=1e-8, weight_decay=0.01,
        )

    return make(), make()


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def init_train_state(key: jax.Array, h: HiFiGANConfig, family: ModelFamily,
                     disc_width_scale: int = 1,
                     disc_periods: int | None = None,
                     disc_scales: int | None = None) -> TrainState:
    from knnsvc_tpu.models.hifigan import (
        init_generator_params,
        init_mpd_params,
        init_msd_params,
    )

    kg, kp, ks = jax.random.split(key, 3)
    g = init_generator_params(kg, h, family, weight_norm_parametrized=True)
    mpd = init_mpd_params(kp, width_scale=disc_width_scale,
                          n_periods=disc_periods)
    msd = init_msd_params(ks, width_scale=disc_width_scale,
                          n_scales=disc_scales)
    opt_g, opt_d = make_optimizers(h)
    return TrainState(
        g_params=g, mpd_params=mpd, msd_params=msd,
        opt_g=opt_g.init(g), opt_d=opt_d.init((mpd, msd)),
        steps=jnp.int32(0),
    )


def _merge_sn_buffers(updated, with_buffers):
    """Replace spectral-norm 'u'/'v_pow' leaves in `updated` with the
    power-iterated values from `with_buffers` (same tree structure)."""
    def merge(path, a, b):
        names = {getattr(p, "key", None) for p in path}
        # cast back: under a bf16 compute dtype the power-iterated buffers
        # come out bf16 while the master tree stays fp32
        return b.astype(a.dtype) if ({"u", "v_pow"} & names) else a

    return jax.tree_util.tree_map_with_path(merge, updated, with_buffers)


def _generator_forward(g_params: Params, h: HiFiGANConfig, family: ModelFamily, batch) -> jax.Array:
    if family == ModelFamily.MIX:
        y_hat = synthesizer_mix_apply(g_params, h, batch["feats"], batch["f0"], batch["harmonics"])
    else:
        y_hat = synthesizer_f0_apply(g_params, h, batch["feats"], batch["f0"])
    return y_hat  # (B, 1, T_samples)


def _mel(h: HiFiGANConfig, wav: jax.Array) -> jax.Array:
    return log_mel_spectrogram(
        wav, n_fft=h.n_fft, num_mels=h.num_mels, sampling_rate=h.sampling_rate,
        hop_size=h.hop_size, win_size=h.win_size, fmin=h.fmin, fmax=h.fmax,
    )


def make_train_step(h: HiFiGANConfig, family: ModelFamily, opt_g: optax.GradientTransformation,
                    opt_d: optax.GradientTransformation, compute_dtype=None):
    """Returns jitted train_step(state, batch) -> (state, metrics). batch:
    feats (B, T, 1024), audio (B, T*hop), mel_loss (B, mels, T'), f0 (B, T, 1),
    harmonics (B, T, 1024?49). Shard batch on 'data', replicate state; jit
    inserts the cross-chip grad psum.

    compute_dtype=jnp.bfloat16 is the TPU analogue of the reference's
    optional fp16 autocast + GradScaler (ref ddsp_train.py:153-155,227-253):
    forwards/backwards run in bf16 on the MXU while master parameters,
    gradients and optimizer state stay fp32. bf16 keeps the fp32 exponent
    range, so no loss scaling is needed. Loss reductions accumulate in fp32."""

    def cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def f32_mean_abs(a, b):
        return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))

    def d_loss_fn(d_params, y, y_hat):
        mpd_p, msd_p = cast(d_params)
        y_df_r, y_df_g, _, _ = mpd_apply(mpd_p, y, y_hat)
        loss_f, _, _ = discriminator_loss(y_df_r, y_df_g)
        y_ds_r, y_ds_g, _, _, msd_p2 = msd_apply(msd_p, y, y_hat, update_sn=True)
        loss_s, _, _ = discriminator_loss(y_ds_r, y_ds_g)
        return (loss_f + loss_s).astype(jnp.float32), msd_p2

    def g_loss_fn(g_params, d_params, batch, y):
        mpd_p, msd_p = cast(d_params)
        y_hat = _generator_forward(cast(g_params), h, family, batch)
        y_hat_mel = _mel(h, y_hat[:, 0, :].astype(jnp.float32))
        loss_mel = f32_mean_abs(batch["mel_loss"], y_hat_mel) * MEL_LOSS_WEIGHT
        _, y_df_g, fmap_f_r, fmap_f_g = mpd_apply(mpd_p, y, y_hat)
        _, y_ds_g, fmap_s_r, fmap_s_g, _ = msd_apply(msd_p, y, y_hat, update_sn=False)
        loss_fm = feature_loss(fmap_f_r, fmap_f_g) + feature_loss(fmap_s_r, fmap_s_g)
        loss_gen_f, _ = generator_loss(y_df_g)
        loss_gen_s, _ = generator_loss(y_ds_g)
        total = (loss_gen_f + loss_gen_s + loss_fm).astype(jnp.float32) + loss_mel
        return total, (loss_mel, y_hat_mel)

    @jax.jit
    def train_step(state: TrainState, batch):
        batch = dict(batch)
        mel_loss_f32 = batch["mel_loss"]
        f0_f32 = batch["f0"]
        batch = cast(batch)
        batch["mel_loss"] = mel_loss_f32  # loss target stays fp32
        # f0 stays fp32 too: bf16 quantizes Hz to a ~0.4% grid (~7 cents) and
        # the phase accumulation is fp32 anyway — the cast would only inject
        # a systematic pitch error into the excitation
        batch["f0"] = f0_f32
        y = batch["audio"][:, None, :]                       # (B, 1, T)

        # ---- D step on detached generator output (ref :211-233)
        y_hat = jax.lax.stop_gradient(
            _generator_forward(cast(state.g_params), h, family, batch))
        (d_total, msd_new), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            (state.mpd_params, state.msd_params), y, y_hat
        )
        d_updates, opt_d_state = opt_d.update(
            d_grads, state.opt_d, (state.mpd_params, state.msd_params)
        )
        mpd_p, msd_upd = optax.apply_updates((state.mpd_params, state.msd_params), d_updates)
        # spectral-norm u/v are buffers, not parameters: take the
        # power-iteration values, discarding any weight-decay drift
        msd_p = _merge_sn_buffers(msd_upd, msd_new)

        # ---- G step against the UPDATED discriminators (ref :236-256)
        (g_total, (loss_mel, y_hat_mel)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params, (mpd_p, msd_p), batch, y)
        g_updates, opt_g_state = opt_g.update(g_grads, state.opt_g, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        mel_err = loss_mel / MEL_LOSS_WEIGHT
        metrics = {
            "loss_gen_total": g_total,
            "loss_disc_total": d_total,
            "mel_spec_error": mel_err,
        }
        return TrainState(
            g_params=g_params, mpd_params=mpd_p, msd_params=msd_p,
            opt_g=opt_g_state, opt_d=opt_d_state, steps=state.steps + 1,
        ), metrics

    return train_step


@functools.partial(jax.jit, static_argnames=("h", "family"))
def eval_step(g_params: Params, h: HiFiGANConfig, family: ModelFamily, batch):
    """Validation mel error on a full utterance (ref ddsp_train.py:288-337).
    Returns (mel_err, y_hat)."""
    y_hat = _generator_forward(g_params, h, family, batch)
    y_hat_mel = _mel(h, y_hat[:, 0, :])
    mel = batch["mel_loss"]
    # generated mel can be one frame short of the reference's (pad fixup,
    # ref :305-311) — compare the overlap
    t = min(mel.shape[-1], y_hat_mel.shape[-1])
    return jnp.mean(jnp.abs(mel[..., :t] - y_hat_mel[..., :t])), y_hat


VALID_BUCKET_FRAMES = 128  # ~2.5 s granularity at hop 320


def eval_bucket(n_frames: int, bucket: int = VALID_BUCKET_FRAMES) -> int:
    return max(bucket, ((n_frames + bucket - 1) // bucket) * bucket)


@functools.partial(jax.jit, static_argnames=("h", "family"))
def eval_step_padded(g_params: Params, h: HiFiGANConfig, family: ModelFamily,
                     batch, true_mel_frames: jax.Array):
    """eval_step on a bucket-padded utterance: one compilation per length
    BUCKET instead of one per utterance length (the per-utterance recompiles
    cost minutes on real validation sets). Inputs are zero-padded to the
    bucket; true_mel_frames is a TRACED scalar, so the mel error is masked —
    not sliced — to the true frames. Returns (mel_err, y_hat) with y_hat
    covering the full padded length; slice the audio on the host."""
    y_hat = _generator_forward(g_params, h, family, batch)
    y_hat_mel = _mel(h, y_hat[:, 0, :])
    mel = batch["mel_loss"]
    t = min(mel.shape[-1], y_hat_mel.shape[-1])
    mask = (jnp.arange(t) < true_mel_frames).astype(mel.dtype)
    diff = jnp.abs(mel[..., :t] - y_hat_mel[..., :t]) * mask
    denom = jnp.maximum(jnp.sum(mask), 1.0) * mel.shape[0] * mel.shape[1]
    return jnp.sum(diff) / denom, y_hat
