"""HiFi-GAN v1 discriminators (ref hifigan/ddsp_models.py:496-616).

- MultiPeriodDiscriminator: 5 period sub-discriminators (2,3,5,7,11), each a
  stack of strided Conv2d over the waveform folded to (T/p, p).
- MultiScaleDiscriminator: 3 scale sub-discriminators with AvgPool(4,2)
  between scales; the first uses spectral norm, the rest weight norm.

Weight-normed convs use the live {"g","v"} parametrization during training
(see layers.conv_weight). Spectral norm keeps an explicit power-iteration
vector `u` in the params; `msd_apply` returns updated params alongside the
outputs, keeping the update functional (torch mutates u in-place during
forward — same one-step power iteration per call).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from knnsvc_tpu.models.hifigan.layers import conv1d, conv2d, conv_weight, leaky_relu

Params = dict[str, Any]

MPD_PERIODS = (2, 3, 5, 7, 11)
_MPD_CHANNELS = (32, 128, 512, 1024)


def _spectral_norm_weight(p: Params, update: bool):
    """w / sigma, matching torch.nn.utils.spectral_norm: in training
    (update=True) run one power-iteration step on the stored (u, v); in eval
    use them as-is. sigma = u^T W v, eps 1e-12. Returns (w_norm, u, v)."""
    from knnsvc_tpu.precision import get_precision

    w, u, v = p["v_sn"], p["u"], p["v_pow"]
    w_mat = w.reshape(w.shape[0], -1)
    mv = lambda a, b: jnp.matmul(a, b, precision=get_precision())
    if update:
        # power iteration runs without gradient (torch does it under no_grad)
        wm = jax.lax.stop_gradient(w_mat)
        v = mv(wm.T, u)
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = mv(wm, v)
        u = u / (jnp.linalg.norm(u) + 1e-12)
    # sigma keeps the gradient path through w; u, v are constants
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = mv(u, mv(w_mat, v))
    return w / sigma, u, v


def _apply_conv1d_sn(x, p, update, **kw):
    if "v_sn" in p:
        w, u, v = _spectral_norm_weight(p, update)
        q = {"w": w}
        if "b" in p:
            q["b"] = p["b"]
        return conv1d(x, q, **kw), {**p, "u": u, "v_pow": v}
    return conv1d(x, p, **kw), p


def discriminator_p_apply(params: Params, period: int, x: jax.Array,
                          kernel_size: int = 5, stride: int = 3):
    """x (B, 1, T) -> (logits (B, n), feature maps). Ref ddsp_models.py:496-529."""
    B, C, T = x.shape
    if T % period != 0:
        n_pad = period - (T % period)
        x = jnp.concatenate([x, jnp.flip(x[..., -n_pad - 1:-1], -1)], axis=-1)  # reflect pad
        T = T + n_pad
    x = x.reshape(B, C, T // period, period)

    fmap = []
    pad = (5 * 1 - 1) // 2  # get_padding(5, 1)
    for i, c in enumerate(params["convs"]):
        s = (stride, 1) if i < 4 else (1, 1)
        p2 = (pad, 0) if i < 4 else (2, 0)
        x = conv2d(x, c, stride=s, padding=p2)
        x = leaky_relu(x)
        fmap.append(x)
    x = conv2d(x, params["conv_post"], padding=(1, 0))
    fmap.append(x)
    return x.reshape(B, -1), fmap


def mpd_apply(params: Params, y: jax.Array, y_hat: jax.Array):
    """(ref ddsp_models.py:532-556). Returns (y_d_rs, y_d_gs, fmap_rs, fmap_gs)."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for p, period in zip(params["discriminators"], MPD_PERIODS):
        r, fr = discriminator_p_apply(p, period, y)
        g, fg = discriminator_p_apply(p, period, y_hat)
        y_d_rs.append(r)
        y_d_gs.append(g)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


_MSD_SPECS = [
    # (out, k, stride, groups, pad)
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
]


def discriminator_s_apply(params: Params, x: jax.Array, update_sn: bool = False):
    """x (B, 1, T). Ref ddsp_models.py:559-584."""
    fmap = []
    new_convs = []
    for (out, k, s, g, pad), c in zip(_MSD_SPECS, params["convs"]):
        x, c2 = _apply_conv1d_sn(x, c, update_sn, stride=s, padding=pad, groups=g)
        new_convs.append(c2)
        x = leaky_relu(x)
        fmap.append(x)
    x, post2 = _apply_conv1d_sn(x, params["conv_post"], update_sn, padding=1)
    fmap.append(x)
    new_params = {"convs": new_convs, "conv_post": post2}
    return x.reshape(x.shape[0], -1), fmap, new_params


def _avg_pool(x: jax.Array) -> jax.Array:
    """AvgPool1d(4, 2, padding=2) with count_include_pad=True (torch default)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2)))
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, 1, 4), (1, 1, 2), "VALID")
    return s / 4.0


def msd_apply(params: Params, y: jax.Array, y_hat: jax.Array, update_sn: bool = False):
    """(ref ddsp_models.py:587-616). Returns outputs + (optionally updated)
    params with the new spectral-norm u vectors."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    new_discs = []
    for i, p in enumerate(params["discriminators"]):
        if i != 0:
            y = _avg_pool(y)
            y_hat = _avg_pool(y_hat)
        r, fr, p2 = discriminator_s_apply(p, y, update_sn)
        g, fg, _ = discriminator_s_apply(p2, y_hat, update_sn=False)
        new_discs.append(p2)
        y_d_rs.append(r)
        y_d_gs.append(g)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs, {"discriminators": new_discs}


# ------------------------------------------------------------------ init


def init_mpd_params(key: jax.Array, weight_norm_parametrized: bool = True,
                    width_scale: int = 1,
                    n_periods: int | None = None) -> Params:
    """width_scale > 1 shrinks channels (tiny dry-run/test models);
    n_periods < 5 keeps only the first periods (mpd_apply zips the param
    list with MPD_PERIODS, so a shorter list is a smaller topology — used
    by the multichip dryrun to bound CPU compile time)."""
    keys = iter(jax.random.split(key, 128))

    def conv2(out_c, in_c, kh):
        w = jax.random.normal(next(keys), (out_c, in_c, kh, 1)) * 0.02
        if weight_norm_parametrized:
            p = {"v": w, "g": jnp.linalg.norm(w.reshape(out_c, -1), axis=1).reshape(out_c, 1, 1, 1)}
        else:
            p = {"w": w}
        p["b"] = jnp.zeros((out_c,))
        return p

    top = 1024 // width_scale
    chans = [1] + [c // width_scale for c in _MPD_CHANNELS] + [top]
    discs = []
    for _ in MPD_PERIODS[: n_periods if n_periods is not None else len(MPD_PERIODS)]:
        convs = [conv2(chans[i + 1], chans[i], 5) for i in range(4)]
        convs.append(conv2(top, top, 5))
        discs.append({"convs": convs, "conv_post": conv2(1, top, 3)})
    return {"discriminators": discs}


def init_msd_params(key: jax.Array, weight_norm_parametrized: bool = True,
                    width_scale: int = 1,
                    n_scales: int | None = None) -> Params:
    """width_scale must keep channels divisible by the conv groups (<=8 ok);
    n_scales < 3 keeps only the first scales (msd_apply enumerates the param
    list, so a shorter list is a smaller topology)."""
    keys = iter(jax.random.split(key, 128))

    def conv1(out_c, in_c, k, spectral: bool):
        w = jax.random.normal(next(keys), (out_c, in_c, k)) * 0.02
        if spectral:
            u = jax.random.normal(next(keys), (out_c,))
            v = jax.random.normal(next(keys), (in_c * k,))
            p = {"v_sn": w, "u": u / jnp.linalg.norm(u), "v_pow": v / jnp.linalg.norm(v)}
        elif weight_norm_parametrized:
            p = {"v": w, "g": jnp.linalg.norm(w.reshape(out_c, -1), axis=1).reshape(out_c, 1, 1)}
        else:
            p = {"w": w}
        p["b"] = jnp.zeros((out_c,))
        return p

    discs = []
    for d in range(n_scales if n_scales is not None else 3):
        spectral = d == 0  # ref ddsp_models.py:590-594
        in_c = 1
        convs = []
        for (out, k, s, g, pad) in _MSD_SPECS:
            out_s = max(g, out // width_scale)
            convs.append(conv1(out_s, in_c // g, k, spectral))
            in_c = out_s
        discs.append({"convs": convs, "conv_post": conv1(1, in_c, 3, spectral)})
    return {"discriminators": discs}
