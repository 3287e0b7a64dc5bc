"""Shared conv primitives for the vocoder stack.

Weight layout follows torch Conv1d ((out, in/groups, k)) so checkpoints
convert 1:1. Weight-normed convs may appear either folded ({"w"}) for
inference or parametrized ({"g", "v"}) for training; `conv_weight` resolves
both, so the same apply functions serve inference and the GAN trainer.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from knnsvc_tpu.precision import get_precision

Params = dict[str, Any]

LRELU_SLOPE = 0.1  # ref hifigan/ddsp_models.py:10


def conv_weight(p: Params) -> jax.Array:
    """Folded weight, or live weight-norm g*v/||v|| (norm over dims != 0,
    torch weight_norm default dim=0)."""
    if "w" in p:
        return p["w"]
    v = p["v"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(1, v.ndim)), keepdims=True))
    return p["g"] * v / norm


def conv1d(x: jax.Array, p: Params, stride: int = 1, padding: int = 0,
           dilation: int = 1, groups: int = 1) -> jax.Array:
    """x (B, C, T) -> (B, C', T'). Computes in the weight's dtype (the
    mixed-precision compute dtype) with fp32 accumulation, returns the
    weight's dtype — a chain of no-ops on the pure-fp32 path."""
    w = conv_weight(p)
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        # under bf16 the MXU still accumulates fp32 internally; an explicit
        # fp32 preferred_element_type breaks the conv VJP on mixed dtypes
        preferred_element_type=w.dtype,
        precision=get_precision(),
    )
    if "b" in p:
        y = y + p["b"][None, :, None].astype(y.dtype)
    return y.astype(w.dtype)


def conv_transpose1d(x: jax.Array, p: Params, stride: int, padding: int) -> jax.Array:
    """torch ConvTranspose1d(k, stride, padding) semantics: out_len =
    (in-1)*stride - 2*padding + k. Torch weight layout (in, out, k).

    Lowered as one matmul + overlap-add instead of an lhs-dilated conv: the
    dilated form makes the MXU multiply k/stride-times-redundant zeros (10x
    waste at the first HiFi-GAN stage, k=20 s=10). Here each input frame is
    projected to its (out, k) contribution (a single (T, in) x (in, out*k)
    einsum) and the ceil(k/s) overlapping tap groups are summed shifted —
    exact same arithmetic as torch, full MXU utilization."""
    w = conv_weight(p)                       # (in, out, k)
    C_in, C_out, k = w.shape
    B, _, T = x.shape
    n_taps = -(-k // stride)                 # ceil
    k_pad = n_taps * stride
    w_pad = jnp.pad(w, ((0, 0), (0, 0), (0, k_pad - k)))

    # (B, T, in) x (in, out, taps, s) -> (B, taps, out, T, s)
    xt = jnp.swapaxes(x, 1, 2).astype(w.dtype)
    wr = w_pad.reshape(C_in, C_out, n_taps, stride)
    y = jnp.einsum("bti,ioms->bmots", xt, wr,
                   preferred_element_type=jnp.float32, precision=get_precision())
    y = y.reshape(B, n_taps, C_out, T * stride)

    # overlap-add: tap m lands at offset m*stride; static pads fuse (no scatter)
    full_len = (T - 1) * stride + k_pad
    out = None
    for m in range(n_taps):
        shifted = jnp.pad(y[:, m], ((0, 0), (0, 0),
                                    (m * stride, full_len - m * stride - T * stride)))
        out = shifted if out is None else out + shifted

    # crop torch's `padding` from both sides (and the k_pad tail)
    end = (T - 1) * stride + k - padding
    out = out[:, :, padding:end]
    if "b" in p:
        out = out + p["b"][None, :, None].astype(out.dtype)
    return out.astype(w.dtype)


def conv2d(x: jax.Array, p: Params, stride: tuple[int, int] = (1, 1),
           padding: tuple[int, int] = (0, 0)) -> jax.Array:
    """x (B, C, H, W), torch Conv2d layout (out, in, kh, kw)."""
    w = conv_weight(p)
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=w.dtype,
        precision=get_precision(),
    )
    if "b" in p:
        y = y + p["b"][None, :, None, None].astype(y.dtype)
    return y.astype(w.dtype)


def leaky_relu(x: jax.Array, slope: float = LRELU_SLOPE) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    # ref hifigan/utils.py:37-38
    return (kernel_size * dilation - dilation) // 2


def resblock1_apply(x: jax.Array, p: Params, kernel_size: int,
                    dilations: tuple[int, ...]) -> jax.Array:
    """ResBlock1: pairs of (dilated conv, plain conv) with pre-activation
    leaky-relu and residual adds (ref hifigan/ddsp_models.py:13-44)."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = leaky_relu(x)
        xt = conv1d(xt, c1, padding=get_padding(kernel_size, d), dilation=d)
        xt = leaky_relu(xt)
        xt = conv1d(xt, c2, padding=get_padding(kernel_size, 1))
        x = xt + x
    return x


def resblock2_apply(x: jax.Array, p: Params, kernel_size: int,
                    dilations: tuple[int, ...]) -> jax.Array:
    """ResBlock2: dilated convs only (ref hifigan/ddsp_models.py:55-72)."""
    for c, d in zip(p["convs"], dilations):
        xt = leaky_relu(x)
        xt = conv1d(xt, c, padding=get_padding(kernel_size, d), dilation=d)
        x = xt + x
    return x


def resblock3_apply(x: jax.Array, p: Params, kernel_size: int = 3,
                    dilation: int = 1) -> jax.Array:
    """ResBlock3: a single dilated conv (ref hifigan/ddsp_models.py:81-94)."""
    for c in p["convs"]:
        xt = leaky_relu(x)
        xt = conv1d(xt, c, padding=get_padding(kernel_size, dilation), dilation=dilation)
        x = xt + x
    return x
