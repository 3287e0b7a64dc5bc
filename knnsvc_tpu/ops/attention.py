"""Pallas TPU kernel: fused self-attention with gated relative-position bias.

WavLM's attention adds a per-layer *gated* T5 bias to the logits
(ref wavlm/modules.py:520-535). The XLA path materializes three (H, T, T)
tensors per layer in HBM (logits, gated bias, probabilities) — ~145 MB each
at T=1504 — making the encoder HBM-bound. This kernel keeps everything for
one (head, query-tile) on-chip: with head_dim 64 and T <= ~4k, K, V and a
full (BQ, T) score row fit comfortably in VMEM, so a single-pass softmax
(no online/flash accumulation needed) computes

    out = softmax(q k^T * scale + gate * bias) v

with zero HBM traffic for intermediates. Bias is read tile-wise from the
cached (H, T, T) table; the per-query gate (gru_rel_pos) is fused as a
row-broadcast multiply.

Padding contract: caller pads T to the query-block multiple and sets bias
columns of padded keys to a large negative value (so they vanish in the
softmax); padded query rows are sliced off by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, kmask_ref, out_ref, *, scale):
    q = q_ref[0]                      # (BQ, d)
    k = k_ref[0]                      # (T, d)
    v = v_ref[0]                      # (T, d)
    bias = bias_ref[0]                # (BQ, T)
    gate = gate_ref[0]                # (BQ, 1) — broadcast over keys
    kmask = kmask_ref[0]              # (1, T): 0 real keys, -inf-ish padded

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    # key-padding mask is ADDITIVE and applied after the gate multiply — a
    # zero/negative gate must not be able to revive a padded key
    s = s + gate * bias + kmask

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = (o / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def gated_bias_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         bias: jax.Array, gate: jax.Array,
                         block_q: int = DEFAULT_BLOCK_Q,
                         interpret: bool = False) -> jax.Array:
    """q, k, v: (H, T, d); bias: (H, T, T); gate: (H, T) per-query scale of the
    bias. q must arrive pre-scaled=False — scaling (1/sqrt(d)) happens inside.
    Returns (H, T, d) fp32. T is padded internally to a block_q multiple;
    padded keys are excluded by an additive mask (gate-independent — a zero
    or negative trained gate must not be able to revive a padded key)."""
    H, T, d = q.shape
    pad = (-T) % block_q
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
        gate = jnp.pad(gate, ((0, 0), (0, pad)), constant_values=1.0)
    Tp = T + pad
    scale = d ** -0.5
    kmask = jnp.where(jnp.arange(Tp) < T, 0.0, -1e9).astype(jnp.float32)
    kmask = jnp.broadcast_to(kmask[None, None, :], (H, 1, Tp))

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(H, Tp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, Tp), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Tp, d), jnp.float32),
        interpret=interpret,
    )(q, k, v, bias, gate[..., None], kmask)
    return out[:, :T, :]


def reference_attention(q, k, v, bias, gate):
    """Pure-jnp oracle with identical semantics (for tests)."""
    d = q.shape[-1]
    s = jnp.einsum("htd,hsd->hts", q, k) * (d ** -0.5)
    s = s + gate[..., None] * bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hts,hsd->htd", p, v)
