"""Cosine-distance kernels.

The reference computes 1 - cos via the cdist identity
(-||a-b||^2 + ||a||^2 + ||b||^2)/2 (ref lib_ongaku_test.py:148-175,
ddsp_matcher.py:213-221). On TPU a direct normalized dot-product is both
better-conditioned and MXU-native (one einsum), so that is the primary kernel;
the row-chunking the reference needs to bound GPU memory (increment=20) is
replaced by XLA tiling / explicit query-chunked scan in match/knn.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from knnsvc_tpu.precision import get_precision


def cosine_distance(source: jax.Array, pool: jax.Array, eps: float = 0.0) -> jax.Array:
    """1 - cosine similarity. source (Q, D), pool (P, D) -> (Q, P).

    Zero-norm rows (digital silence, VAD-trimmed edges, pool padding) get the
    maximum distance 2.0 instead of NaN, so they can never poison top-k. The
    reference merely *detects* NaN and aborts (lib_ongaku_test.py:166-169);
    producing a finite worst-case distance is strictly safer.
    """
    src_norm = jnp.linalg.norm(source, axis=-1, keepdims=True)
    pool_norm = jnp.linalg.norm(pool, axis=-1, keepdims=True)
    dot = jnp.dot(source, pool.T, preferred_element_type=jnp.float32, precision=get_precision())
    denom = src_norm * pool_norm.T + eps
    cos = jnp.where(denom > 0.0, dot / jnp.where(denom > 0.0, denom, 1.0), -1.0)
    # NaN *inputs* (corrupt features) would sail through the dot; clamp them
    # to the worst distance so they cannot win top-k either (the reference's
    # NaN check aborts the run instead — lib_ongaku_test.py:166-169). XLA
    # fuses the elementwise clamp into the surrounding computation.
    dist = 1.0 - cos
    return jnp.where(jnp.isnan(dist), 2.0, dist)


def weighted_cosine_distance(source: jax.Array, pool: jax.Array,
                             weights: jax.Array | None = None) -> jax.Array:
    """Per-source-row feature weighting (ref ddsp_matcher.py:225-269
    fast_weighted_cosine_dist): for pair (i, j),
    1 - <w_i*x_i, y_j> / (||w_i*x_i|| * ||w_i*y_j||)."""
    if weights is None:
        return cosine_distance(source, pool)
    ws = source * weights                                  # (Q, D)
    src_norm = jnp.linalg.norm(ws, axis=-1)                # (Q,)
    dot = jnp.dot(ws, pool.T, preferred_element_type=jnp.float32, precision=get_precision())  # (Q, P)
    # ||w_i * y_j|| for every pair — one einsum instead of the reference's
    # python-chunked (Q,P,D) materialization (ddsp_matcher.py:251-257)
    pool_norms_sq = jnp.dot(weights ** 2, (pool ** 2).T,
                            preferred_element_type=jnp.float32,
                            precision=get_precision())             # (Q, P)
    denom = src_norm[:, None] * jnp.sqrt(pool_norms_sq)
    cos = jnp.where(denom > 0.0, dot / jnp.where(denom > 0.0, denom, 1.0), -1.0)
    dist = 1.0 - cos
    # NaN-input clamp, same rationale as cosine_distance above.
    return jnp.where(jnp.isnan(dist), 2.0, dist)
