"""k-nearest-neighbor search over the target frame pool.

The reference loops 20 query rows at a time over the full pool and topk's
each chunk (ref ddsp_prematch_dataset.py:1195-1210, lib_ongaku_test.py:148-175).
TPU-first: one (Q, P, D) einsum on the MXU with lax.top_k, query-chunked with
lax.map only when the distance matrix would not fit; pool-sharded multi-chip
search lives in parallel/sharded_knn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from knnsvc_tpu.match.distance import cosine_distance

# keep the materialized (q_chunk, P) distance tile under ~256 MB fp32
_MAX_TILE_ELEMS = 64 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def knn_topk(query: jax.Array, pool: jax.Array, k: int = 32,
             approx: bool = False) -> tuple[jax.Array, jax.Array]:
    """Top-k smallest cosine distances. query (Q, D), pool (P, D) ->
    (indices (Q, k) int32, distances (Q, k)) both ascending by distance.

    approx=True uses the TPU-native aggregated top-k (lax.approx_min_k,
    recall 0.99) — ~4x faster at hours-scale pools because the (Q, P)
    distance matrix never takes the full-sort HBM round trips; exact
    (default) matches the reference's topk semantics for parity."""
    Q, _ = query.shape
    P = pool.shape[0]
    k = min(k, P)  # tiny pools (aggressive duration_limit) have < k rows

    def tile_topk(dists):
        if approx:
            vals, idx = jax.lax.approx_min_k(dists, k, recall_target=0.99)
            return idx.astype(jnp.int32), vals
        neg_vals, idx = jax.lax.top_k(-dists, k)
        return idx.astype(jnp.int32), -neg_vals

    q_chunk = max(1, _MAX_TILE_ELEMS // max(P, 1))
    if Q <= q_chunk:
        return tile_topk(cosine_distance(query, pool))

    # pad Q to a chunk multiple and scan chunks (bounded memory, full MXU tiles)
    n_chunks = -(-Q // q_chunk)
    pad = n_chunks * q_chunk - Q
    qp = jnp.pad(query, ((0, pad), (0, 0)))

    def chunk_fn(qc):
        return tile_topk(cosine_distance(qc, pool))

    idx, vals = jax.lax.map(chunk_fn, qp.reshape(n_chunks, q_chunk, -1))
    return idx.reshape(-1, k)[:Q], vals.reshape(-1, k)[:Q]


def knn_cosine_similarity(src_elements, tgt_elements, retain_mask=None, k: int = 32):
    """fp16-rounded kNN with an optional retain mask (ref lib_ongaku_test.py:
    182-196): inputs rounded through half precision, masked-out pairs get
    +1 added to their distance. Returns (indices, distances)."""
    src = jnp.asarray(src_elements).astype(jnp.float16).astype(jnp.float32)
    tgt = jnp.asarray(tgt_elements).astype(jnp.float16).astype(jnp.float32)
    dists = cosine_distance(src, tgt)
    if retain_mask is not None:
        dists = dists + (1.0 - jnp.asarray(retain_mask, dtype=dists.dtype))
    neg_vals, idx = jax.lax.top_k(-dists, k)
    return idx.astype(jnp.int32), -neg_vals
