"""Mesh-sharded kNN over a distributed matching pool.

The reference bounds a single GPU's memory by looping 20 query rows at a time
over the whole pool (ref lib_ongaku_test.py:154-173,
ddsp_prematch_dataset.py:1196-1207). The distributed generalization: shard the
POOL axis across chips; each chip computes cosine distances + a local top-k
against its shard (MXU matmul, no python loop); a single all_gather of
(k per shard) candidates + one final top-k merges them. Queries are
replicated (they are tiny next to an hours-scale pool). Collectives ride ICI.

Padding discipline: the pool is padded to a shard multiple with rows whose
distance is forced to +inf (masked), so padded frames can never be selected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from knnsvc_tpu.match.distance import cosine_distance


def shard_pool(pool, mesh: Mesh):
    """Pad the pool's frame axis to a 'pool'-shard multiple and device_put it
    sharded. Returns (sharded_pool, true_length)."""
    n_shards = mesh.shape["pool"]
    P_len = pool.shape[0]
    pad = (-P_len) % n_shards
    pool_padded = jnp.pad(jnp.asarray(pool), ((0, pad), (0, 0)))
    sharded = jax.device_put(pool_padded, NamedSharding(mesh, P("pool", None)))
    return sharded, P_len


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_knn_topk(query: jax.Array, pool: jax.Array, true_len: jax.Array,
                     mesh: Mesh, k: int = 32) -> tuple[jax.Array, jax.Array]:
    """query (Q, D) replicated; pool (P_padded, D) sharded on 'pool';
    true_len scalar (unpadded pool length).
    Returns (indices (Q, k) into the unpadded pool, distances (Q, k))."""
    n_shards = mesh.shape["pool"]
    shard_len = pool.shape[0] // n_shards
    k_local = min(k, shard_len)   # tiny shards contribute fewer candidates
    assert n_shards * k_local >= k, (n_shards, shard_len, k)
    true_len = jnp.asarray(true_len, dtype=jnp.int32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("pool", None), P()),
        out_specs=(P(), P()),
        # the post-all_gather merge is identical on every shard; the static
        # varying-axes check cannot prove that
        check_vma=False,
    )
    def local_then_merge(q, local_pool, tlen):
        shard_id = jax.lax.axis_index("pool")
        dists = cosine_distance(q, local_pool)                     # (Q, shard_len)
        local_idx = jnp.arange(shard_len) + shard_id * shard_len
        valid = local_idx < tlen
        dists = jnp.where(valid[None, :], dists, jnp.inf)
        neg_vals, idx = jax.lax.top_k(-dists, k_local)             # (Q, k_local)
        global_idx = local_idx[idx]
        # gather candidates from every shard and merge
        all_vals = jax.lax.all_gather(-neg_vals, "pool", axis=0)   # (S, Q, k)
        all_idx = jax.lax.all_gather(global_idx, "pool", axis=0)
        all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(q.shape[0], -1)  # (Q, S*k)
        all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(q.shape[0], -1)
        neg_m, pick = jax.lax.top_k(-all_vals, k)
        return jnp.take_along_axis(all_idx, pick, axis=1).astype(jnp.int32), -neg_m

    return local_then_merge(query, pool, true_len)
