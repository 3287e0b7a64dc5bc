"""Concatenation-cost candidate reselection (the paper's CAT step).

Reference: lib_ongaku_test.py:270-369 (`knn_with_concat_cost`) — a strictly
sequential per-frame greedy pass: frame i's candidate set is its own top-k
plus (previous frame's selection + 1); cost = matching cosine + weighted
torch-median of concatenation cosines to the previous picks (+ |Δlog2 f0| in
pitched mode); take the k cheapest.

TPU redesign: the loop is a `lax.scan` over frames with a fixed-shape body
(2k candidates, k picks) — the only serial dependency the pipeline has.
Throughput comes from batching utterances outside, not from the frame loop.

Replicated quirks (deliberate, for parity):
- torch-median (lower-middle) over the k previous picks.
- pitched mode's *sticky* concat weight: the reference reassigns the Python
  variable `concat_weight = 0` once a frame's source-continuity baseline is
  >= 0.08, silencing the concat term for ALL later frames
  (lib_ongaku_test.py:325-332). Carried through the scan state here.

Streaming: the `*_stream_core` variants take the scan carry EXPLICITLY
(previous frame's selections + the sticky weight) and run every provided
frame through the body — chaining them over consecutive chunks reproduces
the whole-utterance serial pass exactly (chunk N+1's first frame sees chunk
N's last selection, and the sticky latch never resets at a boundary). The
standard cores are expressed through the same body, so the two families
cannot drift apart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from knnsvc_tpu.match.f0_logic import torch_median


def _cos_dist_rows(a: jax.Array, b: jax.Array) -> jax.Array:
    """(A, D) x (B, D) -> (A, B) cosine distances."""
    an = jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = jnp.linalg.norm(b, axis=-1, keepdims=True)
    return 1.0 - (a @ b.T) / (an * bn.T)


def _single_body(gather_rows, pool_limit, pitched: bool, tgt_log_f0,
                 concat_weight: float):
    """Scan body for the single-lane pass. carry = (prev selected ids (k,),
    their pool rows (k, D), sticky weight scalar); per-frame output =
    (new ids, weight after this frame)."""

    def body(carry, inputs):
        prev_idx, prev_feats, weight = carry         # (k,), (k, D), scalar
        own_cand, src_vec, baseline, src_lf0 = inputs

        extra = jnp.minimum(prev_idx + 1, pool_limit - 1)
        cand = jnp.concatenate([own_cand, extra])    # (2k,)
        cand_feats = gather_rows(cand)               # (2k, D)

        matching_cost = _cos_dist_rows(src_vec[None], cand_feats)[0]        # (2k,)
        concat_cost = _cos_dist_rows(prev_feats, cand_feats)                # (k, 2k)

        if pitched:
            pitch_cost = jnp.abs(tgt_log_f0[cand] - src_lf0)                # (2k,)
            low = baseline < 0.08
            concat_cost = jnp.where(
                low & (concat_cost < 5.0 * baseline), 0.0, concat_cost
            )
            weight = jnp.where(low, weight, 0.0)     # sticky zeroing
            total = weight * torch_median(concat_cost, axis=0) + matching_cost + pitch_cost
        else:
            concat_cost = jnp.where(
                concat_cost > baseline, 1.5 * concat_cost - baseline, concat_cost
            )
            total = concat_weight * torch_median(concat_cost, axis=0) + matching_cost

        k = prev_idx.shape[0]
        neg_vals, pick = jax.lax.top_k(-total, k)
        new_idx = cand[pick]
        return (new_idx, cand_feats[pick], weight), (new_idx, weight)

    return body


def concat_cost_core(
    gather_rows,                         # (..,) int32 global ids -> (.., D) pool rows
    target_feature_indices: jax.Array,   # (T, k) int32
    src_elements: jax.Array,             # (T, D)
    pool_limit,                          # last valid pool row + 1 (int or traced)
    shifted_src_f0: jax.Array | None = None,  # (T,) Hz — pitched mode
    tgt_log_f0: jax.Array | None = None,      # (P,) log2(Hz + 1e-5), pitched mode
    concat_weight: float = 0.2,
) -> jax.Array:
    """Gather-parameterized greedy scan: the pool is touched ONLY through
    `gather_rows`, so the same core serves a device-resident pool (plain
    indexing) and a mesh-sharded pool (masked local gather + psum — see
    parallel/sharded_match.py). The previous frame's selected rows ride the
    scan carry, so each step gathers exactly the 2k candidate rows."""
    T, k = target_feature_indices.shape
    pitched = shifted_src_f0 is not None

    if pitched:
        assert tgt_log_f0 is not None
        src_log_f0 = jnp.log2(shifted_src_f0 + 1e-5)
    else:
        src_log_f0 = jnp.zeros((T,))

    # per-frame source continuity baseline: 2 * d(src[i-1], src[i])
    src_n = src_elements / jnp.linalg.norm(src_elements, axis=-1, keepdims=True)
    baselines = 2.0 * (1.0 - jnp.sum(src_n[:-1] * src_n[1:], axis=-1))  # (T-1,)

    body = _single_body(gather_rows, pool_limit, pitched, tgt_log_f0,
                        concat_weight)
    init = (target_feature_indices[0], gather_rows(target_feature_indices[0]),
            jnp.float32(concat_weight))
    xs = (
        target_feature_indices[1:],
        src_elements[1:],
        baselines,
        src_log_f0[1:],
    )
    # unroll amortizes the device loop-control overhead; the recurrence
    # itself (frame t needs frame t-1's picks) is unchanged
    _, (rest, _) = jax.lax.scan(body, init, xs, unroll=8)
    return jnp.concatenate([target_feature_indices[:1], rest], axis=0)


def concat_cost_stream_core(
    gather_rows,
    target_feature_indices: jax.Array,   # (T, k) int32 — ALL frames scanned
    prev_src: jax.Array,                 # (D,) previous frame's source vector
    src_elements: jax.Array,             # (T, D)
    pool_limit,
    prev_idx: jax.Array,                 # (k,) previous frame's selection
    prev_weight: jax.Array,              # scalar sticky weight (pitched mode)
    shifted_src_f0: jax.Array | None = None,
    tgt_log_f0: jax.Array | None = None,
    concat_weight: float = 0.2,
) -> tuple[jax.Array, jax.Array]:
    """Single-lane scan continuing from an explicit carry: every frame of
    `target_feature_indices` goes through the body with frame 0's previous
    state = (prev_idx, prev_weight) and its continuity baseline computed
    against `prev_src`. Returns (selections (T, k), sticky weight AFTER each
    frame (T,)) — chain chunks by feeding frame c's outputs as the next
    chunk's carry."""
    T, k = target_feature_indices.shape
    pitched = shifted_src_f0 is not None
    src_log_f0 = (jnp.log2(shifted_src_f0 + 1e-5) if pitched
                  else jnp.zeros((T,)))

    src_all = jnp.concatenate([prev_src[None], src_elements])          # (T+1, D)
    src_n = src_all / jnp.linalg.norm(src_all, axis=-1, keepdims=True)
    baselines = 2.0 * (1.0 - jnp.sum(src_n[:-1] * src_n[1:], axis=-1))  # (T,)

    body = _single_body(gather_rows, pool_limit, pitched, tgt_log_f0,
                        concat_weight)
    init = (prev_idx, gather_rows(prev_idx),
            jnp.asarray(prev_weight, jnp.float32))
    xs = (target_feature_indices, src_elements, baselines, src_log_f0)
    _, (sel, weights) = jax.lax.scan(body, init, xs, unroll=8)
    return sel, weights


@functools.partial(jax.jit, static_argnames=("concat_weight",))
def knn_with_concat_cost(
    target_feature_indices: jax.Array,   # (T, k) int32
    src_elements: jax.Array,             # (T, D)
    tgt_elements: jax.Array,             # (P, D)
    shifted_src_f0: jax.Array | None = None,  # (T,) Hz — pitched mode
    tgt_f0: jax.Array | None = None,          # (P,) Hz
    concat_weight: float = 0.2,
) -> jax.Array:
    """Returns reselected indices (T, k)."""
    tgt_log_f0 = None if tgt_f0 is None else jnp.log2(tgt_f0 + 1e-5)
    return concat_cost_core(
        lambda idx: tgt_elements[idx], target_feature_indices, src_elements,
        tgt_elements.shape[0], shifted_src_f0, tgt_log_f0, concat_weight)


def _pair_body(gather_rows, pool_limit, tgt_log_f0, concat_weight: float):
    """Scan body for the lane-stacked pair pass (lane 0 = unpitched, lane 1
    = pitched; the sticky weight belongs to lane 1). Per-frame output =
    (new ids (2, k), weight after this frame)."""

    def body(carry, inputs):
        prev_idx, prev_feats, p_weight = carry         # (2, k), (2, k, D), scalar
        own_cand, src_vec, baseline, src_lf0 = inputs  # (2, k), (D,), (), ()

        k = prev_idx.shape[1]
        extra = jnp.minimum(prev_idx + 1, pool_limit - 1)
        cand = jnp.concatenate([own_cand, extra], axis=1)       # (2, 2k)
        cand_feats = gather_rows(cand)                           # (2, 2k, D)

        cn = jnp.linalg.norm(cand_feats, axis=-1)                # (2, 2k)
        sv = src_vec / jnp.linalg.norm(src_vec)
        matching_cost = 1.0 - (cand_feats @ sv) / cn             # (2, 2k)
        pn = jnp.linalg.norm(prev_feats, axis=-1)                # (2, k)
        cc = 1.0 - jnp.einsum("lkd,lcd->lkc", prev_feats, cand_feats) / (
            pn[:, :, None] * cn[:, None, :])                     # (2, k, 2k)

        # lane 0: unpitched sharpening transform
        cc_u = jnp.where(cc[0] > baseline, 1.5 * cc[0] - baseline, cc[0])
        total_u = concat_weight * torch_median(cc_u, axis=0) + matching_cost[0]

        # lane 1: pitched zeroing + sticky weight + |dlog2 f0|
        low = baseline < 0.08
        cc_p = jnp.where(low & (cc[1] < 5.0 * baseline), 0.0, cc[1])
        p_weight = jnp.where(low, p_weight, 0.0)
        pitch_cost = jnp.abs(tgt_log_f0[cand[1]] - src_lf0)
        total_p = p_weight * torch_median(cc_p, axis=0) + matching_cost[1] + pitch_cost

        total = jnp.stack([total_u, total_p])                    # (2, 2k)
        _, pick = jax.lax.top_k(-total, k)                       # (2, k)
        new_idx = jnp.take_along_axis(cand, pick, axis=1)
        new_feats = jnp.take_along_axis(cand_feats, pick[..., None], axis=1)
        return (new_idx, new_feats, p_weight), (new_idx, p_weight)

    return body


def concat_cost_pair_core(
    gather_rows,                # (..,) int32 global ids -> (.., D) pool rows
    idx_unpitched: jax.Array,   # (T, k) int32 — top-k of the raw kNN
    idx_pitched: jax.Array,     # (T, k) int32 — f0-prioritized selection
    src_elements: jax.Array,    # (T, D)
    pool_limit,                 # last valid pool row + 1 (int or traced)
    shifted_src_f0: jax.Array,  # (T,) Hz
    tgt_log_f0: jax.Array,      # (P,) log2(Hz + 1e-5)
    concat_weight: float = 0.2,
) -> tuple[jax.Array, jax.Array]:
    """Both concat-cost reselections of the post_opt pipeline in ONE scan,
    gather-parameterized like `concat_cost_core` (the pool is read only via
    `gather_rows`; previous picks' rows ride the carry)."""
    T, k = idx_unpitched.shape

    src_log_f0 = jnp.log2(shifted_src_f0 + 1e-5)

    src_n = src_elements / jnp.linalg.norm(src_elements, axis=-1, keepdims=True)
    baselines = 2.0 * (1.0 - jnp.sum(src_n[:-1] * src_n[1:], axis=-1))  # (T-1,)

    body = _pair_body(gather_rows, pool_limit, tgt_log_f0, concat_weight)
    stacked = jnp.stack([idx_unpitched, idx_pitched], axis=1)    # (T, 2, k)
    init = (stacked[0], gather_rows(stacked[0]), jnp.float32(concat_weight))
    xs = (stacked[1:], src_elements[1:], baselines, src_log_f0[1:])
    _, (rest, _) = jax.lax.scan(body, init, xs, unroll=8)
    out = jnp.concatenate([stacked[:1], rest], axis=0)           # (T, 2, k)
    return out[:, 0], out[:, 1]


def concat_cost_pair_stream_core(
    gather_rows,
    idx_unpitched: jax.Array,   # (T, k) int32 — ALL frames scanned
    idx_pitched: jax.Array,     # (T, k) int32
    prev_src: jax.Array,        # (D,) previous frame's source vector
    src_elements: jax.Array,    # (T, D)
    pool_limit,
    shifted_src_f0: jax.Array,  # (T,) Hz
    tgt_log_f0: jax.Array,      # (P,) log2(Hz + 1e-5)
    prev_idx: jax.Array,        # (2, k) previous frame's selections
    prev_weight: jax.Array,     # scalar sticky weight after that frame
    concat_weight: float = 0.2,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Lane-stacked pair scan continuing from an explicit carry (see
    `concat_cost_stream_core`). Returns (unpitched (T, k), pitched (T, k),
    sticky weight AFTER each frame (T,))."""
    src_log_f0 = jnp.log2(shifted_src_f0 + 1e-5)

    src_all = jnp.concatenate([prev_src[None], src_elements])           # (T+1, D)
    src_n = src_all / jnp.linalg.norm(src_all, axis=-1, keepdims=True)
    baselines = 2.0 * (1.0 - jnp.sum(src_n[:-1] * src_n[1:], axis=-1))   # (T,)

    body = _pair_body(gather_rows, pool_limit, tgt_log_f0, concat_weight)
    stacked = jnp.stack([idx_unpitched, idx_pitched], axis=1)            # (T, 2, k)
    init = (prev_idx, gather_rows(prev_idx),
            jnp.asarray(prev_weight, jnp.float32))
    xs = (stacked, src_elements, baselines, src_log_f0)
    _, (sel, weights) = jax.lax.scan(body, init, xs, unroll=8)
    return sel[:, 0], sel[:, 1], weights


@functools.partial(jax.jit, static_argnames=("concat_weight",))
def knn_with_concat_cost_pair(
    idx_unpitched: jax.Array,   # (T, k) int32 — top-k of the raw kNN
    idx_pitched: jax.Array,     # (T, k) int32 — f0-prioritized selection
    src_elements: jax.Array,    # (T, D)
    tgt_elements: jax.Array,    # (P, D)
    shifted_src_f0: jax.Array,  # (T,) Hz
    tgt_f0: jax.Array,          # (P,) Hz
    concat_weight: float = 0.2,
) -> tuple[jax.Array, jax.Array]:
    """Both concat-cost reselections of the post_opt pipeline in ONE scan.

    The unpitched pass (WavLM features) and the pitched pass (harmonic
    selection) are independent — the reference just runs them sequentially
    (ref ddsp_prematch_dataset.py:1292-1295 then :1409-1414). The frame loop
    is the pipeline's only serial dependency and its cost is per-step
    overhead, not FLOPs, so lane-stacking the two passes halves wall time.
    Bit-identical to two `knn_with_concat_cost` calls (tested)."""
    return concat_cost_pair_core(
        lambda idx: tgt_elements[idx], idx_unpitched, idx_pitched,
        src_elements, tgt_elements.shape[0], shifted_src_f0,
        jnp.log2(tgt_f0 + 1e-5), concat_weight)
