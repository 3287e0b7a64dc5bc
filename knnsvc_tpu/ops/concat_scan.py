"""Pallas TPU kernel for the concat-cost reselection frame loop.

The concat-cost pass (match/concat_cost.py, ref lib_ongaku_test.py:270-369)
is the pipeline's only strictly serial stage: frame t's candidate set
contains (frame t-1's picks + 1). This kernel keeps the ENTIRE target pool
and the normalized source in VMEM and runs the recurrence as an in-kernel
`fori_loop` (24 row gathers + two small MXU dots per frame).

MEASURED OUTCOME (v5e, T=P=1500, D=1024): 39.5 ms vs 40.5 ms for the
`lax.scan(unroll=8)` pair — a tie. The recurrence is latency-bound on the
serial dependency chain (gathers -> dots -> argmin picks -> next frame), not
on loop control, so hand-scheduling buys nothing over XLA here. Kept as an
opt-in (KNNSVC_PALLAS_CONCAT=1) reference implementation + an exactness
test; the production path uses the scan.

Both post_opt reselections (unpitched lane 0 / pitched lane 1) run
lane-stacked, like match/concat_cost.knn_with_concat_cost_pair — and the
kernel reproduces its selection semantics exactly (same candidate order,
same torch-median, same sticky pitched weight; equality-tested in
tests/test_ops.py).

Shapes are specialized to k=4 (the reference's live top-k,
ddsp_prematch_dataset.py:1246). VMEM budget: (T + P) rows of D floats must
fit beside the scratch — callers gate on `pallas_concat_pair_ok`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 4            # picks per lane (reference live value)
C = 2 * K        # candidates per lane per frame
LANES = 2        # unpitched / pitched

_VMEM_BUDGET_BYTES = 13 * 2 ** 20


def pallas_concat_pair_ok(T: int, P: int, D: int, k: int) -> bool:
    if k != K:
        return False
    rows = (
        (T + P) * D * 4              # source + target pools
        + (T + P) * 128 * 4          # padded scalar tracks
        + (LANES * C + LANES * K) * D * 4  # cand_mat/prev_mat scratch
        + 2 * T * LANES * K * 4      # idx_ref + out_ref
    )
    if rows > _VMEM_BUDGET_BYTES:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _median4(x: jax.Array) -> jax.Array:
    """torch-median (lower middle = 2nd smallest) over axis 0 of (4, ...)."""
    a, b, c, d = x[0], x[1], x[2], x[3]
    s1, l1 = jnp.minimum(a, b), jnp.maximum(a, b)
    s2, l2 = jnp.minimum(c, d), jnp.maximum(c, d)
    return jnp.minimum(jnp.maximum(s1, s2), jnp.minimum(l1, l2))


def _kernel(idx_ref, svn_ref, tgt_ref, scal_ref, tlf0_ref, out_ref,
            cand_mat, prev_mat, *, T: int, P: int, concat_weight: float):
    """Refs:
    idx_ref  (T, LANES*K) int32   initial per-lane candidate sets
    svn_ref  (T, D)       f32     row-normalized source features
    tgt_ref  (P, D)       f32     target pool
    scal_ref (T, 128)     f32     [:,0]=baseline(t), [:,1]=src log2 f0
    tlf0_ref (P, 128)     f32     [:,0]=target log2 f0
    out_ref  (T, LANES*K) int32
    cand_mat (LANES*C, D) f32 scratch
    prev_mat (LANES*K, D) f32 scratch
    """
    out_ref[0, :] = idx_ref[0, :]

    def step(t, weight):
        prev = out_ref[t - 1, :]                     # (8,) int32 lanes*k
        own = idx_ref[t, :]                          # (8,)
        extra = jnp.minimum(prev + 1, P - 1)
        # candidate layout: [lane0 own(4), lane0 extra(4), lane1 own(4), lane1 extra(4)]
        cand = jnp.concatenate([own[:K], extra[:K], own[K:], extra[K:]])  # (16,)

        for r in range(LANES * C):
            cand_mat[r, :] = tgt_ref[cand[r], :]
        for r in range(LANES * K):
            prev_mat[r, :] = tgt_ref[prev[r], :]

        cn = jnp.sqrt(jnp.sum(cand_mat[:] * cand_mat[:], axis=1))         # (16,)
        pn = jnp.sqrt(jnp.sum(prev_mat[:] * prev_mat[:], axis=1))         # (8,)

        sv = svn_ref[t, :]                                                # (D,)
        dots = jnp.dot(cand_mat[:], sv, preferred_element_type=jnp.float32)
        matching = 1.0 - dots / cn                                        # (16,)

        cross = jax.lax.dot_general(
            prev_mat[:], cand_mat[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                           # (8, 16)
        cc = 1.0 - cross / (pn[:, None] * cn[None, :])

        baseline = scal_ref[t, 0]
        src_lf0 = scal_ref[t, 1]

        # lane 0 (unpitched): rows 0:4 of cc vs cols 0:8
        cc_u = cc[0:K, 0:C]
        cc_u = jnp.where(cc_u > baseline, 1.5 * cc_u - baseline, cc_u)
        total_u = concat_weight * _median4(cc_u) + matching[0:C]          # (8,)

        # lane 1 (pitched): rows 4:8 vs cols 8:16; sticky weight
        low = baseline < 0.08
        cc_p = cc[K:, C:]
        cc_p = jnp.where(low & (cc_p < 5.0 * baseline), 0.0, cc_p)
        weight = jnp.where(low, weight, 0.0)
        cand_p = cand[C:]
        # scalar-indexed gathers assembled by mask-select: mosaic lowers
        # neither vector-indexed ref loads nor stack-of-scalars
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        pitch = jnp.zeros((1, C), jnp.float32)
        for r in range(C):
            pitch = jnp.where(iota_c == r, tlf0_ref[cand_p[r], 0], pitch)
        pitch = jnp.abs(pitch[0] - src_lf0)                               # (8,)
        total_p = weight * _median4(cc_p) + matching[C:] + pitch

        # top-4 smallest per lane == lax.top_k(-total, 4) ordering
        # (iterative argmin with mask-out; ties resolve to the lowest index
        # in both). Selected values land in (1, K) slots by mask-select —
        # no scatter, no dynamic vector index, no scalar VMEM stores.
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

        def pick4(total, cand_vec):
            total2 = total.reshape(1, C)
            cand2 = cand_vec.reshape(1, C)
            sel = jnp.zeros((1, K), jnp.int32)
            for s in range(K):
                j = jnp.argmin(total2, axis=1)[0]
                hit = iota_c == j
                val = jnp.sum(jnp.where(hit, cand2, 0))
                sel = jnp.where(slot_iota == s, val, sel)
                total2 = jnp.where(hit, jnp.inf, total2)
            return sel

        new = jnp.concatenate([pick4(total_u, cand[0:C]),
                               pick4(total_p, cand_p)], axis=1)           # (1, 8)
        out_ref[t, :] = new[0]
        return weight

    jax.lax.fori_loop(1, T, step, jnp.float32(concat_weight))


@functools.partial(jax.jit, static_argnames=("concat_weight", "interpret"))
def concat_cost_pair_pallas(
    idx_unpitched: jax.Array,   # (T, K) int32
    idx_pitched: jax.Array,     # (T, K) int32
    src_elements: jax.Array,    # (T, D) f32
    tgt_elements: jax.Array,    # (P, D) f32
    shifted_src_f0: jax.Array,  # (T,) Hz
    tgt_f0: jax.Array,          # (P,) Hz
    concat_weight: float = 0.2,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for match.concat_cost.knn_with_concat_cost_pair (k=4)."""
    T, k = idx_unpitched.shape
    assert k == K, "pallas kernel is specialized to k=4"
    P, D = tgt_elements.shape

    svn = src_elements / jnp.linalg.norm(src_elements, axis=-1, keepdims=True)
    baselines = 2.0 * (1.0 - jnp.sum(svn[:-1] * svn[1:], axis=-1))
    scal = jnp.zeros((T, 128), jnp.float32)
    scal = scal.at[1:, 0].set(baselines)
    scal = scal.at[:, 1].set(jnp.log2(shifted_src_f0 + 1e-5))
    tlf0 = jnp.zeros((P, 128), jnp.float32)
    tlf0 = tlf0.at[:, 0].set(jnp.log2(tgt_f0 + 1e-5))

    stacked = jnp.concatenate([idx_unpitched, idx_pitched], axis=1)  # (T, 8)

    out = pl.pallas_call(
        functools.partial(_kernel, T=T, P=P, concat_weight=concat_weight),
        out_shape=jax.ShapeDtypeStruct((T, LANES * K), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # idx
            pl.BlockSpec(memory_space=pltpu.VMEM),  # svn
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tgt
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scal
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tlf0
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((LANES * C, D), jnp.float32),
            pltpu.VMEM((LANES * K, D), jnp.float32),
        ],
        interpret=interpret,
    )(stacked.astype(jnp.int32), svn, tgt_elements, scal, tlf0)

    return out[:, :K], out[:, K:]
