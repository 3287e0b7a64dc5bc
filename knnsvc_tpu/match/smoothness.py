"""Concatenation-smoothness weight optimization (the paper's OPT step).

Reference: four near-identical Adam loops (`compute_weight`,
`compute_wavlm_weight`, `compute_weight_with_amp`, `compute_extended_weight`
— ddsp_prematch_dataset.py:465-925) that learn per-frame convex weights over
the k selected neighbors to maximize temporal smoothness of the weighted
synthesis vectors.

Unified here as ONE jitted `lax.while_loop` with Adam+AMSGrad implemented
in-line (lr 1e-1, betas (0.9, 0.999), eps 1e-8 — ref :490-493) and the exact
reference early-stopping bookkeeping:

- loss is evaluated BEFORE the step; best params track the pre-step params
  (ref :504-561 loop ordering);
- plateau break every 100 steps when the best loss moved < 1e-5 (first check
  at t==1 — ref :535-540);
- break after 1000 consecutive non-improving steps (ref :500,548-554);
- hard cap 100000 steps (ref :504).

Differences from the reference (documented divergence):
- `compute_extended_weight`'s tanh scaling factors are hard-clamped to
  [1, 1] in the reference (:836-837), making them a constant 1 with zero
  gradient — so it reduces exactly to `compute_weight`; not replicated as a
  separate code path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

WAVLM_LOSS_SCALE = 0.1     # ref :460-461 (wavlm_phase_mae)
HARMONICS_LOSS_SCALE = 1e3  # ref :449-457 (phase_mae)

_LR = 1e-1
_B1, _B2, _EPS = 0.9, 0.999, 1e-8
_MAX_STEPS = 100_000
_PLATEAU_EVERY = 100
_PLATEAU_TOL = 1e-5
_FAIL_LIMIT = 1000


class _OptState(NamedTuple):
    t: jax.Array
    w: jax.Array            # weight_para (T, k)
    m: jax.Array
    v: jax.Array
    vhat: jax.Array         # AMSGrad running max of v
    min_loss: jax.Array
    converge_min_loss: jax.Array
    best_w: jax.Array
    fail_streak: jax.Array
    done: jax.Array


def _gather_surrounding(indices: jax.Array, synth_set: jax.Array,
                        amp_ratio: jax.Array | None) -> jax.Array:
    """(T, k) indices -> (3, T, k, D) features at index offsets (-1, 0, +1),
    clipped to the pool (ref :477-485)."""
    P = synth_set.shape[0]
    offs = jnp.array([-1, 0, 1])
    idx = jnp.clip(indices[None] + offs[:, None, None], 0, P - 1)  # (3, T, k)
    feats = synth_set[idx]                                          # (3, T, k, D)
    if amp_ratio is not None:
        feats = feats * amp_ratio[None, :, :, None]
    return feats


def _loss_fn(w: jax.Array, surrounding: jax.Array, scale: float) -> jax.Array:
    """Smoothness loss (ref :504-527): for offsets i in {-1, +1},
    mean over frames of scale * row-mean MSE between the weighted vector at
    offset i (time-shifted by i) and at offset 0."""
    probs = jax.nn.softmax(w, axis=1)                               # (T, k)
    # k-unrolled fused multiply-adds: the einsum ("otkd,tk->otd") lowers to
    # a gather-heavy layout that runs 2x slower on v5e (measured 0.75 vs
    # 0.38 ms/step at T=1500, D=1024); same sum, reassociated
    k = surrounding.shape[2]
    expected = sum(surrounding[:, :, i, :] * probs[None, :, i, None]
                   for i in range(k))                               # (3, T, D)
    e_m1, e_0, e_p1 = expected[0], expected[1], expected[2]

    def phase_mae(a, b):
        return scale * jnp.mean((a - b) ** 2, axis=-1)

    term_m1 = jnp.mean(phase_mae(e_m1[1:], e_0[:-1]))
    term_p1 = jnp.mean(phase_mae(e_0[1:], e_p1[:-1]))
    return term_m1 + term_p1


@functools.partial(jax.jit, static_argnames=("scale", "max_steps", "return_steps", "unroll"))
def optimize_smoothness_weights(
    indices: jax.Array,                  # (T, k) int32
    synth_set: jax.Array,                # (P, D)
    scale: float = WAVLM_LOSS_SCALE,
    amp_ratio: jax.Array | None = None,  # (T, k) — training-time variant
    max_steps: int = _MAX_STEPS,
    return_steps: bool = False,
    unroll: int = 8,
) -> jax.Array:
    """Returns the optimized convex weights (T, k) (softmax-processed,
    'sum_to_1_geq' — ref :426-428). return_steps=True additionally returns
    the executed iteration count (profiling/diagnostics).

    unroll: Adam steps per while_loop iteration. The loop's cost at small D
    is the fixed per-iteration overhead of the device while_loop (~80 us/iter
    measured on v5e through the axon tunnel), so unrolling amortizes it.
    Semantics are identical to unroll=1 — same per-step bookkeeping and step
    counts; once early stopping sets `done` (or t reaches max_steps) the
    state is frozen through the remaining inner steps. Weights can differ
    from unroll=1 in the last float bits (XLA fuses the unrolled body
    differently)."""
    surrounding = _gather_surrounding(indices, synth_set, amp_ratio)
    return optimize_smoothness_from_surrounding(
        surrounding, scale, max_steps=max_steps, return_steps=return_steps,
        unroll=unroll)


def optimize_smoothness_from_surrounding(
    surrounding: jax.Array,              # (3, T, k, D) pre-gathered features
    scale: float,
    max_steps: int = _MAX_STEPS,
    return_steps: bool = False,
    unroll: int = 8,
) -> jax.Array:
    """The Adam loop on pre-gathered surrounding features. Split out so a
    mesh-sharded synth pool can gather the (3, T, k) candidate rows across
    shards once (parallel/sharded_match.py) and reuse the identical
    optimizer; `optimize_smoothness_weights` == dense gather + this."""
    loss_and_grad = jax.value_and_grad(_loss_fn)

    w0 = jnp.zeros(surrounding.shape[1:3], dtype=jnp.float32)
    init = _OptState(
        t=jnp.int32(0),
        w=w0, m=jnp.zeros_like(w0), v=jnp.zeros_like(w0), vhat=jnp.zeros_like(w0),
        min_loss=jnp.float32(20000.0), converge_min_loss=jnp.float32(20000.0),
        best_w=w0, fail_streak=jnp.int32(0), done=jnp.bool_(False),
    )

    def cond(s: _OptState):
        return (~s.done) & (s.t < max_steps)

    def body(s: _OptState):
        loss, grad = loss_and_grad(s.w, surrounding, scale)

        # plateau check (every 100 steps, at t % 100 == 1)
        at_check = (s.t % _PLATEAU_EVERY) == 1
        plateau = at_check & (jnp.abs(s.min_loss - s.converge_min_loss) < _PLATEAU_TOL)
        converge_min_loss = jnp.where(at_check, s.min_loss, s.converge_min_loss)

        improved = loss < s.min_loss
        min_loss = jnp.where(improved, loss, s.min_loss)
        best_w = jnp.where(improved, s.w, s.best_w)
        fail_streak = jnp.where(improved, 0, s.fail_streak + 1)
        exhausted = fail_streak >= _FAIL_LIMIT
        done = plateau | exhausted

        # Adam + AMSGrad step (applied after bookkeeping, as in the reference)
        t1 = s.t + 1
        m = _B1 * s.m + (1 - _B1) * grad
        v = _B2 * s.v + (1 - _B2) * grad ** 2
        vhat = jnp.maximum(s.vhat, v)
        m_hat = m / (1 - _B1 ** t1.astype(jnp.float32))
        v_hat = vhat / (1 - _B2 ** t1.astype(jnp.float32))
        w = s.w - _LR * m_hat / (jnp.sqrt(v_hat) + _EPS)

        return _OptState(t1, w, m, v, vhat, min_loss, converge_min_loss,
                         best_w, fail_streak, done)

    def frozen_body(s: _OptState):
        active = (~s.done) & (s.t < max_steps)
        s2 = body(s)
        return jax.tree.map(lambda new, old: jnp.where(active, new, old), s2, s)

    def block_body(s: _OptState):
        for _ in range(unroll):
            s = frozen_body(s)
        return s

    final = jax.lax.while_loop(cond, block_body if unroll > 1 else body, init)
    weights = jax.nn.softmax(final.best_w, axis=1)
    if return_steps:
        return weights, final.t
    return weights
