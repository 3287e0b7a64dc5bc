"""f0 register shifting and f0-compatibility re-ranking.

Torch-median semantics matter here: torch.median returns the LOWER of the two
middle elements for even counts (unlike numpy's mean-of-middles); the
reference's register shift and concat-cost both depend on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def torch_median(x: jax.Array, axis: int = -1) -> jax.Array:
    """torch.median along an axis: sorted[(n-1)//2]."""
    s = jnp.sort(x, axis=axis)
    idx = (x.shape[axis] - 1) // 2
    return jnp.take(s, idx, axis=axis)


def masked_log_median(f0: jax.Array) -> jax.Array:
    """torch.median(torch.log(f0[f0 != 0])) under jit: masked sort with +inf
    padding and a dynamic middle index (ref ddsp_prematch_dataset.py:1224-1225)."""
    mask = f0 != 0
    n = jnp.sum(mask)
    vals = jnp.where(mask, jnp.log(jnp.where(mask, f0, 1.0)), jnp.inf)
    s = jnp.sort(vals)
    idx = jnp.maximum(n - 1, 0) // 2
    return s[idx]


@jax.jit
def _shift_f0_impl(query_f0: jax.Array, matching_f0: jax.Array,
                   src_log_median: jax.Array) -> jax.Array:
    src_med = jnp.where(jnp.isnan(src_log_median),
                        masked_log_median(query_f0), src_log_median)
    tgt_med = masked_log_median(matching_f0)
    # fully-unvoiced tracks give +inf medians (the reference's torch.median on
    # an empty tensor errors out instead); degrade to a zero shift rather
    # than emitting inf/NaN f0
    delta = tgt_med - src_med
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
    shifted = jnp.exp(jnp.log(jnp.where(query_f0 != 0, query_f0, 1.0)) + delta)
    return jnp.where(query_f0 != 0, shifted, query_f0)


def shift_f0_to_target_register(query_f0: jax.Array, matching_f0: jax.Array,
                                src_log_median=None) -> jax.Array:
    """Log-median alignment of voiced source frames into the target's register
    (ref ddsp_prematch_dataset.py:1224-1233):
    shifted = exp(log f0 + median(log tgt) - median(log src)) on voiced frames.

    src_log_median: optional scalar overriding median(log src). The shift
    normalizes whatever it is given — per-CHUNK inputs would each be pulled
    to the target register independently, so streaming conversion anchors
    the register with the running whole-utterance median instead (NaN = use
    the input's own median, the reference semantics)."""
    med = (jnp.float32(jnp.nan) if src_log_median is None
           else jnp.asarray(src_log_median, jnp.float32))
    return _shift_f0_impl(query_f0, matching_f0, med)


@jax.jit
def sort_by_f0_compatibility(expected_f0: jax.Array, f0_list: jax.Array,
                             target_feature_indices: jax.Array) -> jax.Array:
    """Stable re-sort of each frame's candidate indices by
    |log2(cand_f0 + 1e-5) - log2(expected_f0 + 1e-5)|
    (ref ddsp_prematch_dataset.py:954-1016)."""
    cand_f0 = f0_list[target_feature_indices]                     # (T, k)
    badness = jnp.abs(jnp.log2(cand_f0 + 1e-5) - jnp.log2(expected_f0[:, None] + 1e-5))
    order = jnp.argsort(badness, axis=1, stable=True)
    return jnp.take_along_axis(target_feature_indices, order, axis=1)


def compute_shift(query_f0: jax.Array, f0_list: jax.Array,
                  target_feature_indices: jax.Array) -> jax.Array:
    """Least-squares multiplicative f0 shift (ref ddsp_prematch_dataset.py:
    929-950 — defined but off the live path; the live path uses the
    log-median shift above). Solves min_s ||s*q - median_tgt||."""
    cand_f0 = f0_list[target_feature_indices]               # (T, k)
    med = torch_median(cand_f0, axis=-1)                    # (T,)
    q = jnp.where(med == 0, 0.0, query_f0)
    denom = jnp.sum(q * q)
    return jnp.where(denom > 0, jnp.sum(q * med) / denom, 1.0)


def smoothen_f0(f0, slice_list, frame_per_second: int = 50):
    """Linear interpolation across glitchy [start_s, end_s] windows
    (ref lib_ongaku_test.py:248-263). Host-side numpy utility."""
    import numpy as np

    f0 = np.asarray(f0).copy()
    for start_s, end_s in slice_list:
        a = int(start_s * frame_per_second)
        b = int(end_s * frame_per_second)
        b = min(b, len(f0) - 1)
        if b <= a:
            continue
        f0[a : b + 1] = np.interp(np.arange(a, b + 1), [a, b], [f0[a], f0[b]])
    return f0


def interp_f0_candidates(x: jax.Array, xp: jax.Array, fp: jax.Array) -> jax.Array:
    """Log-domain piecewise-linear interpolation of per-frame candidate
    tracks (ref ddsp_prematch_dataset.py:1019-1060 `interp`; off the live
    path). x (B,), xp (B, F) increasing, fp (B, F, N) -> (B, 1, N)."""
    xl = jnp.log(x + 1e-5)[:, None]                         # (B, 1)
    xpl = jnp.log(xp + 1e-5)                                # (B, F)
    m = (fp[:, 1:] - fp[:, :-1]) / (xpl[:, 1:, None] - xpl[:, :-1, None])
    b = fp[:, :-1] - m * xpl[:, :-1, None]
    idx = jnp.sum(xl >= xpl, axis=-1) - 1                   # (B,)
    idx = jnp.clip(idx, 0, m.shape[1] - 1)
    mi = jnp.take_along_axis(m, idx[:, None, None], axis=1)
    bi = jnp.take_along_axis(b, idx[:, None, None], axis=1)
    return mi[:, 0] * xl[..., None] + bi[:, 0]
