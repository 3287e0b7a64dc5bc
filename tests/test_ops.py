"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knnsvc_tpu.ops.attention import gated_bias_attention, reference_attention


@pytest.mark.parametrize("T", [96, 200])  # block-aligned and ragged
def test_gated_bias_attention_matches_reference(T):
    H, d = 4, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((H, T, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((H, T, T)).astype(np.float32))
    gate = jnp.asarray((rng.random((H, T)) * 2).astype(np.float32))

    out = gated_bias_attention(q, k, v, bias, gate, block_q=96, interpret=True)
    ref = reference_attention(q, k, v, bias, gate)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("gate_value", [1.0, 0.0, -0.5])
def test_gated_bias_attention_padding_isolation(gate_value):
    """Padded key columns must not leak probability mass — including under
    zero/negative gates (the mask must not ride on the gated bias)."""
    H, T, d = 2, 100, 64  # pads to 256 with block_q=256
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((H, T, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((H, T, T)).astype(np.float32))
    gate = jnp.full((H, T), gate_value, dtype=jnp.float32)

    out = gated_bias_attention(q, k, v, bias, gate, interpret=True)
    ref = reference_attention(q, k, v, bias, gate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_concat_cost_pair_pallas_matches_scan():
    """Pallas concat-cost kernel (interpret mode) == the lax.scan pair."""
    import numpy as np

    from knnsvc_tpu.match.concat_cost import knn_with_concat_cost_pair
    from knnsvc_tpu.ops.concat_scan import concat_cost_pair_pallas

    rng = np.random.default_rng(11)
    T, P, D, k = 37, 53, 128, 4
    src = rng.standard_normal((T, D)).astype(np.float32)
    src[12:20] = src[12] + 0.01 * rng.standard_normal((8, D)).astype(np.float32)
    tgt = rng.standard_normal((P, D)).astype(np.float32)
    idx_u = rng.integers(0, P, (T, k)).astype(np.int32)
    idx_p = rng.integers(0, P, (T, k)).astype(np.int32)
    sf0 = (80 + 300 * rng.random(T)).astype(np.float32)
    tf0 = (80 + 300 * rng.random(P)).astype(np.float32)

    a_u, a_p = knn_with_concat_cost_pair(
        jnp.asarray(idx_u), jnp.asarray(idx_p), jnp.asarray(src),
        jnp.asarray(tgt), jnp.asarray(sf0), jnp.asarray(tf0), concat_weight=0.2)
    b_u, b_p = concat_cost_pair_pallas(
        jnp.asarray(idx_u), jnp.asarray(idx_p), jnp.asarray(src),
        jnp.asarray(tgt), jnp.asarray(sf0), jnp.asarray(tf0),
        concat_weight=0.2, interpret=True)
    np.testing.assert_array_equal(np.asarray(a_u), np.asarray(b_u))
    np.testing.assert_array_equal(np.asarray(a_p), np.asarray(b_p))
