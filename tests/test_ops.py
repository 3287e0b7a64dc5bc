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
