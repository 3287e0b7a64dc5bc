"""Parity tests: JAX HiFi-GAN variants vs the PyTorch reference (random
weights converted with io/checkpoints.py), at the real config_v1_wavlm.json
sizes but short sequences."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knnsvc_tpu.config import HiFiGANConfig, ModelFamily
from knnsvc_tpu.io.checkpoints import (
    convert_hifigan_state_dict,
    convert_mpd_state_dict,
    convert_msd_state_dict,
)
from knnsvc_tpu.models.hifigan import (
    init_generator_params,
    synthesizer_mix_apply,
    synthesizer_f0_apply,
    synthesizer_original_apply,
    mpd_apply,
    msd_apply,
    vocode,
)

CONFIG_PATH = "/root/reference/hifigan/config_v1_wavlm.json"


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


@pytest.fixture(scope="module")
def h_cfg(reference):
    with open(CONFIG_PATH) as f:
        data = json.load(f)
    h_torch = reference.hifigan_utils.AttrDict(dict(data))
    h_torch.hubert_dim = 1024
    h_ours = HiFiGANConfig.from_dict({**data, "hubert_dim": 1024})
    return h_torch, h_ours


def test_synthesizer_mix_parity(reference, torch, h_cfg):
    h_torch, h = h_cfg
    torch.manual_seed(0)
    model = reference.hifigan_models.SynthesizerTrn(h_torch).eval()
    params = convert_hifigan_state_dict(model.state_dict(), h, ModelFamily.MIX)

    rng = np.random.default_rng(0)
    T = 12
    mel = rng.standard_normal((1, T, 1024)).astype(np.float32)
    f0 = np.zeros((1, T, 1), dtype=np.float32)
    f0[0, 3:10, 0] = 200.0 + 20 * rng.random(7)
    harm = (rng.random((1, T, 49)) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.tensor(mel), torch.tensor(f0), torch.tensor(harm)).numpy()
    ours = np.asarray(synthesizer_mix_apply(params, h, jnp.asarray(mel), jnp.asarray(f0), jnp.asarray(harm)))
    assert ours.shape == ref.shape == (1, 1, T * 320)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_synthesizer_f0_parity(reference, torch, h_cfg):
    h_torch, h = h_cfg
    torch.manual_seed(1)
    model = reference.hifigan_models_f0.SynthesizerTrn(h_torch).eval()
    params = convert_hifigan_state_dict(model.state_dict(), h, ModelFamily.F0_ONLY)

    rng = np.random.default_rng(1)
    T = 10
    mel = rng.standard_normal((1, T, 1024)).astype(np.float32)
    f0 = np.zeros((1, T, 1), dtype=np.float32)
    f0[0, 2:8, 0] = 150.0 + 30 * rng.random(6)

    with torch.no_grad():
        ref = model(torch.tensor(mel), torch.tensor(f0)).numpy()
    ours = np.asarray(synthesizer_f0_apply(params, h, jnp.asarray(mel), jnp.asarray(f0)))
    assert ours.shape == ref.shape == (1, 1, T * 320)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_original_variant_shapes(h_cfg):
    """hifigan/models.py is missing from the reference (ddsp_hubconf.py:48) —
    no parity oracle; check the reconstructed HiFi-GAN v1 runs and upsamples
    by exactly hop_size."""
    _, h = h_cfg
    params = init_generator_params(jax.random.PRNGKey(0), h, ModelFamily.ORIGINAL)
    feats = jnp.zeros((1, 7, h.hubert_dim))
    wav = synthesizer_original_apply(params, h, feats)
    assert wav.shape == (1, 1, 7 * 320)
    assert bool(jnp.all(jnp.abs(wav) <= 1.0))


def test_vocode_dispatch(h_cfg):
    _, h = h_cfg
    T = 6
    f0 = jnp.zeros((1, T, 1))
    harm = jnp.zeros((1, T, 49))
    feats = jnp.zeros((1, T, h.hubert_dim))
    for family in ModelFamily:
        params = init_generator_params(jax.random.PRNGKey(1), h, family)
        wav = vocode(params, h, family, feats,
                     None if family == ModelFamily.ORIGINAL else f0,
                     harm if family == ModelFamily.MIX else None)
        assert wav.shape == (1, T * 320)


def test_mpd_parity(reference, torch):
    torch.manual_seed(2)
    model = reference.hifigan_models.MultiPeriodDiscriminator().eval()
    params = convert_mpd_state_dict(model.state_dict(), fold=False)

    rng = np.random.default_rng(2)
    y = (rng.standard_normal((1, 1, 3001)) * 0.1).astype(np.float32)  # 3001 % periods != 0
    y_hat = (rng.standard_normal((1, 1, 3001)) * 0.1).astype(np.float32)

    with torch.no_grad():
        r_ref, g_ref, fr_ref, fg_ref = model(torch.tensor(y), torch.tensor(y_hat))
    r, g, fr, fg = mpd_apply(params, jnp.asarray(y), jnp.asarray(y_hat))
    for a, b in zip(r, r_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4)
    for fa, fb in zip(fg, fg_ref):
        np.testing.assert_allclose(np.asarray(fa[-1]), fb[-1].numpy(), atol=2e-4)


def test_msd_parity(reference, torch):
    torch.manual_seed(3)
    model = reference.hifigan_models.MultiScaleDiscriminator().eval()
    params = convert_msd_state_dict(model.state_dict(), fold=False)

    rng = np.random.default_rng(3)
    y = (rng.standard_normal((1, 1, 2000)) * 0.1).astype(np.float32)
    y_hat = (rng.standard_normal((1, 1, 2000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        r_ref, g_ref, fr_ref, fg_ref = model(torch.tensor(y), torch.tensor(y_hat))
    r, g, fr, fg, _ = msd_apply(params, jnp.asarray(y), jnp.asarray(y_hat), update_sn=False)
    # random-init grouped-conv stacks blow up to ~1e13 logits; parity is
    # relative there, absolute for the (small) early feature maps
    for a, b in zip(r, r_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-4, atol=1e-3)
    for fa, fb in zip(fr, fr_ref):
        np.testing.assert_allclose(np.asarray(fa[0]), fb[0].numpy(), rtol=1e-4, atol=1e-3)


def test_losses_parity(reference, torch):
    from knnsvc_tpu.models.hifigan import feature_loss, discriminator_loss, generator_loss

    rng = np.random.default_rng(4)
    fr = [[rng.standard_normal((1, 4, 9)).astype(np.float32) for _ in range(3)] for _ in range(2)]
    fg = [[rng.standard_normal((1, 4, 9)).astype(np.float32) for _ in range(3)] for _ in range(2)]
    dr = [rng.standard_normal((1, 7)).astype(np.float32) for _ in range(3)]
    dg = [rng.standard_normal((1, 7)).astype(np.float32) for _ in range(3)]

    t = torch.tensor
    ref_fl = reference.hifigan_models.feature_loss(
        [[t(x) for x in m] for m in fr], [[t(x) for x in m] for m in fg]
    ).item()
    ours_fl = float(feature_loss([[jnp.asarray(x) for x in m] for m in fr],
                                 [[jnp.asarray(x) for x in m] for m in fg]))
    np.testing.assert_allclose(ours_fl, ref_fl, rtol=1e-5)

    ref_dl, _, _ = reference.hifigan_models.discriminator_loss([t(x) for x in dr], [t(x) for x in dg])
    ours_dl, _, _ = discriminator_loss([jnp.asarray(x) for x in dr], [jnp.asarray(x) for x in dg])
    np.testing.assert_allclose(float(ours_dl), ref_dl.item(), rtol=1e-5)

    ref_gl, _ = reference.hifigan_models.generator_loss([t(x) for x in dg])
    ours_gl, _ = generator_loss([jnp.asarray(x) for x in dg])
    np.testing.assert_allclose(float(ours_gl), ref_gl.item(), rtol=1e-5)
