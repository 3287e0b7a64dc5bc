"""Parity tests: JAX WavLM encoder vs the PyTorch reference (random weights,
converted with io/checkpoints.py). Uses a shrunken config so the 1-core CPU
test env stays fast; the architecture code paths are identical to Large."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knnsvc_tpu.config import WavLMConfig
from knnsvc_tpu.io.checkpoints import convert_wavlm_state_dict
from knnsvc_tpu.models.wavlm import wavlm_extract_layer, wavlm_extract_all_layers, init_wavlm_params


SMALL_CONV = "[(32,10,5)] + [(32,3,2)] + [(32,2,2)]"  # total stride 20


def make_cfgs(extractor_mode, layer_norm_first, conv_bias=False):
    d = dict(
        extractor_mode=extractor_mode,
        encoder_layers=3,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        activation_fn="gelu",
        layer_norm_first=layer_norm_first,
        conv_feature_layers=SMALL_CONV,
        conv_bias=conv_bias,
        conv_pos=16,
        conv_pos_groups=4,
        relative_position_embedding=True,
        num_buckets=32,
        max_distance=64,
        gru_rel_pos=True,
        normalize=True,
        # torch-side extras
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        encoder_layerdrop=0.0,
        dropout_input=0.0,
        dropout_features=0.0,
        feature_grad_mult=0.0,
        mask_prob=0.0,
        mask_channel_prob=0.0,
    )
    ours = WavLMConfig.from_dict(d)
    return d, ours


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def build_pair(reference, torch, extractor_mode="layer_norm", layer_norm_first=True,
               conv_bias=True, seed=0):
    torch_cfg_dict, cfg = make_cfgs(extractor_mode, layer_norm_first, conv_bias)
    torch.manual_seed(seed)
    ref_cfg = reference.wavlm_mod.WavLMConfig(torch_cfg_dict)
    model = reference.wavlm_mod.WavLM(ref_cfg).eval()
    params = convert_wavlm_state_dict(model.state_dict(), cfg)
    return model, params, cfg


@pytest.mark.parametrize(
    "extractor_mode,layer_norm_first,conv_bias",
    [("layer_norm", True, True), ("default", False, False)],
)
def test_extract_layer_parity(reference, torch, extractor_mode, layer_norm_first, conv_bias):
    model, params, cfg = build_pair(reference, torch, extractor_mode, layer_norm_first, conv_bias)
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((1, 2000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref_feats, _ = model.extract_features(torch.tensor(wav), output_layer=2)
    ours = wavlm_extract_layer(params, cfg, jnp.asarray(wav), output_layer=2)

    assert ours.shape == tuple(ref_feats.shape)
    np.testing.assert_allclose(np.asarray(ours), ref_feats.numpy(), atol=2e-4)


def test_all_layers_parity(reference, torch):
    model, params, cfg = build_pair(reference, torch)
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((1, 1500)) * 0.1).astype(np.float32)

    with torch.no_grad():
        (rep, layer_results), _ = model.extract_features(
            torch.tensor(wav), output_layer=cfg.encoder_layers, ret_layer_results=True
        )[0], None
    # reference returns (feature, padding) with feature=(rep, layer_results)
    ref_stack = np.stack([x.transpose(0, 1).numpy() for x, _ in layer_results])  # (L+1, B, T, C)

    ours = np.asarray(wavlm_extract_all_layers(params, cfg, jnp.asarray(wav)))
    assert ours.shape == ref_stack.shape
    np.testing.assert_allclose(ours, ref_stack, atol=3e-4)


def test_one_hot_weighting_equals_single_layer(reference, torch):
    """A one-hot layer weighting over the all-layer stack == running only that
    many layers (the early-exit fast path)."""
    model, params, cfg = build_pair(reference, torch)
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal((1, 1200)) * 0.1).astype(np.float32)

    stack = np.asarray(wavlm_extract_all_layers(params, cfg, jnp.asarray(wav)))
    single = np.asarray(wavlm_extract_layer(params, cfg, jnp.asarray(wav), output_layer=2))
    np.testing.assert_allclose(stack[2], single, atol=1e-5)


def test_frame_count_matches_hop():
    _, cfg = make_cfgs("layer_norm", True)
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    wav = jnp.zeros((1, 2000))
    out = wavlm_extract_layer(params, cfg, wav, output_layer=1)
    # conv stack with kernel sizes (10,3,2) strides (5,2,2)
    t1 = (2000 - 10) // 5 + 1
    t2 = (t1 - 3) // 2 + 1
    t3 = (t2 - 2) // 2 + 1
    assert out.shape == (1, t3, cfg.encoder_embed_dim)


def test_bucketed_encode_matches_exact(reference, torch):
    """Production bucketed+masked path vs the exact path: identical conv
    frontend frames, attention over masked keys — outputs should match the
    exact path closely away from the pos-conv boundary."""
    from knnsvc_tpu.models.wavlm import wavlm_extract_layer_bucketed

    model, params, cfg = build_pair(reference, torch)
    rng = np.random.default_rng(9)
    wav = (rng.standard_normal((1, 1100)) * 0.1).astype(np.float32)

    exact = np.asarray(wavlm_extract_layer(params, cfg, jnp.asarray(wav), output_layer=2))
    bucketed = np.asarray(wavlm_extract_layer_bucketed(params, cfg, jnp.asarray(wav), output_layer=2))
    assert bucketed.shape == exact.shape
    T = exact.shape[1]
    # interior frames (away from the pos-conv half-width) should agree tightly
    interior = slice(0, T - cfg.conv_pos // 2)
    scale = np.abs(exact[:, interior]).mean()
    err = np.abs(bucketed[:, interior] - exact[:, interior]).max()
    assert err < 0.05 * max(scale, 1.0), (err, scale)
