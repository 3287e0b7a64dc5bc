"""Incremental streaming WavLM encoder (models/wavlm/streaming.py).

The contract, from strongest to weakest:
1. PLUMBING EXACTNESS: a single step covering the whole utterance (empty
   cache, no lookahead) reproduces wavlm_extract_layer bit-nearly — same
   conv framing, same pos_conv pad arithmetic, same bias/gate/softmax.
2. CHUNKED ACCURACY: a chunked stream's features deviate from the batch
   encode by an amount COMPARABLE to the windowed streaming mode's own
   deviation (the thing it replaces) — the KV cache is as good a left
   context as re-encoding the window.
3. END-TO-END: hub.stream_convert_chunks(encoder='cached') produces
   complete audio whose kNN frame selections overwhelmingly agree with the
   windowed mode's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knnsvc_tpu.config import WavLMConfig
from knnsvc_tpu.models.wavlm import init_wavlm_params, wavlm_extract_layer
from knnsvc_tpu.models.wavlm.streaming import (
    WavLMStreamEncoder,
    conv_receptive_field,
    step_sample_len,
)

# layer_norm extractor mode: the production (Large) configuration family —
# the conv frontend normalizes per frame, so incremental framing is exact
SMALL_CFG = dict(
    extractor_mode="layer_norm",
    encoder_layers=3,
    encoder_embed_dim=64,
    encoder_ffn_embed_dim=96,
    encoder_attention_heads=4,
    conv_feature_layers="[(48, 10, 5), (48, 8, 4), (48, 4, 4), (48, 4, 4)]",
    conv_bias=True,
    conv_pos=16,
    conv_pos_groups=4,
    relative_position_embedding=True,
    num_buckets=32,
    max_distance=64,
    gru_rel_pos=True,
)


@pytest.fixture(scope="module")
def world():
    cfg = WavLMConfig.from_dict(SMALL_CFG)
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    sr = 16000
    t = np.arange(4 * sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t)))
           + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
    return cfg, params, wav


def _pad_step(wav, s0, n):
    seg = wav[s0 : s0 + n]
    return np.pad(seg, (0, n - len(seg)))


def test_receptive_field_and_framing(world):
    cfg, _, _ = world
    rf = conv_receptive_field(cfg)
    assert rf > cfg.total_stride
    # step_sample_len asserts frame_count internally for several sizes
    for n in (1, 7, 50):
        assert step_sample_len(cfg, n) == (n - 1) * cfg.total_stride + rf


def test_single_step_equals_batch_encode(world):
    """Empty cache + whole utterance in one step == wavlm_extract_layer:
    the masked cache keys drop out of the softmax, pos_conv pads reduce to
    the batch zero pads, bias offsets match."""
    cfg, params, wav = world
    n_frames = 40
    n = step_sample_len(cfg, n_frames)
    x = wav[:n]
    batch = np.asarray(wavlm_extract_layer(params, cfg, jnp.asarray(x)[None], 2))[0]
    enc = WavLMStreamEncoder(params, cfg, output_layer=2,
                             chunk_frames=n_frames, cache_frames=8)
    stream = np.asarray(enc.step(x))
    assert batch.shape == stream.shape == (n_frames, cfg.encoder_embed_dim)
    np.testing.assert_allclose(stream, batch, atol=1e-4, rtol=1e-4)


def test_chunked_stream_beats_windowed_deviation(world):
    """Chunked streaming (KV cache) vs the full-utterance batch encode,
    compared against the WINDOWED mode's deviation on the same split: the
    cache must be at least as good a left context as window re-encoding
    (it is typically better — 4 s of real context vs the window's 0.5 s)."""
    cfg, params, wav = world
    L = 2
    F, CR, C = 25, 5, 25  # chunk / lookahead / windowed left context
    hop = cfg.total_stride
    total = step_sample_len(cfg, 150)
    x = wav[:total]
    full = np.asarray(wavlm_extract_layer(params, cfg, jnp.asarray(x)[None], L))[0]
    T = full.shape[0]

    enc = WavLMStreamEncoder(params, cfg, output_layer=L, chunk_frames=F,
                             lookahead_frames=CR, cache_frames=100)
    got, win = [], []
    g = 0
    while g < T:
        n_this = min(F, T - g)
        seg = _pad_step(x, g * hop, enc.sample_len)
        got.append(np.asarray(enc.step(seg))[:n_this])
        # windowed-mode encode of [g-C, g+F+CR) for the same center frames
        w0 = max(0, g - C)
        w1 = min(T, g + F + CR)
        wlen = step_sample_len(cfg, w1 - w0)
        wfeats = np.asarray(wavlm_extract_layer(
            params, cfg, jnp.asarray(_pad_step(x, w0 * hop, wlen))[None], L))[0]
        win.append(wfeats[g - w0 : g - w0 + n_this])
        g += F
    stream = np.concatenate(got)
    windowed = np.concatenate(win)
    assert stream.shape == windowed.shape == full.shape

    def rel(a):
        return np.linalg.norm(a - full, axis=-1) / (
            np.linalg.norm(full, axis=-1) + 1e-9)

    r_stream, r_win = rel(stream), rel(windowed)
    # chunked-KV features track the batch encode at least as well as the
    # windowed re-encode does on average, and stay sane per frame
    assert r_stream.mean() <= r_win.mean() * 1.5 + 1e-4, \
        (r_stream.mean(), r_win.mean())
    assert r_stream.max() < 0.5, r_stream.max()
    # frames far from chunk boundaries are near-exact by construction
    cos = (stream * full).sum(-1) / (
        np.linalg.norm(stream, axis=-1) * np.linalg.norm(full, axis=-1) + 1e-9)
    assert np.median(cos) > 0.99, np.median(cos)


def test_lookahead_frames_are_reencoded(world):
    """Lookahead frames are provisional: the same frame re-presented as a
    FINAL frame of the next step (with its own lookahead) must equal a run
    with no lookahead reuse — i.e. final outputs are a pure function of the
    sample stream, not of how often a frame was previewed."""
    cfg, params, wav = world
    L, F, CR = 2, 20, 6
    hop = cfg.total_stride
    x = wav[: step_sample_len(cfg, 80)]
    enc_a = WavLMStreamEncoder(params, cfg, output_layer=L, chunk_frames=F,
                               lookahead_frames=CR, cache_frames=60)
    enc_b = WavLMStreamEncoder(params, cfg, output_layer=L, chunk_frames=F,
                               lookahead_frames=CR, cache_frames=60)
    outs_a, outs_b = [], []
    for g in (0, F, 2 * F):
        seg = _pad_step(x, g * hop, enc_a.sample_len)
        outs_a.append(np.asarray(enc_a.step(seg))[:F])
        outs_b.append(np.asarray(enc_b.step(seg))[:F])
    np.testing.assert_array_equal(np.concatenate(outs_a),
                                  np.concatenate(outs_b))


def test_hub_cached_encoder_stream(tmp_path):
    """End-to-end: encoder='cached' streams complete audio and selects
    (overwhelmingly) the same pool frames as the windowed mode."""
    from knnsvc_tpu.config import HiFiGANConfig, ModelFamily
    from knnsvc_tpu.hub import KnnSvc
    from knnsvc_tpu.io.audio import save_audio
    from knnsvc_tpu.models.hifigan import init_generator_params
    from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index

    sr = 16000
    rng = np.random.default_rng(3)
    t = np.arange(int(1.5 * sr)) / sr
    src = (0.3 * np.sin(2 * np.pi * 180 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    ref = (0.3 * np.sin(2 * np.pi * 260 * np.arange(int(1.3 * sr)) / sr)
           ).astype(np.float32)
    save_audio(tmp_path / "src.wav", np.clip(src, -0.99, 0.99), sr)
    save_audio(tmp_path / "ref.wav", np.clip(ref, -0.99, 0.99), sr)

    cfg = WavLMConfig.from_dict(SMALL_CFG)
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    h = HiFiGANConfig.from_dict(dict(
        upsample_rates=(10, 8, 2, 2), upsample_kernel_sizes=(20, 16, 4, 4),
        upsample_initial_channel=64, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),), n_harmonic=4,
        hubert_dim=cfg.encoder_embed_dim, hifi_dim=32))
    gen = init_generator_params(jax.random.PRNGKey(1), h, ModelFamily.MIX)
    knn = KnnSvc(params, cfg, gen, h, ckpt_type="mix")
    knn.weighting = generate_matrix_from_index(2, size=cfg.encoder_layers + 1)

    kw = dict(chunk_s=0.4, context_s=0.4, matcher="exact")
    cached = list(knn.stream_convert_chunks(
        str(tmp_path / "src.wav"), str(tmp_path / "ref.wav"),
        encoder="cached", **kw))
    windowed = list(knn.stream_convert_chunks(
        str(tmp_path / "src.wav"), str(tmp_path / "ref.wav"),
        encoder="windowed", **kw))
    assert len(cached) == len(windowed) >= 3
    for a, b in zip(cached, windowed):
        assert a.shape == b.shape
        assert np.isfinite(a).all()
    total = sum(c.shape[-1] for c in cached)
    assert abs(total - len(src)) <= 320 * 2

    # frame-selection agreement through the real match path
    from knnsvc_tpu.match.pipeline import match_utterance
    from knnsvc_tpu.match.pool import build_device_pool
    from knnsvc_tpu.models.wavlm.streaming import WavLMStreamEncoder

    pool = build_device_pool(np.clip(ref, -0.99, 0.99), params, cfg,
                             knn.weighting, knn.weighting, sr)
    hop = cfg.total_stride
    F = int(round(0.4 * sr)) // hop
    enc = WavLMStreamEncoder(params, cfg, output_layer=2, chunk_frames=F,
                             lookahead_frames=F, cache_frames=100)

    def top1(feats):
        d = 1.0 - (feats @ np.asarray(pool.matching).T) / (
            np.linalg.norm(feats, axis=-1, keepdims=True)
            * np.linalg.norm(np.asarray(pool.matching), axis=-1) + 1e-9)
        return d.argmin(-1)

    full = np.asarray(wavlm_extract_layer(
        params, cfg, jnp.asarray(src[: step_sample_len(cfg, 8 * F)])[None], 2))[0]
    outs = []
    for g in range(0, full.shape[0], F):
        seg = _pad_step(src, g * hop, enc.sample_len)
        outs.append(np.asarray(enc.step(seg))[: min(F, full.shape[0] - g)])
    stream = np.concatenate(outs)
    agree = (top1(stream) == top1(full)).mean()
    assert agree > 0.85, agree
