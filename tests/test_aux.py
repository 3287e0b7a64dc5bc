"""Aux-surface tests: legacy matcher API, spectral losses, plotting, demo
site, profiling utilities."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow  # 54 s: full-size WavLM+HiFiGAN compile (coverage: the
# fast tier drives the same hub wiring via test_pipeline's tiny models)
def test_legacy_match_api():
    """hub.match(): classic knn-vc query/matching_set conversion."""
    from knnsvc_tpu.config import HiFiGANConfig, WavLMConfig
    from knnsvc_tpu.hub import KnnSvc
    from knnsvc_tpu.models.hifigan import init_generator_params
    from knnsvc_tpu.config import ModelFamily

    h = HiFiGANConfig.from_dict(dict(
        upsample_initial_channel=32, n_harmonic=4, hubert_dim=24, hifi_dim=16,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
    ))
    gen = init_generator_params(jax.random.PRNGKey(0), h, ModelFamily.F0_ONLY)
    knn = KnnSvc(None, WavLMConfig(), gen, h, ckpt_type="wavlm_only")

    rng = np.random.default_rng(0)
    query = rng.standard_normal((40, 24)).astype(np.float32)
    pool = rng.standard_normal((200, 24)).astype(np.float32)
    f0 = (rng.random(40) * 200).astype(np.float32)

    feats = knn.match(query, pool, without_vocode=True)
    assert feats.shape == query.shape
    # top-1 self match returns the pool rows themselves
    self_feats = knn.match(pool[:10], pool, topk=1, without_vocode=True)
    np.testing.assert_allclose(self_feats, pool[:10], atol=1e-5)

    wav = knn.match(query, pool, query_f0=f0)
    assert wav.shape == (40 * 320,)

    # target_duration rescaling
    feats2 = knn.match(query, pool, target_duration=0.5, without_vocode=True)
    assert feats2.shape[0] == int(0.5 * 16000 / 320)


def test_sss_loss_properties():
    from knnsvc_tpu.train.spectral_losses import sss_loss, rss_loss

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32) * 0.2)
    same = float(sss_loss(a, a, n_fft=512))
    diff = float(sss_loss(a, b, n_fft=512))
    assert same < 1e-4
    assert diff > same
    r = float(rss_loss(jax.random.PRNGKey(0), a, b, fft_min=256, fft_max=512, n_scale=2))
    assert np.isfinite(r) and r > 0


def test_plotting_helpers(tmp_path):
    from knnsvc_tpu.utils.plotting import plot_matrix, plot_multi_sequences

    x = np.arange(50) / 50
    p1 = plot_multi_sequences(x, [np.sin(x * 6), np.cos(x * 6)], ["sin", "cos"],
                              out_path=str(tmp_path / "seq.png"))
    p2 = plot_matrix(np.random.default_rng(0).random((8, 50)),
                     out_path=str(tmp_path / "mat.png"))
    assert os.path.getsize(p1) > 1000
    assert os.path.getsize(p2) > 1000


def test_demo_site_builder(tmp_path):
    from knnsvc_tpu.eval.demo_site import build_demo_page, duration_ablation_section
    from knnsvc_tpu.io.audio import save_audio

    wavs = []
    for i in range(3):
        p = tmp_path / f"a{i}.wav"
        save_audio(p, np.zeros(1600, np.float32), 16000)
        wavs.append(str(p))

    sections = [
        ("comparison", ["", "src", "ref", "row1", wavs[0], wavs[1]], 3),
        duration_ablation_section(wavs[0], wavs[1], {"5s": wavs[2], "full": wavs[2]}),
    ]
    out = build_demo_page(sections, str(tmp_path / "site"))
    html = open(out).read()
    assert "<audio controls" in html
    assert "duration ablation" in html
    assert (tmp_path / "site" / "assets" / "a0.wav").exists()


def test_stage_timer():
    from knnsvc_tpu.utils.profiling import StageTimer

    t = StageTimer(sync=False)
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    report = t.report()
    assert "a" in report and "TOTAL" in report
    assert "seconds" in t.as_json()


def test_masking_utils():
    from knnsvc_tpu.models.wavlm.masking import apply_mask, compute_mask_indices

    rng = np.random.default_rng(0)
    mask = compute_mask_indices((4, 100), None, mask_prob=0.65, mask_length=10, rng=rng)
    assert mask.shape == (4, 100)
    counts = mask.sum(axis=1)
    assert (counts == counts[0]).all()  # rows trimmed to batch-min
    assert 0 < counts[0] < 100

    feats = jnp.asarray(rng.standard_normal((4, 100, 8)).astype(np.float32))
    emb = jnp.ones((8,), dtype=jnp.float32) * 7
    out = np.asarray(apply_mask(feats, emb, mask))
    assert np.allclose(out[mask], 7.0)
    assert np.allclose(out[~mask], np.asarray(feats)[~mask])


def test_generator_harm_head():
    from knnsvc_tpu.models.hifigan.harm_head import (
        generator_harm_apply,
        init_generator_harm_params,
    )

    hidden, n_harm, T = 16, 8, 12
    params = init_generator_harm_params(jax.random.PRNGKey(0), hidden, n_harm)
    rng = np.random.default_rng(0)
    f0 = jnp.asarray((rng.random((1, T, 1)) * 300 + 80).astype(np.float32))
    harm = jnp.asarray(rng.standard_normal((1, hidden, T)).astype(np.float32))
    sig = generator_harm_apply(params, f0, harm, hop_size=320)
    assert sig.shape == (1, n_harm, T * 320)
    assert np.all(np.isfinite(np.asarray(sig)))


def test_legacy_audio_dataset(tmp_path):
    from knnsvc_tpu.io.audio import save_audio
    from knnsvc_tpu.train.legacy_audio_dataset import AudioDataset, traverse_dir

    d = tmp_path / "spk"
    d.mkdir()
    t = np.arange(32000) / 16000
    for i in range(2):
        save_audio(d / f"u{i}.wav", (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), 16000)
    assert len(traverse_dir(str(tmp_path), ".wav")) == 2
    ds = AudioDataset(str(tmp_path), waveform_sec=1.0)
    assert len(ds) == 2
    item = ds[0]
    assert item["audio"].shape == (16000,)
    assert item["f0"].shape[0] == 16000 // 320 + 1


def test_self_match():
    from knnsvc_tpu.config import HiFiGANConfig, WavLMConfig
    from knnsvc_tpu.hub import KnnSvc

    knn = KnnSvc(None, WavLMConfig(), None, HiFiGANConfig(), ckpt_type="wavlm_only")
    rng = np.random.default_rng(0)
    q = rng.standard_normal((30, 16)).astype(np.float32)
    out = knn.self_match(q, topk=2, without_vocode=True)
    assert out.shape == q.shape
    # with exclusion, a frame never reproduces itself exactly
    assert not np.allclose(out, q)


def test_vocode_batch_matches_single():
    from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, WavLMConfig
    from knnsvc_tpu.hub import KnnSvc
    from knnsvc_tpu.match.pipeline import ConversionFeatures
    from knnsvc_tpu.models.hifigan import init_generator_params

    h = HiFiGANConfig.from_dict(dict(
        upsample_initial_channel=32, n_harmonic=4, hubert_dim=12, hifi_dim=16,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
    ))
    gen = init_generator_params(jax.random.PRNGKey(0), h, ModelFamily.F0_ONLY)
    knn = KnnSvc(None, WavLMConfig(), gen, h, ckpt_type="wavlm_only")

    rng = np.random.default_rng(0)
    feats = []
    for T in (10, 10, 7):
        feats.append(ConversionFeatures(
            out_feats_weighted=rng.standard_normal((T, 12)).astype(np.float32),
            shifted_query_f0=(rng.random(T) * 200).astype(np.float32),
        ))
    wavs = knn.vocode_batch(feats, bucket_frames=10)
    assert [len(w) for w in wavs] == [3200, 3200, 2240]
    # bucket-aligned items (T == bucket) must match unbatched vocoding exactly
    single = knn.vocode(feats[0].out_feats_weighted, feats[0].shifted_query_f0)
    np.testing.assert_allclose(wavs[0], single, atol=1e-5)


def test_vocode_guards_for_missing_inputs():
    from knnsvc_tpu.config import HiFiGANConfig, WavLMConfig
    from knnsvc_tpu.hub import KnnSvc

    knn_mix = KnnSvc(None, WavLMConfig(), None, HiFiGANConfig(), ckpt_type="mix")
    with pytest.raises(ValueError, match="harmonic"):
        knn_mix.vocode(np.zeros((5, 1024), np.float32), np.zeros(5, np.float32))
    knn_f0 = KnnSvc(None, WavLMConfig(), None, HiFiGANConfig(), ckpt_type="wavlm_only")
    with pytest.raises(ValueError, match="f0"):
        knn_f0.vocode(np.zeros((5, 1024), np.float32))


@pytest.mark.slow  # 54 s: compiles full-size programs just to read XLA cost analysis
def test_analytic_flops_match_xla_cost_analysis():
    """The MFU accounting's analytic counters (utils/flops.py) must track
    XLA's own post-optimization flop estimate: conv/matmul terms dominate
    both models, so the analytic count (matmul/conv only) should land within
    [0.5, 1.1] of cost_analysis() on a small config."""
    from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, WavLMConfig
    from knnsvc_tpu.models.hifigan import init_generator_params
    from knnsvc_tpu.models.hifigan.generator import vocode
    from knnsvc_tpu.models.wavlm import init_wavlm_params, wavlm_extract_layer
    from knnsvc_tpu.utils.flops import (conv_frontend_flops, hifigan_flops,
                                        wavlm_encoder_flops)

    h = HiFiGANConfig.from_dict(dict(
        upsample_rates=(10, 8, 2, 2), upsample_kernel_sizes=(20, 16, 4, 4),
        upsample_initial_channel=64, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),), n_harmonic=4, hubert_dim=64,
        hifi_dim=32))
    T = 40
    gen = init_generator_params(jax.random.PRNGKey(0), h, ModelFamily.MIX)
    feats = jnp.zeros((1, T, h.hubert_dim))
    f0 = jnp.full((1, T, 1), 150.0)
    harm = jnp.full((1, T, 49), 0.1)
    lowered = jax.jit(
        lambda f, p, hm: vocode(gen, h, ModelFamily.MIX, f, p, hm)
    ).lower(feats, f0, harm)
    xla_flops = lowered.compile().cost_analysis()["flops"]
    ours = hifigan_flops(h, T, family="mix")
    assert 0.5 * xla_flops <= ours <= 1.1 * xla_flops, (ours, xla_flops)

    cfg = WavLMConfig.from_dict(dict(
        extractor_mode="group_norm", encoder_layers=3, encoder_embed_dim=64,
        encoder_ffn_embed_dim=96, encoder_attention_heads=4,
        conv_feature_layers="[(64, 10, 5), (64, 8, 4), (64, 4, 4), (64, 4, 4)]",
        conv_pos=16, conv_pos_groups=4, relative_position_embedding=True,
        num_buckets=32, max_distance=64, gru_rel_pos=True))
    params = init_wavlm_params(jax.random.PRNGKey(1), cfg)
    n_samples = 16000
    wav = jnp.zeros((1, n_samples))
    lowered = jax.jit(
        lambda w: wavlm_extract_layer(params, cfg, w, 3)).lower(wav)
    xla_flops = lowered.compile().cost_analysis()["flops"]
    cf, t_frames = conv_frontend_flops(cfg.conv_feature_layers, n_samples)
    ours = cf + wavlm_encoder_flops(
        cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim, 3, t_frames,
        cfg.conv_pos, cfg.conv_pos_groups)
    assert 0.5 * xla_flops <= ours <= 1.1 * xla_flops, (ours, xla_flops)
