"""Streaming conversion mode (hub.stream_convert_chunks) — no reference
analogue; the framework's low-latency serving path.

Key invariants tested:
- a stream whose one chunk covers the whole utterance IS the fast pair path
  (bit-identical: same encode, same anchored shift, same int16 quantize);
- with full context and an unvoiced source (register anchor out of play),
  chunking only introduces the vocoder-margin tail deviation, which is
  bounded like the bucketed bulk vocoder;
- realistic small-context streams produce sane, complete audio.
"""

import jax
import numpy as np
import pytest

from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, WavLMConfig
from knnsvc_tpu.io.audio import load_audio, save_audio
from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index

SMALL_WAVLM = dict(
    extractor_mode="group_norm",
    encoder_layers=2,
    encoder_embed_dim=64,
    encoder_ffn_embed_dim=96,
    encoder_attention_heads=4,
    conv_feature_layers="[(64, 10, 5), (64, 8, 4), (64, 4, 4), (64, 4, 4)]",
    conv_pos=16,
    conv_pos_groups=4,
    relative_position_embedding=True,
    num_buckets=32,
    max_distance=64,
    gru_rel_pos=True,
)

SMALL_HIFIGAN = dict(
    upsample_rates=(10, 8, 2, 2),
    upsample_kernel_sizes=(20, 16, 4, 4),
    upsample_initial_channel=64,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3, 5),),
    n_harmonic=4,
    hubert_dim=64,
    hifi_dim=32,
)


def _sing(sr, seconds, f0_hz, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    wav = (0.3 * np.sin(2 * np.pi * f0_hz * t)
           + 0.1 * np.sin(2 * np.pi * 2 * f0_hz * t))
    wav += 0.02 * rng.standard_normal(len(t))
    return np.clip(wav, -0.99, 0.99).astype(np.float32)


def _noise(sr, seconds, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(int(sr * seconds)).astype(np.float32)
    # light smoothing so it is not white-flat but stays unvoiced
    k = np.ones(8, np.float32) / 8.0
    return np.clip(np.convolve(x, k, mode="same") * 0.3, -0.99, 0.99)


@pytest.fixture(scope="module")
def svc_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    sr = 16000
    save_audio(root / "src_sing.wav", _sing(sr, 1.0, 180, 0), sr)
    save_audio(root / "src_noise.wav", _noise(sr, 2.0, 1), sr)
    save_audio(root / "ref.wav", _sing(sr, 1.3, 260, 2), sr)

    from knnsvc_tpu.hub import KnnSvc
    from knnsvc_tpu.models.hifigan import init_generator_params
    from knnsvc_tpu.models.wavlm import init_wavlm_params

    cfg = WavLMConfig.from_dict(SMALL_WAVLM)
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    h = HiFiGANConfig.from_dict(SMALL_HIFIGAN)
    gen = init_generator_params(jax.random.PRNGKey(1), h, ModelFamily.MIX)
    knn = KnnSvc(params, cfg, gen, h, ckpt_type="mix")
    knn.weighting = generate_matrix_from_index(2, size=cfg.encoder_layers + 1)
    return root, knn


def test_stream_single_chunk_equals_fast_pair(svc_world, tmp_path):
    root, knn = svc_world
    src, ref = str(root / "src_sing.wav"), str(root / "ref.wav")
    batch_path = knn.convert_pair(src, ref, matcher="exact", fast=True,
                                  output_path=str(tmp_path / "batch.wav"))
    batch = np.asarray(load_audio(batch_path)[0])[0]  # mono channel
    chunks = list(knn.stream_convert_chunks(src, ref, chunk_s=2.0,
                                            context_s=0.5, matcher="exact"))
    assert len(chunks) == 1
    streamed = chunks[0]
    assert streamed.shape == batch.shape
    # same encode window, same anchored register shift, same int16
    # quantization -> bit-identical
    np.testing.assert_array_equal(streamed, batch)


@pytest.mark.slow
def test_stream_chunked_full_context_matches_batch(svc_world, tmp_path):
    """With context covering the whole utterance every chunk sees identical
    features, and an unvoiced source keeps the register anchor out of play —
    the only chunking artifact left is the vocoder margin, bounded like the
    bucketed bulk vocoder (<=1e-4 + int16 steps)."""
    root, knn = svc_world
    src, ref = str(root / "src_noise.wav"), str(root / "ref.wav")
    batch_path = knn.convert_pair(src, ref, matcher="exact", fast=True,
                                  output_path=str(tmp_path / "batch.wav"))
    batch = np.asarray(load_audio(batch_path)[0])[0]  # mono channel
    chunks = list(knn.stream_convert_chunks(src, ref, chunk_s=0.5,
                                            context_s=4.0, matcher="exact"))
    assert len(chunks) >= 3
    streamed = np.concatenate(chunks)
    assert streamed.shape == batch.shape
    dev = np.abs(streamed - batch)
    assert dev.max() <= 2e-4, dev.max()
    # the overwhelming majority of samples are bit-identical
    assert (dev == 0).mean() > 0.9


def test_stream_zero_context_yields_complete_audio(svc_world):
    """Regression (ADVICE r3): context_s=0 on a multi-chunk input used to
    silently truncate after the first chunk — the conv frontend trims ~1
    frame per window edge, so every mid-stream window encoded to fewer than
    F center frames and the frame-count end-of-input check fired. Context is
    now clamped to one hop for multi-chunk inputs and end-of-input comes
    from the sample position."""
    root, knn = svc_world
    src, ref = str(root / "src_sing.wav"), str(root / "ref.wav")
    chunks = list(knn.stream_convert_chunks(src, ref, chunk_s=0.25,
                                            context_s=0.0))
    assert len(chunks) >= 3
    n_src = load_audio(src)[0].shape[-1]
    total = sum(c.shape[-1] for c in chunks)
    assert abs(total - n_src) <= 320 * 2


@pytest.mark.slow  # 41 s: context-sweep recompiles; streaming wiring is covered by the other stream tests
def test_stream_asymmetric_context(svc_world, tmp_path):
    """right_context_s decouples LOOKAHEAD from lookback (r4): a long left
    context with minimal right context keeps the stream complete, and with
    context covering the whole utterance on BOTH settings the outputs agree
    (window contents identical -> same features, same anchored shift)."""
    root, knn = svc_world
    src, ref = str(root / "src_sing.wav"), str(root / "ref.wav")
    # minimal lookahead: full-length output, multiple chunks
    chunks = list(knn.stream_convert_chunks(src, ref, chunk_s=0.25,
                                            context_s=0.5,
                                            right_context_s=0.05))
    assert len(chunks) >= 3
    n_src = load_audio(src)[0].shape[-1]
    total = sum(c.shape[-1] for c in chunks)
    assert abs(total - n_src) <= 320 * 2
    assert all(np.isfinite(c).all() for c in chunks)
    # symmetric vs asymmetric agree when both windows span the utterance
    # (src_sing is 1 s: context 4 s either side covers everything)
    a = np.concatenate(list(knn.stream_convert_chunks(
        src, ref, chunk_s=0.5, context_s=4.0, matcher="exact")))
    b = np.concatenate(list(knn.stream_convert_chunks(
        src, ref, chunk_s=0.5, context_s=4.0, right_context_s=4.0,
        matcher="exact")))
    np.testing.assert_array_equal(a, b)


def test_stream_small_context_structure(svc_world, tmp_path):
    root, knn = svc_world
    src, ref = str(root / "src_sing.wav"), str(root / "ref.wav")
    chunks = list(knn.stream_convert_chunks(src, ref, chunk_s=0.25,
                                            context_s=0.25))
    # 1 s of source at 0.25 s chunks -> 4ish chunks, all full-size except
    # possibly the last (encoder edge)
    assert len(chunks) >= 3
    F = int(round(0.25 * 16000)) // 320
    for c in chunks[:-1]:
        assert c.shape == (F * 320,)
    assert 0 < chunks[-1].shape[-1] <= F * 320
    n_src = load_audio(src)[0].shape[-1]
    total = sum(c.shape[-1] for c in chunks)
    assert abs(total - n_src) <= 320 * 2
    for c in chunks:
        assert np.all(np.isfinite(c))
        assert np.abs(c).max() <= 1.0
    # the file-level wrapper writes the concatenation
    out = knn.stream_convert(src, ref, chunk_s=0.25, context_s=0.25,
                             output_path=str(tmp_path / "streamed.wav"))
    y, sr = load_audio(out)
    assert sr == 16000
    assert np.asarray(y)[0].shape[-1] == total
    # (no RMS assertion: the tiny random vocoder's output can sit below one
    # int16 step; content fidelity is covered by the equality tests above)


@pytest.mark.slow
def test_stream_single_chunk_post_opt_equals_fast_pair(svc_world, tmp_path):
    """Same degenerate-equality property through the post_opt fused core
    (concat-cost reselection + smoothness weights) — covers the anchored
    register shift on that path too."""
    root, knn = svc_world
    src, ref = str(root / "src_sing.wav"), str(root / "ref.wav")
    batch_path = knn.convert_pair(src, ref, matcher="exact", fast=True,
                                  post_opt="post_opt_0.2",
                                  output_path=str(tmp_path / "batch.wav"))
    batch = np.asarray(load_audio(batch_path)[0])[0]
    chunks = list(knn.stream_convert_chunks(src, ref, chunk_s=2.0,
                                            context_s=0.5, matcher="exact",
                                            post_opt="post_opt_0.2"))
    assert len(chunks) == 1
    np.testing.assert_array_equal(chunks[0], batch)


@pytest.mark.slow
def test_stream_chunked_concat_matches_batch(svc_world, tmp_path):
    """A genuinely CHUNKED stream through the concat-cost reselection
    (post_opt='no_post_opt_0.2': CAT on, smoothness off) equals the batch
    path up to the vocoder-margin bound: full context makes every window's
    features identical to the batch encode, the unvoiced source keeps the
    register anchor out of play, and the cross-chunk carry (previous
    selections + sticky latch) makes the chunked concat scan BIT-IDENTICAL
    to the whole-utterance scan (test_concat_stream_chaining... proves the
    core property; this proves the hub threads it)."""
    root, knn = svc_world
    src, ref = str(root / "src_noise.wav"), str(root / "ref.wav")
    batch_path = knn.convert_pair(src, ref, matcher="exact", fast=True,
                                  post_opt="no_post_opt_0.2",
                                  output_path=str(tmp_path / "batch.wav"))
    batch = np.asarray(load_audio(batch_path)[0])[0]
    chunks = list(knn.stream_convert_chunks(src, ref, chunk_s=0.5,
                                            context_s=4.0, matcher="exact",
                                            post_opt="no_post_opt_0.2"))
    assert len(chunks) >= 3
    streamed = np.concatenate(chunks)
    assert streamed.shape == batch.shape
    dev = np.abs(streamed - batch)
    # selections identical -> only the vocoder margin deviates (same bound
    # as the bucketed bulk vocoder: <=1e-4 + one int16 step)
    assert dev.max() <= 2e-4, dev.max()
    assert (dev == 0).mean() > 0.9


@pytest.mark.slow
def test_stream_chunked_post_opt_bounded_vs_batch(svc_world, tmp_path):
    """Full post_opt_0.2 (CAT + smoothness) chunked stream vs the batch
    path: selections are carried exactly, but the smoothness weights are
    re-solved per window slice, so the outputs agree to a bound rather than
    bit-exactly. The bound below is empirical with margin; a regression
    (e.g. the carry breaking) blows it up by orders of magnitude."""
    root, knn = svc_world
    src, ref = str(root / "src_noise.wav"), str(root / "ref.wav")
    batch_path = knn.convert_pair(src, ref, matcher="exact", fast=True,
                                  post_opt="post_opt_0.2",
                                  output_path=str(tmp_path / "batch.wav"))
    batch = np.asarray(load_audio(batch_path)[0])[0]
    chunks = list(knn.stream_convert_chunks(src, ref, chunk_s=0.5,
                                            context_s=4.0, matcher="exact",
                                            post_opt="post_opt_0.2"))
    assert len(chunks) >= 3
    streamed = np.concatenate(chunks)
    assert streamed.shape == batch.shape
    # relative L2 over the utterance (scale-free: the tiny random vocoder's
    # output RMS is arbitrary)
    rel = (np.linalg.norm(streamed - batch)
           / max(np.linalg.norm(batch), 1e-12))
    assert rel < 0.15, rel


@pytest.mark.slow
def test_stream_single_chunk_sharded_int8_equals_fast_pair(svc_world,
                                                           tmp_path):
    """Streaming composes with the scaled serving matchers: a single-chunk
    stream through the int8-sharded matcher (8-device CPU mesh) is
    bit-identical to the fast pair path with the same matcher."""
    root, knn = svc_world
    src, ref = str(root / "src_sing.wav"), str(root / "ref.wav")
    batch_path = knn.convert_pair(src, ref, matcher="sharded_int8", fast=True,
                                  output_path=str(tmp_path / "batch.wav"))
    batch = np.asarray(load_audio(batch_path)[0])[0]
    chunks = list(knn.stream_convert_chunks(src, ref, chunk_s=2.0,
                                            context_s=0.5,
                                            matcher="sharded_int8"))
    assert len(chunks) == 1
    np.testing.assert_array_equal(chunks[0], batch)


def test_cli_streaming(svc_world, tmp_path, monkeypatch):
    """CLI-level streaming (VERDICT r3 #6): --stream_chunk_s through the
    int8-sharded matcher the hub supports, and through the cached
    incremental encoder (--stream_encoder cached)."""
    root, knn = svc_world
    from knnsvc_tpu.cli import inference as cli
    from knnsvc_tpu.hub import KnnSvc

    monkeypatch.setattr(KnnSvc, "random_init",
                        classmethod(lambda cls, *a, **k: knn))
    src, ref = str(root / "src_sing.wav"), str(root / "ref.wav")

    out = tmp_path / "stream_q8.wav"
    rc = cli.main([src, ref, "--random_init", "true",
                   "--stream_chunk_s", "2.0", "--stream_context_s", "0.5",
                   "--matcher", "sharded_int8", "--out", str(out)])
    assert rc == 0 and out.is_file()
    y, sr = load_audio(out)
    assert sr == 16000 and np.isfinite(np.asarray(y)).all()

    out2 = tmp_path / "stream_cached.wav"
    rc = cli.main([src, ref, "--random_init", "true",
                   "--stream_chunk_s", "0.4", "--stream_context_s", "0.25",
                   "--stream_encoder", "cached", "--matcher", "exact",
                   "--out", str(out2)])
    assert rc == 0 and out2.is_file()
    y2, _ = load_audio(out2)
    y2 = np.asarray(y2)[0]
    assert np.isfinite(y2).all()
    # complete audio: within one hop*2 of the source length
    src_len = len(np.asarray(load_audio(src)[0])[0])
    assert abs(len(y2) - src_len) <= 320 * 2


def test_stream_session_equals_file_stream(svc_world):
    """Push-based live session == file-based stream, bit-identical: feeding
    the utterance in irregular-size pieces and flushing must yield exactly
    the chunks stream_convert_chunks yields (a chunk's output may not
    depend on when its samples arrived)."""
    root, knn = svc_world
    src, ref = str(root / "src_noise.wav"), str(root / "ref.wav")
    wav = np.asarray(load_audio(src)[0])[0]
    kw = dict(chunk_s=0.5, context_s=0.25, matcher="exact")

    batch = np.concatenate(list(knn.stream_convert_chunks(src, ref, **kw)))

    sess = knn.stream_session(ref, **kw)
    rng = np.random.default_rng(11)
    outs, i = [], 0
    while i < len(wav):
        n = int(rng.integers(800, 9000))
        out = sess.push(wav[i : i + n])
        assert out.dtype == np.float32
        outs.append(out)
        i += n
    live_mid = np.concatenate(outs)
    assert len(live_mid) > 0  # mid-stream chunks were emitted incrementally
    outs.append(sess.flush())
    live = np.concatenate(outs)
    np.testing.assert_array_equal(live, batch)
    # session memory stays bounded: trimmed buffer, not the whole stream
    assert len(sess._buf) < len(wav)
    with pytest.raises(RuntimeError):
        sess.push(wav[:100])


def test_stream_session_cached_encoder(svc_world):
    """Live session through the incremental KV-cache encoder equals the
    file-based cached stream (and stays bounded-memory)."""
    root, knn = svc_world
    src, ref = str(root / "src_sing.wav"), str(root / "ref.wav")
    wav = np.asarray(load_audio(src)[0])[0]
    kw = dict(chunk_s=0.3, context_s=0.2, matcher="exact", encoder="cached")

    batch = np.concatenate(list(knn.stream_convert_chunks(src, ref, **kw)))

    sess = knn.stream_session(ref, **kw)
    outs = [sess.push(piece) for piece in np.array_split(wav, 7)]
    outs.append(sess.flush())
    live = np.concatenate(outs)
    np.testing.assert_array_equal(live, batch)


def test_register_anchor_semantics():
    """The property streaming depends on: shifting a CHUNK with the full-
    utterance anchor equals shifting the full utterance and slicing; an
    un-anchored per-chunk shift re-centers every chunk onto the target
    median (the artifact the anchor exists to prevent)."""
    import jax.numpy as jnp

    from knnsvc_tpu.match.f0_logic import (masked_log_median,
                                           shift_f0_to_target_register)

    rng = np.random.default_rng(0)
    full = np.concatenate([140 + 10 * rng.random(40),
                           290 + 20 * rng.random(40)]).astype(np.float32)
    full[::7] = 0.0  # some unvoiced frames
    pool_f0 = (200 + 40 * rng.random(300)).astype(np.float32)

    whole = np.asarray(shift_f0_to_target_register(jnp.asarray(full),
                                                   jnp.asarray(pool_f0)))
    anchor = float(masked_log_median(jnp.asarray(full)))
    chunk = full[40:]
    anchored = np.asarray(shift_f0_to_target_register(
        jnp.asarray(chunk), jnp.asarray(pool_f0), src_log_median=anchor))
    np.testing.assert_allclose(anchored, whole[40:], rtol=1e-6)

    unanchored = np.asarray(shift_f0_to_target_register(
        jnp.asarray(chunk), jnp.asarray(pool_f0)))
    # the chunk's own median differs from the anchor -> different register
    v = chunk > 0
    assert not np.allclose(unanchored[v], whole[40:][v], rtol=1e-3)
