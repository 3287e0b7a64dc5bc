import numpy as np
import pytest

import jax.numpy as jnp

from knnsvc_tpu.dsp.stft import stft_magnitude, linear_spectrogram, log_mel_spectrogram, mel_filterbank
from knnsvc_tpu.dsp.synth import (
    upsample_nearest,
    upsample_bicubic,
    remove_above_nyquist,
    harmonic_synth,
    harmonic_synth_zero_phase,
    sine_excitation,
    wrapped_phase_cumsum,
)


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def test_stft_magnitude_vs_torch(torch):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(6400).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(x), n_fft=400, hop_length=320, center=True, power=1.0))
    ref = torch.stft(
        torch.tensor(x), n_fft=400, hop_length=320, window=torch.hann_window(400),
        center=True, pad_mode="reflect", return_complex=True,
    ).abs().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_linear_spectrogram_pool_layout():
    x = jnp.zeros(3200)
    spec = linear_spectrogram(x)
    # n_frames = T//hop + 1 (center), dim = n_fft//2 (Nyquist dropped)
    assert spec.shape == (3200 // 320 + 1, 200)


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has support
    assert np.all(fb.sum(axis=1) > 0)
    # slaney normalization: peak of each triangle ~ 2/bandwidth, so areas ~equal
    areas = fb.sum(axis=1)
    assert areas.std() / areas.mean() < 0.2


def test_log_mel_vs_torch_manual(torch):
    """Full parity: reflect pad + |stft| + slaney mel + log-clamp computed with
    torch ops (the reference's LogMelSpectrogram, ddsp_matcher.py:274-298)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(9600).astype(np.float32)
    n_fft, hop, win, n_mels = 1024, 320, 1024, 80

    ours = np.asarray(log_mel_spectrogram(jnp.asarray(x)[None]))[0]

    xt = torch.tensor(x)[None]
    pad = (n_fft - hop) // 2
    xt = torch.nn.functional.pad(xt, (pad, pad), mode="reflect")[0]
    spec = torch.stft(
        xt, n_fft, hop, win_length=win, window=torch.hann_window(win),
        center=False, return_complex=True,
    ).abs()
    fb = torch.tensor(mel_filterbank(16000, n_fft, n_mels, 0.0, 8000.0))
    mel = fb @ spec
    ref = torch.log(torch.clamp(mel, min=1e-5)).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_upsample_nearest_vs_torch(torch):
    rng = np.random.default_rng(2)
    sig = rng.standard_normal((2, 7, 3)).astype(np.float32)
    ours = np.asarray(upsample_nearest(jnp.asarray(sig), 5))
    t = torch.tensor(sig).transpose(1, 2)  # (B, C, T)
    ref = torch.nn.functional.interpolate(t, size=t.shape[-1] * 5).transpose(1, 2).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_upsample_bicubic_vs_torch(torch):
    rng = np.random.default_rng(3)
    sig = rng.standard_normal((2, 9, 4)).astype(np.float32)
    factor = 320
    ours = np.asarray(upsample_bicubic(jnp.asarray(sig), factor))
    # ref ddsp_prematch_dataset.py:135-141
    t = torch.tensor(sig).transpose(1, 2)  # (B, C, T)
    ref = (
        torch.nn.functional.interpolate(t[:, :, None], size=(1, t.shape[-1] * factor), mode="bicubic")
        .squeeze(2)
        .transpose(1, 2)
        .numpy()
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_remove_above_nyquist(reference, torch):
    rng = np.random.default_rng(4)
    amp = rng.random((2, 11, 49)).astype(np.float32)
    pitch = (rng.random((2, 11, 1)) * 800).astype(np.float32)
    ours = np.asarray(remove_above_nyquist(jnp.asarray(amp), jnp.asarray(pitch), 16000))
    ref = reference.prematch.remove_above_nyquist(
        torch.tensor(amp), torch.tensor(pitch), 16000
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_wrapped_phase_cumsum_matches_fp64():
    rng = np.random.default_rng(5)
    step = (rng.random((1, 60_000, 1)) * 0.07).astype(np.float32)
    ours = np.asarray(wrapped_phase_cumsum(jnp.asarray(step), axis=1))[0, :, 0]
    c = np.cumsum(step[0, :, 0].astype(np.float64))
    ref = c - np.round(c)
    # naive fp32 cumsum would drift by ~1e-2 at this length; wrap-scan stays tight
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_harmonic_synth_vs_reference(reference, torch):
    rng = np.random.default_rng(6)
    T = 40
    f0 = np.zeros((1, T, 1), dtype=np.float32)
    f0[0, 5:30, 0] = 220.0 + 30 * rng.random(25)
    amp = (rng.random((1, T, 49)) * 0.1).astype(np.float32)

    ours = np.asarray(harmonic_synth(jnp.asarray(f0), jnp.asarray(amp)))
    ref = reference.prematch.get_bulk_dsp_choral(
        torch.tensor(f0), torch.tensor(amp), sample_rate=16000, hop_size=320
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_harmonic_synth_zero_phase_vs_reference(reference, torch):
    rng = np.random.default_rng(7)
    T = 30
    f0 = np.zeros((2, T), dtype=np.float32)
    f0[:, 4:25] = 300.0 + 50 * rng.random((2, 21))
    # n_harm=1: the reference's own `amp[f0[..., None] == 0] = 0`
    # (ddsp_prematch_dataset.py:220) IndexErrors for n_harm > 1, so parity is
    # only checkable at 1 harmonic; our broadcasting version handles any N.
    amp = (rng.random((2, T, 1)) * 0.2).astype(np.float32)
    ours = np.asarray(harmonic_synth_zero_phase(jnp.asarray(f0), jnp.asarray(amp)))
    ref = reference.prematch.get_bulk_dsp(
        torch.tensor(f0), torch.tensor(amp), sample_rate=16000, hop_size=320, dsp_type="sin"
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_sine_excitation_matches_f0_only_variant(torch):
    """ref hifigan/ddsp_models_f0.py:344-352 computed with torch ops."""
    rng = np.random.default_rng(8)
    T = 25
    f0 = (rng.random((1, T, 1)) * 400).astype(np.float32)
    ours = np.asarray(sine_excitation(jnp.asarray(f0)))

    t = torch.tensor(f0).transpose(1, 2)
    pitch = torch.nn.functional.interpolate(t, size=t.shape[-1] * 320).transpose(1, 2)
    omega = torch.cumsum(pitch.double() / 16000, dim=1)
    import math

    omega = (2 * math.pi * (omega - torch.round(omega))).float()
    ref = torch.sin(omega).transpose(1, 2).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)
