import numpy as np
import pytest

from knnsvc_tpu.io.audio import load_audio, save_audio, resample, to_mono


def test_wav_roundtrip_float(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    path = tmp_path / "t.wav"
    save_audio(path, x, 16000)
    y, sr = load_audio(path)
    assert sr == 16000
    assert y.shape == (1, 16000)
    np.testing.assert_allclose(y[0], x, atol=1e-6)


def test_wav_roundtrip_peak_normalization(tmp_path):
    # ref lib_ongaku_test.py:104-107: only normalize when |x| > 1
    x = np.array([0.0, 2.0, -1.0], dtype=np.float32)
    path = tmp_path / "t.wav"
    save_audio(path, x, 8000)
    y, _ = load_audio(path)
    np.testing.assert_allclose(y[0], [0.0, 1.0, -0.5], atol=1e-6)


def test_wav_stereo_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = np.clip(rng.standard_normal((2, 1000)) * 0.2, -0.9, 0.9).astype(np.float32)
    path = tmp_path / "t.wav"
    save_audio(path, x, 44100)
    y, sr = load_audio(path)
    assert sr == 44100 and y.shape == (2, 1000)
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_load_sample_content(sample_content):
    x, sr = load_audio(sample_content / "Danakil-voice_resampled_16000_cut.wav")
    assert sr == 16000
    assert x.shape[0] in (1, 2)
    assert x.shape[1] > 16000  # at least a second
    assert np.max(np.abs(x)) <= 1.0


def test_pcm16_decode(tmp_path):
    # hand-built PCM16 file
    import struct

    x = np.array([0, 16384, -16384, 32767], dtype="<i2")
    body = x.tobytes()
    header = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    header += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
    header += b"data" + struct.pack("<I", len(body))
    p = tmp_path / "p16.wav"
    p.write_bytes(header + body)
    y, sr = load_audio(p)
    np.testing.assert_allclose(y[0], x.astype(np.float32) / 32768.0, atol=1e-7)


def test_to_mono():
    x = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    np.testing.assert_allclose(to_mono(x), [[2.0, 3.0]])
    np.testing.assert_allclose(to_mono(np.array([1.0, 2.0])), [[1.0, 2.0]])


def test_resample_vs_torchaudio_algorithm():
    """Against torch's own implementation of the identical sinc-resample
    algorithm (torchaudio.functional.resample is pure torch ops; replicated
    here from its published algorithm to validate ours)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4410).astype(np.float32)

    # torch reference implementation (sinc interpolation, width 6, rolloff .99)
    def torch_resample(wave, orig, new):
        import math

        gcd = math.gcd(orig, new)
        orig_g, new_g = orig // gcd, new // gcd
        lowpass_filter_width, rolloff = 6, 0.99
        base_freq = min(orig_g, new_g) * rolloff
        width = math.ceil(lowpass_filter_width * orig_g / base_freq)
        idx = torch.arange(-width, width + orig_g, dtype=torch.float64)[None, None] / orig_g
        t = torch.arange(0, -new_g, -1, dtype=torch.float64)[:, None, None] / new_g + idx
        t *= base_freq
        t = t.clamp_(-lowpass_filter_width, lowpass_filter_width)
        window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
        t *= math.pi
        scale = base_freq / orig_g
        kernels = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64), t.sin() / t)
        kernels *= window * scale
        w = torch.as_tensor(wave, dtype=torch.float64)[None, None]
        import torch.nn.functional as F

        wp = F.pad(w, (width, width + orig_g))
        res = F.conv1d(wp, kernels.to(torch.float64), stride=orig_g)
        res = res.transpose(1, 2).reshape(1, -1)
        target = int(math.ceil(new_g * len(wave) / orig_g))
        return res[0, :target].numpy()

    for orig, new in [(44100, 16000), (22050, 16000), (16000, 8000), (8000, 16000)]:
        ours = resample(x, orig, new)
        theirs = torch_resample(x, orig, new)
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_save_audio_flac_roundtrip(tmp_path):
    """save_audio('.flac') -> load_audio round-trips through the native
    clean-room encoder + decoder (16-bit quantization is the only loss)."""
    rng = np.random.default_rng(3)
    t = np.arange(20000) / 16000
    x = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    p = tmp_path / "rt.flac"
    save_audio(p, x, 16000)
    y, sr = load_audio(p)
    assert sr == 16000
    assert y.shape == (1, len(x))
    assert np.abs(y[0] - x).max() < 1.0 / 32768 + 1e-7
    # and it actually compresses the tonal signal
    import os
    assert os.path.getsize(p) < len(x) * 2


def test_mp3_ingestion():
    """mp3 pool audio decodes (ref accepts .mp3, ddsp_prematch_dataset.py:313).
    Uses the mp3 sample shipped inside the pygame package."""
    pygame = pytest.importorskip("pygame")
    import pathlib

    sample = pathlib.Path(pygame.__file__).parent / "examples" / "data" / "house_lo.mp3"
    if not sample.is_file():
        pytest.skip("pygame example mp3 not present")
    x, sr = load_audio(sample)
    # house_lo.mp3 is MPEG-2.5 11025 Hz mono; accept any valid MPEG rate
    assert sr in (44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000)
    assert x.ndim == 2 and x.shape[1] > sr  # > 1 s of audio
    assert 5.0 < x.shape[1] / sr < 10.0     # known ~7.3 s sample
    assert np.abs(x).max() > 0.1  # real signal, normalized to [-1, 1]
    assert np.abs(x).max() <= 1.0


def test_mp3_export_roundtrip(tmp_path):
    """save_audio('.mp3') encodes via libmp3lame (ref writes mp3 at 320k via
    pydub/ffmpeg/libmp3lame, lib_ongaku_test.py:118-143) and our own
    SDL_mixer read path decodes it back within codec tolerance."""
    pytest.importorskip("pygame")
    sr = 16000
    t = np.arange(3 * sr) / sr
    # chirp + noise floor: aperiodic, so the delay estimate is unambiguous
    rng = np.random.default_rng(0)
    x = (0.4 * np.sin(2 * np.pi * (200 + 600 * t) * t)
         + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    p = tmp_path / "out.mp3"
    save_audio(p, x, sr)
    assert p.stat().st_size > 1000
    y, sr2 = load_audio(p)
    assert sr2 == sr and y.ndim == 2 and y.shape[0] == 1
    y0 = y[0]
    # codec delay: align by cross-correlation against the first half-second
    probe = x[: sr // 2]
    lag = np.argmax(np.correlate(y0[: sr], probe, "valid"))
    n = min(len(x), len(y0) - lag)
    assert n > 2 * sr
    err = y0[lag:lag + n] - x[:n]
    snr = 10 * np.log10(np.sum(x[:n] ** 2) / max(np.sum(err ** 2), 1e-12))
    assert snr > 15.0, f"mp3 round-trip SNR {snr:.1f} dB"
    # CBR 160k (the MPEG-2 LSF clamp of the 320k request): ~20 kB/s
    assert 0.7 * 20000 * 3 < p.stat().st_size < 1.3 * 20000 * 3


def test_mp3_export_stereo(tmp_path):
    pytest.importorskip("pygame")
    sr = 16000
    t = np.arange(sr) / sr
    rng = np.random.default_rng(1)
    x = np.stack([
        0.3 * np.sin(2 * np.pi * (150 + 400 * t) * t),
        0.1 * rng.standard_normal(len(t)),
    ]).astype(np.float32)
    p = tmp_path / "st.mp3"
    save_audio(p, x, sr)
    y, sr2 = load_audio(p)
    assert sr2 == sr and y.shape[0] == 2
    # channels stay distinct (left is tonal, right is noise)
    assert np.mean(np.abs(y[0])) > 2 * np.mean(np.abs(y[1])) or \
        np.std(y[0] - y[1]) > 0.01
