"""f0 extraction tests: sidecar handling, YIN fallback, native worldline DIO."""

import numpy as np
import pytest

from knnsvc_tpu.dsp.f0 import get_f0, load_f0_sidecar, save_f0_sidecar, yin_f0


def _tone(freq, seconds=1.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    return (0.4 * np.sin(2 * np.pi * freq * t) + 0.005 * rng.standard_normal(len(t))).astype(np.float32)


def test_yin_on_tone():
    sr = 16000
    f0 = yin_f0(_tone(220.0), sr)
    assert f0.shape == (sr // 320 + 1,)
    v = f0[f0 > 0]
    assert len(v) > 20
    assert abs(np.median(v) - 220.0) < 5.0


def test_sidecar_roundtrip(tmp_path):
    from knnsvc_tpu.io.audio import save_audio

    wav = _tone(200.0)
    p = tmp_path / "a.wav"
    save_audio(p, wav, 16000)
    assert load_f0_sidecar(str(p)) is None
    f0 = get_f0(wav, 16000, audio_path=str(p))
    cached = load_f0_sidecar(str(p))
    np.testing.assert_array_equal(cached, f0)
    # second call loads the cache bit-identically
    f0b = get_f0(wav, 16000, audio_path=str(p))
    np.testing.assert_array_equal(f0b, f0)


def test_worldline_native_extractor():
    harvest = pytest.importorskip("knnsvc_tpu.dsp.harvest")
    try:
        f0 = harvest.harvest_f0(_tone(220.0), 16000)
    except OSError:
        pytest.skip("native toolchain unavailable")
    v = f0[f0 > 0]
    assert len(v) > 20
    # the phase-advance refinement should be near-exact on a clean tone
    assert abs(np.median(v) - 220.0) < 1.0
    # no octave/subharmonic selections anywhere on a clean tone
    assert np.all(np.abs(np.log2(v / 220.0)) < 0.2)
    # frame layout matches pyworld's
    assert f0.shape == (16000 // 320 + 1,)


def test_worldline_fast_dio_extractor():
    harvest = pytest.importorskip("knnsvc_tpu.dsp.harvest")
    try:
        f0 = harvest.dio_f0(_tone(220.0), 16000)
    except OSError:
        pytest.skip("native toolchain unavailable")
    v = f0[f0 > 0]
    assert len(v) > 20
    assert abs(np.median(v) - 220.0) < 1.0
    assert f0.shape == (16000 // 320 + 1,)


def test_worldline_unvoiced_noise():
    harvest = pytest.importorskip("knnsvc_tpu.dsp.harvest")
    rng = np.random.default_rng(1)
    noise = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    try:
        f0 = harvest.harvest_f0(noise, 16000)
    except OSError:
        pytest.skip("native toolchain unavailable")
    # noise should be mostly unvoiced
    assert (f0 > 0).mean() < 0.3


def test_worldline_matches_shipped_harvest_sidecar(sample_content):
    harvest = pytest.importorskip("knnsvc_tpu.dsp.harvest")
    from knnsvc_tpu.io.audio import load_audio, to_mono

    x, sr = load_audio(sample_content / "Tiken_lead_07_resampled_16000_cut.wav")
    x = to_mono(x)[0][: sr * 15]  # 15 s slice keeps the test fast
    ref = np.load(sample_content / "Tiken_lead_07_resampled_16000_cut_f0.npy")[: len(x) // 320 + 1]
    try:
        ours = harvest.harvest_f0(x, sr)
    except OSError:
        pytest.skip("native toolchain unavailable")
    both = (ours > 0) & (ref > 0)
    assert both.sum() > 200
    cents = 1200 * np.abs(np.log2(ours[both] / ref[both]))
    # achieved grade (see native/harvest/harvest.cc header): full-pair
    # numbers P .953 / R .929 / 88% within 50 cents / median 1.8 cents;
    # bounds below are looser because this is a 15-s slice of one file
    assert np.median(cents) < 4.0
    assert (cents < 50).mean() > 0.84
    # voicing agreement
    rv, ov = ref > 0, ours > 0
    precision = (rv & ov).sum() / ov.sum()
    recall = (rv & ov).sum() / rv.sum()
    assert precision > 0.88 and recall > 0.85, (precision, recall)


def test_fast_method_does_not_poison_parity_sidecar(tmp_path):
    """A fast-method (DIO/YIN) run must never write the reference-convention
    `<stem>_f0.npy` sidecar that the parity Harvest path trusts; it caches
    under a method-suffixed name, while a pre-existing parity sidecar is
    preferred by every method."""
    import numpy as np

    from knnsvc_tpu.dsp.f0 import get_f0
    from knnsvc_tpu.io.audio import save_audio

    sr = 16000
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = tmp_path / "utt.wav"
    save_audio(p, wav, sr)

    f0_fast = get_f0(wav, sr, audio_path=str(p), method="yin")
    assert not (tmp_path / "utt_f0.npy").exists()
    assert (tmp_path / "utt_f0_yin.npy").exists()

    # the fast cache is reused on the next fast call
    again = get_f0(np.zeros_like(wav), sr, audio_path=str(p), method="yin")
    np.testing.assert_array_equal(f0_fast, again)

    # a parity sidecar, once present, wins for every method
    parity = np.full_like(f0_fast, 123.0)
    np.save(tmp_path / "utt_f0.npy", parity)
    got = get_f0(wav, sr, audio_path=str(p), method="yin")
    np.testing.assert_array_equal(got, parity)


@pytest.mark.slow
def test_harvest_heldout_suite_regression(tmp_path):
    """Out-of-sample accuracy lock: the synthetic known-f0 HELD-OUT split
    (deterministic seed, never used for tuning) must stay at the round-3
    grade. Guards against gate/DP regressions that the two-sidecar test
    cannot see (it was part of the tuning truth)."""
    harvest = pytest.importorskip("knnsvc_tpu.dsp.harvest")
    try:
        harvest.harvest_f0(_tone(220.0), 16000)
    except OSError:
        pytest.skip("native toolchain unavailable")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import f0_truth_suite as suite

    suite.generate(str(tmp_path), "heldout")
    stats = suite.evaluate(str(tmp_path), "heldout", "harvest")
    # round-3 baked defaults measured P .991 / R .996 / w50 .936 / 0.34c;
    # bounds leave headroom for platform noise, not for regressions
    assert stats["precision"] > 0.97, stats
    assert stats["recall"] > 0.98, stats
    assert stats["within_50_cents"] > 0.90, stats
    assert stats["median_cents"] < 1.0, stats


@pytest.mark.slow
def test_harvest_fast_heldout_suite_regression(tmp_path):
    """Same out-of-sample lock for the BUDGET Harvest (the serving fast
    path, worldline_harvest_fast): round-4 baked grid+gates measured
    P .993 / R .9995 / w50 .922 / 0.67c at ~130x RT on one core
    (VERDICT r3 #3 target: >=.90 recall / >=.88 w50 held-out, >=100x RT —
    RT is recorded in BASELINE.md; quality is locked here)."""
    harvest = pytest.importorskip("knnsvc_tpu.dsp.harvest")
    try:
        harvest.harvest_fast_f0(_tone(220.0), 16000)
    except OSError:
        pytest.skip("native toolchain unavailable")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import f0_truth_suite as suite

    suite.generate(str(tmp_path), "heldout")
    stats = suite.evaluate(str(tmp_path), "heldout", "fast")
    assert stats["precision"] > 0.97, stats
    assert stats["recall"] > 0.97, stats
    assert stats["within_50_cents"] > 0.89, stats
    assert stats["median_cents"] < 1.5, stats
