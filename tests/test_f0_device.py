"""Device-resident f0 extractor (dsp/f0_device.py) contract tests.

The extractor is a new capability beside the native Harvest family (no
reference analogue — the reference's f0 is pyworld's C++ Harvest on the
host, ddsp_prematch_dataset.py:121-128): pure-JAX spectral harmonic
summation that runs inside the pool-build dispatch. These tests pin the
OUTPUT CONTRACT it shares with every extractor in dsp/f0.py (length grid,
0 = unvoiced, <80 Hz zeroed) plus its own correctness basics; accuracy
numbers live in tools/f0_accuracy.py / tools/f0_truth_suite.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from knnsvc_tpu.dsp.f0_device import (
    BANDS,
    DeviceF0Params,
    device_f0,
    device_f0_jax,
    _frame,
)

SR = 16000
HOP = 320


def _tone(f0: float, seconds: float = 1.0, n_harm: int = 5,
          seed: int = 0) -> np.ndarray:
    t = np.arange(int(SR * seconds)) / SR
    x = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, n_harm + 1))
    return (0.5 * x / np.abs(x).max()).astype(np.float32)


def test_output_contract_length_and_dtype():
    for n in [SR // 2, SR, SR + 37]:
        f0 = device_f0(np.zeros(n, np.float32), SR)
        assert f0.shape == (n // HOP + 1,)
        assert f0.dtype == np.float32


def test_tones_across_all_bands():
    """One tone per analysis band (65-130/130-260/260-1047) must come out
    voiced at the right pitch to within a few cents."""
    for f in [90.0, 180.0, 440.0, 880.0]:
        f0 = device_f0(_tone(f), SR)
        v = f0[f0 > 0]
        assert len(v) > 0.9 * len(f0), f
        err = 1200 * np.abs(np.log2(np.median(v) / f))
        assert err < 5.0, (f, float(np.median(v)))


def test_noise_and_silence_are_unvoiced():
    rng = np.random.default_rng(0)
    assert (device_f0(rng.standard_normal(SR).astype(np.float32) * 0.3,
                      SR) > 0).sum() == 0
    assert (device_f0(np.zeros(SR, np.float32), SR) > 0).sum() == 0


def test_below_80hz_zeroed():
    """Voiced estimates under F0_ZERO_BELOW are zeroed (the reference's
    contract, ddsp_matcher.py:410-426) even though the grid starts at 65."""
    f0 = device_f0(_tone(70.0), SR)
    assert (f0 == 0).all()


def test_bucket_padding_invariance():
    """The host wrapper pads to a 256-frame bucket; padding frames must not
    leak into the valid range (same audio, different lengths -> same f0 on
    the overlap away from the tail edge)."""
    x = _tone(220.0, seconds=2.0)
    a = device_f0(x, SR)
    b = device_f0(x[: len(x) - SR // 2], SR)
    n = len(b) - 8  # the last frames see different right context
    np.testing.assert_allclose(a[:n], b[:n], rtol=0.01)


def test_traceable_variant_matches_wrapper():
    x = _tone(300.0, seconds=1.0)
    n = len(x) // HOP + 1
    via_jax = np.asarray(device_f0_jax(jnp.asarray(x), SR, n))
    via_host = device_f0(x, SR)
    # the wrapper pads to the bucket, whose forced-unvoiced padding frames
    # add a Viterbi boundary condition at the tail; away from it the two
    # must agree exactly
    np.testing.assert_allclose(via_jax[: n - 8], via_host[: n - 8],
                               rtol=1e-5, atol=1e-3)


def test_knob_change_does_not_recompile():
    """Economics knobs are traced: two different knob settings must reuse
    one compiled core (the tuner's whole design rests on this)."""
    from knnsvc_tpu.dsp.f0_device import _device_f0_core

    x = _tone(200.0)
    base = int(_device_f0_core._cache_size())
    device_f0(x, SR, params=DeviceF0Params())
    after_first = int(_device_f0_core._cache_size())
    device_f0(x, SR, params=DeviceF0Params(unvoiced_cost=0.3, lam=1.0,
                                           subharm3=0.5))
    assert int(_device_f0_core._cache_size()) == after_first > base - 1


def test_octave_robustness_formant_boosted_third():
    """A tone whose 3rd harmonic dominates (vowel-formant shape) must not
    be reported an octave+fifth up — the subharm3 cross-candidate penalty
    exists for exactly this (module docstring)."""
    t = np.arange(SR) / SR
    f = 218.0
    amps = {1: 0.25, 2: 0.3, 3: 1.0, 4: 0.5, 5: 0.2}
    x = sum(a * np.sin(2 * np.pi * f * k * t) for k, a in amps.items())
    x = (0.5 * x / np.abs(x).max()).astype(np.float32)
    f0 = device_f0(x, SR)
    v = f0[f0 > 0]
    assert len(v) > 0.8 * len(f0)
    err = 1200 * np.abs(np.log2(np.median(v) / f))
    assert err < 50.0, float(np.median(v))


def test_frame_centers():
    """Frame i is centered at sample i*hop: a click at sample k*hop has its
    energy peak in frame k of the framing helper."""
    x = np.zeros(SR, np.float32)
    x[10 * HOP] = 1.0
    w = DeviceF0Params().window
    frames = np.asarray(_frame(jnp.asarray(x), len(x) // HOP + 1, w, HOP))
    assert frames[10, w // 2] == 1.0  # dead center of frame 10


def test_bands_cover_grid():
    lo = min(b[0] for b in BANDS)
    hi = max(b[1] for b in BANDS)
    from knnsvc_tpu.dsp.f0_device import F0_CEIL, F0_FLOOR

    assert lo <= F0_FLOOR and hi >= F0_CEIL


def test_distance_transform_matches_bruteforce():
    """_dt_min is the O(C) lower envelope of dv[i] + lam*|i-j|; it must
    equal the brute-force O(C^2) min (and a valid argmin) exactly."""
    import jax

    from knnsvc_tpu.dsp.f0_device import _dt_min

    rng = np.random.default_rng(3)
    for C in [1, 2, 7, 64]:
        dv = rng.standard_normal(C).astype(np.float32) * 3
        lam = np.float32(0.23)
        ramp = jnp.arange(C, dtype=jnp.float32)
        best, arg = jax.jit(_dt_min)(jnp.asarray(dv), jnp.float32(lam), ramp)
        best, arg = np.asarray(best), np.asarray(arg)
        ii = np.arange(C)
        ref = (dv[:, None] + lam * np.abs(ii[:, None] - ii[None, :])).min(0)
        np.testing.assert_allclose(best, ref, rtol=1e-6, atol=1e-6)
        # argmin validity (ties allowed): achieved value == min
        achieved = dv[arg] + lam * np.abs(arg - ii)
        np.testing.assert_allclose(achieved, ref, rtol=1e-6, atol=1e-6)


def test_viterbi_matches_bruteforce_dp():
    """The scan Viterbi (distance-transform transitions + unvoiced state)
    must reproduce a reference numpy DP's optimal path cost."""
    import jax

    from knnsvc_tpu.dsp.f0_device import _viterbi

    rng = np.random.default_rng(5)
    N, C = 12, 9
    cost_v = rng.standard_normal((N, C)).astype(np.float32)
    cost_u = rng.standard_normal(N).astype(np.float32) * 0.5
    lam_s, switch = np.float32(0.31), np.float32(0.4)

    states = np.asarray(jax.jit(_viterbi)(jnp.asarray(cost_v),
                                          jnp.asarray(cost_u),
                                          jnp.float32(lam_s),
                                          jnp.float32(switch)))

    # brute-force DP over C+1 states
    ii = np.arange(C)
    trans = lam_s * np.abs(ii[:, None] - ii[None, :])
    d = np.concatenate([cost_v[0], [cost_u[0]]])
    for t in range(1, N):
        nd = np.empty(C + 1)
        for j in range(C):
            nd[j] = min((d[:C] + trans[:, j]).min(), d[C] + switch) + cost_v[t, j]
        nd[C] = min(d[C], d[:C].min() + switch) + cost_u[t]
        d = nd
    opt = d.min()

    # cost of the returned path must equal the DP optimum
    got = (cost_v[0, states[0]] if states[0] < C else cost_u[0])
    for t in range(1, N):
        a, b = states[t - 1], states[t]
        if a < C and b < C:
            got += trans[a, b]
        elif (a == C) != (b == C):
            got += switch
        got += cost_v[t, b] if b < C else cost_u[t]
    np.testing.assert_allclose(got, opt, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_device_f0_heldout_suite_regression(tmp_path):
    """Out-of-sample accuracy lock for the device extractor (same protocol
    as test_f0.py's Harvest locks): the synthetic known-f0 HELD-OUT split
    (deterministic seed, never used for tuning) must stay at the round-5
    grade. Baked knobs measured P 1.000 / R .949 / w50 .974 / 0.51c;
    bounds leave headroom for platform noise, not regressions."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import f0_truth_suite as suite

    suite.generate(str(tmp_path), "heldout")
    stats = suite.evaluate(str(tmp_path), "heldout", "device")
    assert stats["precision"] > 0.97, stats
    assert stats["recall"] > 0.91, stats
    assert stats["within_50_cents"] > 0.94, stats
    assert stats["median_cents"] < 1.5, stats
