"""DevicePool deferred-f0 semantics (VERDICT r4 #3 / ADVICE r4).

build_device_pool kicks the native f0 extraction onto a background thread
and the pool joins it LAZILY at first .f0/.harmonics access — these tests
pin that contract: join ordering, worker-exception propagation (including
repeat access after a failure), thread-safe concurrent materialization,
executor reuse, the short-f0 sanity check, and the encode/f0 overlap claim
(match/pool.py DevicePool docstring)."""

import logging
import threading
import time

import numpy as np
import pytest

import jax

from knnsvc_tpu.config import WavLMConfig
from knnsvc_tpu.match import pool as pool_mod
from knnsvc_tpu.match.pool import build_device_pool, _f0_executor
from knnsvc_tpu.models.wavlm import init_wavlm_params
from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index

from test_pipeline import SMALL_WAVLM, _sing

SR = 16000


@pytest.fixture(scope="module")
def tiny_encoder():
    cfg = WavLMConfig.from_dict(SMALL_WAVLM)
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    weights = generate_matrix_from_index(2, size=cfg.encoder_layers + 1)
    wav = _sing(SR, 1.0, 190, seed=7)
    # warm the encode compile so overlap timing below measures dispatch, not
    # XLA compilation
    build_device_pool(wav, params, cfg, weights, weights, SR)
    return cfg, params, weights, wav


def _good_f0(x, sr, **kw):
    return np.full(len(x) // 320 + 8, 200.0, dtype=np.float32)


def test_lazy_join_ordering(tiny_encoder, monkeypatch):
    """f0 must NOT be materialized by the build or by feature access — only
    the first .f0/.harmonics access joins the background thread."""
    cfg, params, weights, wav = tiny_encoder
    joined = threading.Event()

    def slow_f0(x, sr, **kw):
        time.sleep(0.3)
        joined.set()
        return _good_f0(x, sr)

    monkeypatch.setattr(pool_mod, "get_f0", slow_f0)
    pool = build_device_pool(wav, params, cfg, weights, weights, SR)
    assert pool._f0 is None and pool._harmonics is None
    assert pool._f0_future is not None
    _ = pool.matching.shape, pool.synth.shape  # feature access: still lazy
    assert pool._f0 is None

    f0 = pool.f0
    assert joined.is_set()
    T = pool.matching.shape[0]
    assert f0.shape == (T,)
    assert pool.harmonics.shape == (T, 49)
    assert pool._f0_future is None and pool._spec is None  # released


def test_overlap_f0_off_critical_path(tiny_encoder, monkeypatch):
    """The build must return while a slow extractor is still running (the
    docstring's overlap claim): build wall << extractor wall, and the future
    is not yet done at return."""
    cfg, params, weights, wav = tiny_encoder
    sleep_s = 3.0

    def slow_f0(x, sr, **kw):
        time.sleep(sleep_s)
        return _good_f0(x, sr)

    monkeypatch.setattr(pool_mod, "get_f0", slow_f0)
    t0 = time.time()
    pool = build_device_pool(wav, params, cfg, weights, weights, SR)
    build_wall = time.time() - t0
    still_running = not pool._f0_future.done()
    assert build_wall < sleep_s, (build_wall, sleep_s)
    assert still_running, "f0 finished before the (warm) encode dispatch?"
    # the join itself completes and costs at most the extractor's remainder
    t0 = time.time()
    _ = pool.f0
    assert time.time() - t0 < sleep_s + 1.0


def test_worker_exception_propagates_every_access(tiny_encoder, monkeypatch,
                                                  caplog):
    """A failed extraction raises the REAL error at .f0 access — and again
    (not AttributeError) on later accesses; the done-callback leaves a log
    line even if the pool is never joined."""
    cfg, params, weights, wav = tiny_encoder

    def bad_f0(x, sr, **kw):
        raise RuntimeError("boom: native extractor exploded")

    monkeypatch.setattr(pool_mod, "get_f0", bad_f0)
    with caplog.at_level(logging.WARNING, logger="knnsvc_tpu.match.pool"):
        pool = build_device_pool(wav, params, cfg, weights, weights, SR)
        with pytest.raises(RuntimeError, match="boom"):
            _ = pool.f0
        with pytest.raises(RuntimeError, match="boom"):  # not AttributeError
            _ = pool.harmonics
        # never-joined failure still logs (ADVICE r4: silent swallow)
        pool2 = build_device_pool(wav, params, cfg, weights, weights, SR)
        deadline = time.time() + 5.0
        while time.time() < deadline and not any(
                "background f0 extraction failed" in r.message
                for r in caplog.records):
            time.sleep(0.05)
        del pool2
    assert any("background f0 extraction failed" in r.message
               for r in caplog.records)


def test_short_f0_raises_clear_message(tiny_encoder, monkeypatch):
    """A truncated/mismatched f0 must fail at materialization with the
    lengths in the message, not as a shape error inside jitted code."""
    cfg, params, weights, wav = tiny_encoder
    monkeypatch.setattr(pool_mod, "get_f0",
                        lambda x, sr, **kw: np.zeros(3, np.float32))
    pool = build_device_pool(wav, params, cfg, weights, weights, SR)
    with pytest.raises(AssertionError, match="f0 shorter than pool"):
        _ = pool.f0


def test_concurrent_first_access_thread_safe(tiny_encoder, monkeypatch):
    """Concurrent first accesses to .f0 and .harmonics race into
    _materialize — the lock must serialize them (ADVICE r4: the unlocked
    version AttributeError'd on the cleared future)."""
    cfg, params, weights, wav = tiny_encoder

    def slow_f0(x, sr, **kw):
        time.sleep(0.2)
        return _good_f0(x, sr)

    monkeypatch.setattr(pool_mod, "get_f0", slow_f0)
    for _ in range(3):  # a few shots at the race window
        pool = build_device_pool(wav, params, cfg, weights, weights, SR)
        errors, results = [], {}

        def grab(attr, pool=pool, errors=errors, results=results):
            try:
                results[attr] = getattr(pool, attr)
            except Exception as e:  # noqa: BLE001 - recorded for the assert
                errors.append((attr, e))

        threads = [threading.Thread(target=grab, args=(a,))
                   for a in ("f0", "harmonics")]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        T = pool.matching.shape[0]
        assert results["f0"].shape == (T,)
        assert results["harmonics"].shape == (T, 49)


def test_f0_executor_is_shared_single_worker():
    """One background worker, reused across pools — extraction order stays
    FIFO and thread count doesn't grow with pool count."""
    ex = _f0_executor()
    assert ex is _f0_executor()
    assert ex._max_workers == 1


def test_int16_upload_close_to_float32(tiny_encoder):
    """upload_dtype='int16' halves the waveform upload; the dequantized
    features must sit within the -96 dBFS quantization-noise budget of the
    float32 path (wiring + quality bound for the congested-tunnel mode)."""
    cfg, params, weights, wav = tiny_encoder
    a = build_device_pool(wav, params, cfg, weights, weights, SR)
    b = build_device_pool(wav, params, cfg, weights, weights, SR,
                          upload_dtype="int16")
    ma, mb = np.asarray(a.matching), np.asarray(b.matching)
    assert ma.shape == mb.shape
    dev = float(np.max(np.abs(ma - mb)))
    assert dev < 1e-2 * float(np.std(ma)), dev
    sa, sb = np.asarray(a.spec), np.asarray(b.spec)
    assert float(np.max(np.abs(sa - sb))) < 1e-3, "spec must barely move"


def test_device_f0_method_fused(tiny_encoder, monkeypatch):
    """f0_method='device' fuses the extractor into the pool-build dispatch:
    no background thread at all, f0 materialized eagerly, and per-chunk
    values matching the standalone device_f0 on the same audio (away from
    the bucket-padding tail — see test_f0_device.py)."""
    from knnsvc_tpu.dsp.f0_device import device_f0

    cfg, params, weights, wav = tiny_encoder

    def boom(*a, **kw):  # the host extractor must never be called
        raise AssertionError("host get_f0 called on the device-f0 path")

    monkeypatch.setattr(pool_mod, "get_f0", boom)
    pool = build_device_pool(wav, params, cfg, weights, weights, SR,
                             f0_method="device")
    assert pool._f0_future is None
    T = pool.matching.shape[0]
    assert pool.f0.shape == (T,)
    assert pool.harmonics.shape == (T, 49)
    ref = device_f0(wav, SR)[:T]
    got = np.asarray(pool.f0)
    # identical pipeline, different padding tail: compare away from it
    np.testing.assert_allclose(got[: T - 8], ref[: T - 8], rtol=0.01,
                               atol=0.5)


@pytest.mark.slow  # second dtype retrace of the fused encode+f0 program
def test_device_f0_method_int16_upload(tiny_encoder, monkeypatch):
    """The fused device-f0 path composes with int16 uploads (dequantize +
    f0 on device; the serving fast config)."""
    cfg, params, weights, wav = tiny_encoder
    monkeypatch.setattr(pool_mod, "get_f0", None)  # must not be touched
    pool = build_device_pool(wav, params, cfg, weights, weights, SR,
                             f0_method="device", upload_dtype="int16")
    T = pool.matching.shape[0]
    assert pool.f0.shape == (T,)
    v = np.asarray(pool.f0)
    assert np.isfinite(v).all() and (v >= 0).all()
