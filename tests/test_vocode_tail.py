"""Bound the bucket-padding deviation of the batched/bucketed vocode paths.

vocode_batch (host bulk batch mode) and _vocode_device_bucketed (device
fast-bulk mode) pad ConversionFeatures to frame buckets before vocoding and
crop to the true length. Padding can only perturb output samples within the
generator's receptive field of the pad boundary; measured on random
full-graph weights (worst case — no trained attenuation) the deviation vs
per-utterance vocoding is <= ~2.5e-5 per sample and exactly 0 when the
length already sits on a bucket boundary. This test pins the production
bound asserted in hub.py's docstrings: 1e-4 absolute per sample.
"""

import numpy as np
import pytest

import jax

from knnsvc_tpu.config import HiFiGANConfig, ModelFamily, WavLMConfig
from knnsvc_tpu.hub import KnnSvc
from knnsvc_tpu.match.pipeline import ConversionFeatures
from knnsvc_tpu.models.hifigan import init_generator_params
from knnsvc_tpu.models.wavlm import init_wavlm_params

from tests.test_pipeline import SMALL_HIFIGAN, SMALL_WAVLM

BOUND = 1e-4          # documented per-sample bound (hub.vocode_batch)
INT16_Q = 1.0 / 32768  # device path quantizes the download to 16-bit


@pytest.fixture(scope="module")
def tiny_vocoder():
    cfg = WavLMConfig.from_dict(SMALL_WAVLM)
    h = HiFiGANConfig.from_dict(SMALL_HIFIGAN)
    return KnnSvc(
        init_wavlm_params(jax.random.PRNGKey(0), cfg), cfg,
        init_generator_params(jax.random.PRNGKey(1), h, ModelFamily.MIX), h,
        ckpt_type="mix",
    )


def _feats(rng, T, dim):
    return ConversionFeatures(
        rng.normal(size=(T, dim)).astype(np.float32),
        np.abs(rng.normal(200, 30, size=(T,))).astype(np.float32),
        np.abs(rng.normal(0.1, 0.05, size=(T, 49))).astype(np.float32),
    )


def test_vocode_batch_deviation_bound(tiny_vocoder):
    """Batched bucketed vocode matches per-utterance vocode within BOUND at
    every sample — including mixed lengths, heavy padding (T=101 -> 250) and
    an exact bucket (T=250, must be bit-identical)."""
    knn = tiny_vocoder
    rng = np.random.default_rng(0)
    feats = [_feats(rng, T, 64) for T in (437, 250, 101)]
    refs = [knn.vocode(f.out_feats_weighted, f.shifted_query_f0,
                       f.harmonics_out_feats_weighted) for f in feats]
    batched = knn.vocode_batch(feats)
    for f, ref, got in zip(feats, refs, batched):
        assert got.shape == ref.shape
        dev = float(np.abs(ref - got).max())
        assert dev <= BOUND, (len(f.out_feats_weighted), dev)
    # exact-bucket utterance: no padding, so no deviation at all
    assert float(np.abs(refs[1] - batched[1]).max()) == 0.0


def test_device_bucketed_deviation_bound(tiny_vocoder):
    """The fast-bulk device vocode (bucket pad + int16 download) stays within
    BOUND + one int16 quantization step of the fp32 per-utterance path."""
    knn = tiny_vocoder
    rng = np.random.default_rng(1)
    for T in (437, 101):
        f = _feats(rng, T, 64)
        ref = knn.vocode(f.out_feats_weighted, f.shifted_query_f0,
                         f.harmonics_out_feats_weighted)
        got = knn._vocode_device_bucketed(f)
        assert got.shape == ref.shape
        dev = float(np.abs(ref - got).max())
        assert dev <= BOUND + INT16_Q, (T, dev)
