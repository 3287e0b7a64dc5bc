"""Audio -> pools A/B vs the reference's REAL pool builder (VERDICT r4 #5).

Runs the reference's actual `get_complete_spk_pool` + `get_full_wavlm_features`
(ref ddsp_prematch_dataset.py:269-414) against our `build_speaker_pool` on the
SAME wav files with SHARED random WavLM weights (converted through
io/checkpoints.py) and shared `<stem>_f0.npy` sidecars, and asserts all six
pools align — closing the one reference boundary that test_pipeline_parity.py
monkeypatches on both sides. Covers:

  - the 30-s chunk boundary (a >30-s utterance: ref :275-295 pad quirk + concat)
  - the continuous-spectrogram / chunked-feature row alignment (ref :361-366)
  - the harmonic-amplitude gather on the 8x-interpolated spectrum (ref :391-404)
  - folder mode + `duration_limit` cut-after-crossing semantics (ref :408-411)
  - both weighting paths: one-hot (our early-exit encoder) and dense all-layer

The reference's torchaudio import is a stub in this env (conftest); the test
fills in the three names the pool builder touches — load / functional.resample
/ transforms.Spectrogram — with exact-semantics substitutes built on this
repo's WAV codec and torch.stft (torchaudio.transforms.Spectrogram IS
torch.stft with hann window, center=True, pad_mode='reflect', power=1).
pyworld is never reached: both sides read the pre-written parity sidecars.
"""

import sys

import numpy as np
import pytest

from knnsvc_tpu.config import WavLMConfig
from knnsvc_tpu.io.audio import save_audio
from knnsvc_tpu.io.checkpoints import convert_wavlm_state_dict
from knnsvc_tpu.match.pool import build_speaker_pool
from knnsvc_tpu.utils.layer_weights import generate_matrix_from_index

from test_pipeline import SMALL_WAVLM, _sing

SR = 16000
HOP = 320


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


@pytest.fixture(scope="module")
def wavlm_pair(reference, torch):
    """One set of random weights, both frameworks (conv stride 320 so the
    reference's audio/spec/f0 alignment asserts hold exactly as on Large)."""
    d = dict(SMALL_WAVLM)
    d.update(dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
             encoder_layerdrop=0.0, dropout_input=0.0, dropout_features=0.0,
             feature_grad_mult=0.0, mask_prob=0.0, mask_channel_prob=0.0,
             normalize=True)
    torch.manual_seed(0)
    ref_cfg = reference.wavlm_mod.WavLMConfig(d)
    model = reference.wavlm_mod.WavLM(ref_cfg).eval()
    cfg = WavLMConfig.from_dict(d)
    params = convert_wavlm_state_dict(model.state_dict(), cfg)
    return model, params, cfg


@pytest.fixture()
def ref_torchaudio(reference, torch, monkeypatch):
    """Fill the stubbed torchaudio module with exact-semantics substitutes."""
    from knnsvc_tpu.io.audio import load_audio

    def ta_load(path):
        x, sr = load_audio(path)
        return torch.tensor(x), sr

    class Spectrogram:
        # torchaudio defaults: win_length=n_fft, hann window, normalized
        # False, onesided, pad_mode reflect
        def __init__(self, n_fft, hop_length, center=True, power=1):
            self.n_fft, self.hop, self.center, self.power = (
                n_fft, hop_length, center, power)

        def __call__(self, x):
            s = torch.stft(x, self.n_fft, hop_length=self.hop,
                           win_length=self.n_fft,
                           window=torch.hann_window(self.n_fft),
                           center=self.center, pad_mode="reflect",
                           normalized=False, onesided=True,
                           return_complex=True).abs()
            return s if self.power == 1 else s ** self.power

    monkeypatch.setattr(sys.modules["torchaudio"], "load", ta_load,
                        raising=False)
    monkeypatch.setattr(sys.modules["torchaudio.transforms"], "Spectrogram",
                        Spectrogram, raising=False)
    monkeypatch.setattr(sys.modules["torchaudio.functional"], "resample",
                        lambda x, sr, to: (_ for _ in ()).throw(
                            AssertionError("test audio is already 16 kHz")),
                        raising=False)


def _write_utt(path, seconds, f0_hz, seed):
    """Write a synthetic singing wav + its parity f0 sidecar (shared by both
    sides, like the reference's cached `_f0.npy` files)."""
    from knnsvc_tpu.dsp.f0 import get_f0

    wav = _sing(SR, seconds, f0_hz, seed)
    save_audio(path, wav, SR)
    f0 = get_f0(wav, SR, audio_path=None, method="fast", use_sidecar=False,
                write_sidecar=False)
    np.save(str(path).rsplit(".", 1)[0] + "_f0.npy",
            np.asarray(f0, dtype=np.float32))
    return wav


def _run_reference_pool(reference, torch, path, model, weights_np,
                        duration_limit=None):
    w = torch.tensor(weights_np)[:, None]  # ref main: (L+1, 1)
    return reference.prematch.get_complete_spk_pool(
        path, model, w, w, device="cpu", duration_limit=duration_limit)


def _assert_pools_match(ref_pools, ours, atol_feats):
    names = ["matching", "synth", "audio", "spec", "f0", "harmonics"]
    atol = dict(matching=atol_feats, synth=atol_feats, audio=1e-7,
                spec=1e-4, f0=1e-7, harmonics=1e-5)
    ref_keys = list(ref_pools[0].keys())
    assert list(ours.utterances.keys()) == ref_keys
    for name, ref_pool in zip(names, ref_pools):
        for key in ref_keys:
            theirs = ref_pool[key].numpy()
            mine = getattr(ours.utterances[key], name)
            assert mine.shape == theirs.shape, (name, key, mine.shape,
                                                theirs.shape)
            np.testing.assert_allclose(
                mine, theirs, atol=atol[name],
                err_msg=f"pool {name!r} diverges for {key}")


def test_pool_seam_long_utterance_one_hot(reference, torch, wavlm_pair,
                                          ref_torchaudio, tmp_path):
    """>30-s single file: the 30-s chunk boundary, pad quirk, spec/feature
    row alignment and harmonics all flow through for real, one-hot weights
    (our early-exit encoder vs the ref's all-layer stack)."""
    model, params, cfg = wavlm_pair
    utt = tmp_path / "long.wav"
    _write_utt(utt, 33.0, 210, seed=11)

    weights = generate_matrix_from_index(2, size=cfg.encoder_layers + 1)
    with torch.inference_mode():
        ref_pools = _run_reference_pool(reference, torch, utt, model, weights)
    ours = build_speaker_pool(utt, params, cfg, weights, weights)

    T = ours.utterances[str(utt)].matching.shape[0]
    assert T > 30 * SR // HOP, "utterance must cross the 30-s chunk boundary"
    _assert_pools_match(ref_pools, ours, atol_feats=5e-4)


def test_pool_seam_folder_duration_limit_dense_weights(
        reference, torch, wavlm_pair, ref_torchaudio, tmp_path):
    """Folder of utterances with duration_limit: the pool must cut AFTER the
    utterance that crosses the limit (ref :408-411) — third file never
    processed — using a dense (non-one-hot) layer weighting (our all-layer
    path vs the ref's weighted sum)."""
    model, params, cfg = wavlm_pair
    spk = tmp_path / "spk"
    spk.mkdir()
    for i, (name, sec, hz) in enumerate(
            [("a.wav", 6.0, 190), ("b.wav", 6.0, 240), ("c.wav", 6.0, 300)]):
        _write_utt(spk / name, sec, hz, seed=20 + i)

    rng = np.random.default_rng(5)
    weights = rng.random(cfg.encoder_layers + 1).astype(np.float32)
    weights /= weights.sum()
    with torch.inference_mode():
        ref_pools = _run_reference_pool(reference, torch, spk, model, weights,
                                        duration_limit=10.0)
    ours = build_speaker_pool(spk, params, cfg, weights, weights,
                              duration_limit=10.0)

    assert len(ours.utterances) == 2, "limit must cut after the 2nd utterance"
    _assert_pools_match(ref_pools, ours, atol_feats=5e-4)
