"""Speaker feature-pool builder.

Equivalent of the reference's `get_complete_spk_pool` + `get_full_wavlm_features`
(ddsp_prematch_dataset.py:269-414): for every utterance of a speaker produce six
aligned frame pools —

  matching   (T, 1024)  layer-weighted WavLM features for kNN
  synth      (T, 1024)  layer-weighted WavLM features for synthesis
  audio      (T, 320)   raw waveform frames
  spec       (T, 200)   linear |STFT| frames (n_fft 400, hop 320, Nyquist cut)
  f0         (T,)       Hz, 0 = unvoiced (sidecar / Harvest / YIN)
  harmonics  (T, 49)    |STFT| sampled at k*f0 via 8x-interpolated spectrum,
                        x0.0108; unvoiced rows: [max-bin, 0...0]

TPU design notes:
- WavLM runs on 30-s chunks padded to a hop multiple (pad is a FULL extra hop
  when already aligned — replicating ref :284 exactly, since pool frame counts
  must line up with the reference's).
- A one-hot layer weighting short-circuits to the early-exit encoder (6 of 24
  layers); arbitrary weightings use the all-layer stack.
- Everything device-side is jitted per chunk shape; 30-s chunks share one
  compilation, so only final partial chunks trigger new shapes.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import threading
from pathlib import Path
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from knnsvc_tpu import HOP_LENGTH, SAMPLE_RATE
from knnsvc_tpu.config import WavLMConfig
from knnsvc_tpu.dsp.f0 import get_f0
from knnsvc_tpu.dsp.stft import linear_spectrogram
from knnsvc_tpu.io.audio import load_audio, resample, to_mono
from knnsvc_tpu.models.wavlm import wavlm_extract_layer, wavlm_extract_layer_bucketed, wavlm_extract_all_layers
from knnsvc_tpu.utils.layer_weights import one_hot_layer

AUDIO_EXTENSIONS = {".flac", ".wav", ".mp3"}  # ref ddsp_prematch_dataset.py:313
CHUNK_SECONDS = 30                            # ref :277
MIN_CHUNK_SECONDS = 0.02                      # ref :279
N_HARMONICS = 49                              # ref :391 (arange(1, 50))
HARMONIC_SCALE = 0.0108                       # ref :404
SPEC_INTERP_FACTOR = 8                        # ref :395


@dataclasses.dataclass
class UtterancePools:
    matching: np.ndarray
    synth: np.ndarray
    audio: np.ndarray
    spec: np.ndarray
    f0: np.ndarray
    harmonics: np.ndarray


@dataclasses.dataclass
class SpeakerPool:
    """Per-utterance pools plus concatenated views (ref :1143-1168)."""

    utterances: dict[str, UtterancePools]

    def _cat(self, field: str) -> np.ndarray:
        return np.concatenate([getattr(u, field) for u in self.utterances.values()], axis=0)

    @property
    def matching(self) -> np.ndarray:
        return self._cat("matching")

    @property
    def synth(self) -> np.ndarray:
        return self._cat("synth")

    @property
    def audio(self) -> np.ndarray:
        return self._cat("audio")

    @property
    def spec(self) -> np.ndarray:
        return self._cat("spec")

    @property
    def f0(self) -> np.ndarray:
        return self._cat("f0")

    @property
    def harmonics(self) -> np.ndarray:
        return self._cat("harmonics")

    @property
    def utterance_start_indices(self) -> list[int]:
        starts = [0]
        for u in self.utterances.values():
            starts.append(starts[-1] + len(u.matching))
        return starts


def list_speaker_utterances(path: str | Path) -> list[Path]:
    """Single audio file, or every audio file under a folder (sorted)
    (ref :313-323)."""
    path = Path(path)
    if path.is_file() and path.suffix.lower() in AUDIO_EXTENSIONS:
        return [path]
    utts = sorted(p for p in path.rglob("**/*") if p.suffix.lower() in AUDIO_EXTENSIONS)
    assert len(utts) != 0, f"directory not containing any audio {path}"
    return utts


def load_utterance(path: str | Path, target_sr: int = SAMPLE_RATE) -> np.ndarray:
    """Load -> mono -> resample to 16 kHz. Returns (T,) float32 (ref :332-341)."""
    x, sr = load_audio(path)
    x = to_mono(x)
    if sr != target_sr:
        x = resample(x, sr, target_sr)
    return np.asarray(x[0], dtype=np.float32)


def chunked_wavlm_features(
    wav: np.ndarray,
    wavlm_params,
    wavlm_cfg: WavLMConfig,
    match_weights: np.ndarray,
    synth_weights: np.ndarray,
    sr: int = SAMPLE_RATE,
    encode_mode: str = "exact",
) -> tuple[np.ndarray, np.ndarray]:
    """(T_samples,) -> (matching (T,D), synth (T,D)) via 30-s chunks
    (ref get_full_wavlm_features :269-296). One-hot weightings use the
    early-exit encoder; otherwise the all-layer weighted sum."""
    m_hot = one_hot_layer(match_weights)
    s_hot = one_hot_layer(synth_weights)
    # "bucketed": pad final partial chunks to fixed buckets with masked
    # attention — one compilation per bucket instead of one per utterance
    # length (production bulk mode; "exact" replicates the reference's
    # unmasked zero-padding bit-for-bit)
    extract = wavlm_extract_layer_bucketed if encode_mode == "bucketed" else wavlm_extract_layer

    matching_chunks, synth_chunks = [], []
    start = 0
    chunk_len = CHUNK_SECONDS * sr
    while start < len(wav):
        chunk = wav[start : start + chunk_len]
        if len(chunk) <= MIN_CHUNK_SECONDS * sr:
            break
        n_pad = HOP_LENGTH - (len(chunk) % HOP_LENGTH)  # full hop when aligned (ref :284)
        chunk = np.pad(chunk, (0, n_pad))
        x = jnp.asarray(chunk)[None]

        if m_hot is not None and s_hot is not None:
            layers_needed = sorted({m_hot, s_hot})
            feats = {}
            top = max(layers_needed)
            assert top >= 1, "layer-0 weighting selects the transformer input"
            out = extract(wavlm_params, wavlm_cfg, x, output_layer=top)
            feats[top] = np.asarray(out[0])
            if len(layers_needed) == 2:
                low = min(layers_needed)
                out_low = extract(wavlm_params, wavlm_cfg, x, output_layer=low)
                feats[low] = np.asarray(out_low[0])
            matching_chunks.append(feats[m_hot])
            synth_chunks.append(feats[s_hot])
        else:
            stack = wavlm_extract_all_layers(wavlm_params, wavlm_cfg, x)  # (L+1, 1, T, D)
            stack = stack[:, 0]
            mw = jnp.asarray(np.asarray(match_weights).reshape(-1, 1, 1))
            sw = jnp.asarray(np.asarray(synth_weights).reshape(-1, 1, 1))
            matching_chunks.append(np.asarray(jnp.sum(stack * mw, axis=0)))
            synth_chunks.append(np.asarray(jnp.sum(stack * sw, axis=0)))
        start += chunk_len

    return np.concatenate(matching_chunks, axis=0), np.concatenate(synth_chunks, axis=0)


def harmonic_amplitudes(spec: np.ndarray, f0: np.ndarray, sr: int = SAMPLE_RATE) -> np.ndarray:
    """(T, 200) linear spec + (T,) f0 -> (T, 49) harmonic magnitudes
    (ref :391-404): gather the 8x linearly-interpolated spectrum at bins of
    k*f0; unvoiced rows get [max spec bin, 0, ..., 0]; x0.0108.

    The reference materializes the full 8x-interpolated spectrum (T, 1600)
    then gathers 49 points per frame; here only the needed (T, 49) grid
    points are interpolated directly — bit-identical output, 32x less work
    (this sits on the timed pool-build path)."""
    T, n_bins = spec.shape
    L = n_bins * SPEC_INTERP_FACTOR

    # float32 throughout: the bin index must round exactly like the
    # reference's float32 torch pipeline (an int64 arange would promote to
    # float64 and flip boundary bins — caught by tests/test_pool_seam.py)
    harmonics = f0[:, None] * np.arange(1, N_HARMONICS + 1,
                                        dtype=np.float32)[None, :]  # (T, 49) Hz
    idx = np.round(np.clip(harmonics * 2 * L / sr, a_min=None,
                           a_max=L)).astype(int)

    # value of torch F.interpolate(mode='linear', align_corners=False) at the
    # 8x grid point g: source position (g + 0.5)/8 - 0.5 between bins
    in_range = idx < L                                                # == L hit the ref's zero pad column
    g = np.where(in_range, idx, 0)
    out_pos = (g + 0.5) / SPEC_INTERP_FACTOR - 0.5
    lo = np.clip(np.floor(out_pos).astype(int), 0, n_bins - 1)
    hi = np.clip(lo + 1, 0, n_bins - 1)
    frac = np.clip(out_pos - np.floor(out_pos), 0.0, 1.0)
    frac = np.where(out_pos < 0, 0.0, frac)
    rows = np.arange(T)[:, None]
    gathered = spec[rows, lo] * (1 - frac) + spec[rows, hi] * frac    # (T, 49)
    gathered = np.where(in_range, gathered, 0.0)

    unvoiced = f0 == 0
    gathered[unvoiced, 1:] = 0.0
    gathered[unvoiced, 0] = spec[unvoiced].max(axis=1) if unvoiced.any() else 0.0
    return (HARMONIC_SCALE * gathered).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("sr",))
def harmonic_amplitudes_jax(spec: jnp.ndarray, f0: jnp.ndarray,
                            sr: int = SAMPLE_RATE) -> jnp.ndarray:
    """Device-resident harmonic_amplitudes (jnp, jittable): same math as the
    numpy version, for the zero-copy serving path where the spectrogram never
    leaves HBM (host<->device transfers are the bottleneck on tunneled TPU
    setups, and the (T, 200) spec is ~1 MB per 30 s)."""
    T, n_bins = spec.shape
    L = n_bins * SPEC_INTERP_FACTOR

    harmonics = f0[:, None] * jnp.arange(1, N_HARMONICS + 1)[None, :]
    idx = jnp.round(jnp.clip(harmonics * 2 * L / sr, max=L)).astype(jnp.int32)

    in_range = idx < L
    g = jnp.where(in_range, idx, 0)
    out_pos = (g + 0.5) / SPEC_INTERP_FACTOR - 0.5
    lo = jnp.clip(jnp.floor(out_pos).astype(jnp.int32), 0, n_bins - 1)
    hi = jnp.clip(lo + 1, 0, n_bins - 1)
    frac = jnp.clip(out_pos - jnp.floor(out_pos), 0.0, 1.0)
    frac = jnp.where(out_pos < 0, 0.0, frac)
    gathered = (jnp.take_along_axis(spec, lo, axis=1) * (1 - frac)
                + jnp.take_along_axis(spec, hi, axis=1) * frac)
    gathered = jnp.where(in_range, gathered, 0.0)

    unvoiced = (f0 == 0)[:, None]
    first = jnp.concatenate(
        [jnp.max(spec, axis=1, keepdims=True),
         jnp.zeros((T, N_HARMONICS - 1), spec.dtype)], axis=1)
    gathered = jnp.where(unvoiced, first, gathered)
    return (HARMONIC_SCALE * gathered).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "layers", "with_f0"))
def _encode_and_spec(wavlm_params, cfg, x, layers: tuple,
                     with_f0: bool = False):
    """WavLM layer extraction(s) + linear spectrogram of one padded chunk as
    a single compiled program (the serving pool build is dispatch-bound on
    tunneled single-chip setups). An int16 x is a quantized upload — the
    dequantize runs on device (jit retraces per dtype).

    with_f0=True additionally runs the device-resident f0 extractor
    (dsp/f0_device.py) on the same uploaded chunk inside the SAME program —
    the zero-host-f0 pool build (f0_method='device')."""
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) / 32768.0
    outs = [wavlm_extract_layer(wavlm_params, cfg, x, output_layer=l)[0]
            for l in layers]
    outs.append(linear_spectrogram(x[0]))
    if with_f0:
        from knnsvc_tpu.dsp.f0_device import device_f0_jax

        # the pool keeps outs[0].shape[0] frames of this chunk; the f0 grid
        # (frame i at sample i*hop) is the same 20 ms grid the encoder's
        # stride-320 frontend emits
        outs.append(device_f0_jax(x[0], sr=SAMPLE_RATE,
                                  n_frames=outs[0].shape[0]))
    return tuple(outs)


@functools.lru_cache(maxsize=1)
def _f0_executor():
    from concurrent.futures import ThreadPoolExecutor
    return ThreadPoolExecutor(max_workers=1, thread_name_prefix="native-f0")


class DevicePool:
    """Device-resident pools for the zero-copy serving path: WavLM features,
    f0 and harmonic amplitudes live in HBM end-to-end; the only host<->device
    traffic per utterance is the waveform upload, the (tiny) native-f0 upload
    and the final converted-waveform download. On tunneled TPU setups the
    transfers + eager dispatches of the host-side SpeakerPool path cost more
    than the entire compute.

    `f0`/`harmonics` may be DEFERRED (build_device_pool runs the native f0
    on a background thread — the ctypes call releases the GIL, so on the
    single-core serving host the extraction overlaps the encode dispatches
    and the device flight time instead of sitting on the critical path).
    First access joins the thread, uploads the f0 and gathers harmonics."""

    def __init__(self, matching, synth, f0=None, harmonics=None, *,
                 f0_future=None, spec=None, sr: int = SAMPLE_RATE):
        self.matching = matching   # (T, D)
        self.synth = synth         # (T, D)
        self._f0 = f0              # (T,)
        self._harmonics = harmonics  # (T, 49)
        self._f0_future = f0_future
        self._spec = spec
        self._sr = sr
        self._lock = threading.Lock()

    def _join_f0(self) -> None:
        # Lock: concurrent first accesses to .f0/.harmonics must not both
        # run the join; clear the future only after the field is set so a
        # failure here re-raises the real error on every later access
        # instead of an AttributeError on None.
        with self._lock:
            if self._f0 is not None:
                return
            f0_np = np.asarray(self._f0_future.result(), dtype=np.float32)
            T = self.matching.shape[0]
            assert len(f0_np) >= T, (
                f"f0 shorter than pool: len(f0)={len(f0_np)} < T={T} "
                "(truncated/mismatched sidecar?)")
            self._f0 = jnp.asarray(f0_np[:T])
            self._f0_future = None

    @property
    def f0(self):
        # f0-only access does NOT pay the harmonics gather: the source-side
        # pool of a conversion needs f0 (register shift, vocoder
        # conditioning) but never its own harmonics.
        if self._f0 is None:
            self._join_f0()
        return self._f0

    @property
    def harmonics(self):
        if self._harmonics is None:
            self._join_f0()
            with self._lock:
                if self._harmonics is None:
                    self._harmonics = harmonic_amplitudes_jax(
                        self._spec, self._f0, self._sr)
                    self._spec = None
        return self._harmonics

    @property
    def spec(self):
        """Device-resident linear spectrogram, kept until `harmonics`
        consumes it (the fused serving program gathers harmonics inline from
        (spec, f0) instead — see match/serve.py)."""
        return self._spec


def build_device_pool(
    wav: np.ndarray,
    wavlm_params,
    wavlm_cfg: WavLMConfig,
    match_weights: np.ndarray,
    synth_weights: np.ndarray,
    sr: int = SAMPLE_RATE,
    f0_method: str = "fast",
    audio_path: str | None = None,
    upload_dtype: str = "float32",
) -> DevicePool:
    """Single-utterance pool that never leaves the device (30-s chunking as
    in chunked_wavlm_features; one-hot layer weightings only — the serving
    path). f0 runs natively on the host wav (the one array already there).

    upload_dtype='int16' halves the waveform upload (the serving bottleneck
    on tunneled setups — measured 4.7 MB/s on a congested tunnel, where the
    two float32 30-s uploads alone cost ~800 ms) by quantizing to 16-bit on
    the host and dequantizing on device. Same audible-content stance as the
    int16 waveform download; lossless for PCM_16-sourced audio. Default
    float32 keeps bit-exactness with the host-pool path (tested).

    f0_method='device' runs the device-resident extractor (dsp/f0_device.py)
    INSIDE each chunk's fused encode dispatch — no host f0 thread, no f0
    upload, no host work at all beyond the waveform upload. Two documented
    divergences from the host methods: the Viterbi smoothing runs per 30-s
    chunk instead of per file (boundary-local), and `audio_path` f0
    sidecars are NOT consulted or written (the extractor is cheaper than
    the read on this path; host methods keep the reference's sidecar
    contract)."""
    m_hot = one_hot_layer(match_weights)
    s_hot = one_hot_layer(synth_weights)
    assert m_hot is not None and s_hot is not None, "device pool needs one-hot weights"
    layers = sorted({m_hot, s_hot})

    device_f0 = f0_method == "device"
    if device_f0:
        assert sr == SAMPLE_RATE, "f0_method='device' assumes the 16 kHz path"
        f0_future = None
    else:
        # Kick the native f0 off on the background thread BEFORE the encode
        # dispatch loop: the C call releases the GIL, so it runs while this
        # thread uploads chunks / waits on tunnel round trips, and while the
        # device chews the encode queue. The join happens lazily at first
        # pool.f0 access (typically the match dispatch, after BOTH pools'
        # encodes are in flight).
        f0_future = _f0_executor().submit(
            get_f0, wav, sr, audio_path=audio_path, method=f0_method,
            use_sidecar=audio_path is not None,
            write_sidecar=audio_path is not None)
        # If the pool's f0 is never accessed, a worker failure would
        # otherwise be swallowed (future never joined) — at least log it.
        f0_future.add_done_callback(
            lambda f: f.cancelled() or f.exception() is None or
            logging.getLogger(__name__).warning(
                "background f0 extraction failed: %r", f.exception()))

    feats: dict[int, list[jnp.ndarray]] = {l: [] for l in layers}
    specs = []
    f0_chunks: list[jnp.ndarray] = []
    chunk_len = CHUNK_SECONDS * sr
    start = 0
    chunk_index = 0
    while start < len(wav):
        chunk = wav[start : start + chunk_len]
        if len(chunk) <= MIN_CHUNK_SECONDS * sr:
            break
        n_pad = HOP_LENGTH - (len(chunk) % HOP_LENGTH)  # ref :284 pad quirk
        chunk = np.pad(chunk, (0, n_pad))
        if upload_dtype == "int16":
            chunk = np.clip(np.round(chunk * 32768.0), -32768,
                            32767).astype(np.int16)
        x = jnp.asarray(chunk)[None]                    # the upload
        # one dispatch per chunk: encode(s) + spectrogram (+ device f0)
        # fused (each dispatch costs a ~10 ms host round trip on tunneled
        # setups)
        outs = _encode_and_spec(wavlm_params, wavlm_cfg, x, tuple(layers),
                                with_f0=device_f0)
        if device_f0:
            f0_chunks.append(outs[-1])
            outs = outs[:-1]
        for l, f in zip(layers, outs[:-1]):
            feats[l].append(f)
        # Spec/feature alignment. The reference indexes a CONTINUOUS
        # whole-utterance spectrogram with the pool row (ref :361-366), while
        # the ref's pad quirk (:284) makes each chunk contribute one extra
        # feature frame — so pool row k of chunk c corresponds to continuous
        # spec row (chunk start frame) + (k - prevT) = chunk-local row + c.
        # Slice each chunk's spec at that offset (clamped: a chunk spec has
        # exactly one spare row, so chunks beyond the second stay one row
        # early — a 20 ms approximation at 60 s+ boundaries, vs the whole
        # tail being shifted when slicing the concatenation globally).
        Tc = outs[0].shape[0]
        spec_c = outs[-1]
        off = min(chunk_index, spec_c.shape[0] - Tc)
        specs.append(spec_c[off : off + Tc])
        start += chunk_len
        chunk_index += 1

    matching = jnp.concatenate(feats[m_hot], axis=0)
    synth = matching if s_hot == m_hot else jnp.concatenate(feats[s_hot], axis=0)
    T = matching.shape[0]
    spec = jnp.concatenate(specs, axis=0)
    assert spec.shape[0] == T, (spec.shape, T)

    if device_f0:
        f0 = (f0_chunks[0] if len(f0_chunks) == 1
              else jnp.concatenate(f0_chunks, axis=0))
        return DevicePool(matching, synth, f0=f0[:T], spec=spec, sr=sr)
    return DevicePool(matching, synth, f0_future=f0_future, spec=spec, sr=sr)


def build_speaker_pool(
    path: str | Path,
    wavlm_params,
    wavlm_cfg: WavLMConfig,
    match_weights: np.ndarray,
    synth_weights: np.ndarray,
    duration_limit: float | None = None,
    f0_fn: Callable[[np.ndarray, int, str], np.ndarray] | None = None,
    sr: int = SAMPLE_RATE,
    encode_mode: str = "exact",
) -> SpeakerPool:
    """== ref get_complete_spk_pool (:301-414). duration_limit in seconds cuts
    the pool after the utterance that crosses it (ref :408-411)."""
    utterances: dict[str, UtterancePools] = {}
    accumulated = 0.0

    for pth in list_speaker_utterances(path):
        wav = load_utterance(pth, sr)
        matching, synth = chunked_wavlm_features(
            wav, wavlm_params, wavlm_cfg, match_weights, synth_weights, sr,
            encode_mode=encode_mode,
        )
        T = len(matching)
        assert len(wav) >= HOP_LENGTH * T, (len(wav), T)
        audio_frames = wav[: HOP_LENGTH * T].reshape(T, HOP_LENGTH)

        spec = np.asarray(linear_spectrogram(jnp.asarray(wav)))
        assert spec.shape[0] >= T
        spec = spec[:T]

        if f0_fn is None:
            f0 = get_f0(wav, sr, audio_path=str(pth))
        else:
            f0 = f0_fn(wav, sr, str(pth))
        assert abs(len(f0) - T) <= 1 and len(f0) >= T, (len(f0), T)
        f0 = np.asarray(f0[:T], dtype=np.float32)

        harm = harmonic_amplitudes(spec, f0, sr)

        utterances[str(pth)] = UtterancePools(
            matching=matching, synth=synth, audio=audio_frames.astype(np.float32),
            spec=spec.astype(np.float32), f0=f0, harmonics=harm,
        )

        accumulated += T * HOP_LENGTH / sr
        if duration_limit is not None and accumulated >= duration_limit:
            break

    return SpeakerPool(utterances)


def save_speaker_pool(pool: SpeakerPool, path: str | Path) -> None:
    """Persist a pool as one .npz (deterministic on-disk feature format —
    SURVEY.md §5 'orbax + npy/zarr pools'). Keys: <idx>|<field>, plus the
    utterance path list."""
    arrays: dict[str, np.ndarray] = {"__paths__": np.array(list(pool.utterances.keys()))}
    for i, utt in enumerate(pool.utterances.values()):
        for field in ("matching", "synth", "audio", "spec", "f0", "harmonics"):
            arrays[f"{i}|{field}"] = getattr(utt, field)
    np.savez(path, **arrays)


def load_speaker_pool(path: str | Path) -> SpeakerPool:
    data = np.load(path, allow_pickle=False)
    paths = [str(p) for p in data["__paths__"]]
    utterances = {}
    for i, p in enumerate(paths):
        utterances[p] = UtterancePools(**{
            field: data[f"{i}|{field}"]
            for field in ("matching", "synth", "audio", "spec", "f0", "harmonics")
        })
    return SpeakerPool(utterances)


def build_speaker_pool_cached(
    path: str | Path,
    wavlm_params,
    wavlm_cfg: WavLMConfig,
    match_weights: np.ndarray,
    synth_weights: np.ndarray,
    cache_dir: str | Path | None = None,
    **kwargs,
) -> SpeakerPool:
    """build_speaker_pool with an optional on-disk cache. The reference
    authored exactly this cache but force-disabled it
    (ref ddsp_prematch_dataset.py:1086-1138); here it works, keyed by the
    speaker path, the layer weighting and the duration limit."""
    if cache_dir is None:
        return build_speaker_pool(path, wavlm_params, wavlm_cfg,
                                  match_weights, synth_weights, **kwargs)
    import hashlib

    os.makedirs(cache_dir, exist_ok=True)
    # fingerprint the MODEL too — a cache keyed only on paths/weights would
    # silently serve pools built with different WavLM parameters
    fp = hashlib.sha1()
    for probe in (wavlm_params.get("encoder", {}).get("rel_attn_bias"),
                  wavlm_params.get("layer_norm", {}).get("scale")):
        if probe is not None:
            fp.update(np.asarray(probe).tobytes())
    key_src = (str(Path(path).resolve())
               + "|" + np.asarray(match_weights).tobytes().hex()
               + "|" + np.asarray(synth_weights).tobytes().hex()
               + "|" + str(kwargs.get("duration_limit"))
               + "|" + kwargs.get("encode_mode", "exact")
               + "|" + fp.hexdigest())
    key = hashlib.sha1(key_src.encode()).hexdigest()[:16]
    cache_file = Path(cache_dir) / f"{Path(path).name}_{key}.pool.npz"
    if cache_file.is_file():
        return load_speaker_pool(cache_file)
    pool = build_speaker_pool(path, wavlm_params, wavlm_cfg,
                              match_weights, synth_weights, **kwargs)
    save_speaker_pool(pool, cache_file)
    return pool
