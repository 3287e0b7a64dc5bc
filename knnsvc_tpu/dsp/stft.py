"""Spectrogram ops in JAX.

Two consumers in the pipeline:

- Linear spectrogram for the harmonic-amplitude pool:
  torchaudio.transforms.Spectrogram(n_fft=400, hop_length=320, center=True,
  power=1) — ref ddsp_prematch_dataset.py:326,361-366.
- Log-mel for vocoder training/eval: MelSpectrogram(power=1, slaney norm +
  slaney scale, center=False) on reflect-padded input, then log(clamp(1e-5))
  — ref ddsp_matcher.py:274-298, hifigan/ddsp_meldataset.py.

Everything is framed as one big matmul (frames x window) @ DFT basis so XLA
lowers it onto the MXU; rfft on TPU is also fine, we use jnp.fft.rfft which
XLA handles natively.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    # periodic Hann, matching torch.hann_window(win_length)
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def _frame(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(..., T) -> (..., n_frames, frame_length) via gather."""
    n_frames = 1 + (x.shape[-1] - frame_length) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def stft_magnitude(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    center: bool = True,
    power: float = 1.0,
    pad_mode: str = "reflect",
) -> jax.Array:
    """|STFT| with torch.stft conventions. x: (..., T) -> (..., n_freqs, n_frames)."""
    if win_length is None:
        win_length = n_fft
    window = hann_window(win_length, x.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)
    frames = _frame(x, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag ** power
    return jnp.swapaxes(mag, -1, -2)  # (..., n_freqs, n_frames)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def linear_spectrogram(x: jax.Array, n_fft: int = 400, hop_length: int = 320) -> jax.Array:
    """(T,) waveform -> (n_frames, n_fft//2) magnitude frames, Nyquist bin
    dropped — the exact pool layout used by the reference
    (`STFT_OP(x).T[:, :-1]`, ref ddsp_prematch_dataset.py:361)."""
    spec = stft_magnitude(x, n_fft=n_fft, hop_length=hop_length, center=True, power=1.0)
    return spec.T[:, :-1]


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, f / f_sp)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), m * f_sp)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int = 16000,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized mel filterbank (n_mels, n_fft//2+1),
    matching torchaudio MelSpectrogram(norm='slaney', mel_scale='slaney')."""
    fft_freqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "num_mels", "sampling_rate", "hop_size", "win_size", "fmin", "fmax")
)
def log_mel_spectrogram(
    wav: jax.Array,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 16000,
    hop_size: int = 320,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> jax.Array:
    """(..., T) -> (..., num_mels, n_frames). Matches the reference's
    LogMelSpectrogram: manual reflect pad of (n_fft-hop)/2 both sides, mel of
    |STFT| (power=1), log(clamp(1e-5)) — ref ddsp_matcher.py:294-298."""
    pad = (n_fft - hop_size) // 2
    wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    spec = stft_magnitude(wav, n_fft=n_fft, hop_length=hop_size, win_length=win_size, center=False, power=1.0)
    fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    from knnsvc_tpu.precision import get_precision

    mel = jnp.einsum("mf,...ft->...mt", fb, spec,
                     preferred_element_type=jnp.float32,
                     precision=get_precision())
    return jnp.log(jnp.clip(mel, min=1e-5))
