"""mp3 ingestion (ref accepts `.mp3` pool audio, ddsp_prematch_dataset.py:313).

Decoding goes through SDL_mixer's MPEG decoder via pygame (baked into this
image) after a small native header parse picks the true sample rate, so the
mixer is initialized at the file's rate and no resampling happens inside the
codec. Output matches load_audio's contract: (channels, T) float32 in [-1,1].

The frame-header parse (sync word, version/layer, bitrate/samplerate/channel
tables) is implemented here from the MPEG-1/2 audio spec; only the entropy-
coded payload is delegated to the codec library — same split as the
reference, which delegates to ffmpeg through pydub/librosa
(lib_ongaku_test.py:118-143).
"""

from __future__ import annotations

import os

import numpy as np

# MPEG audio frame header tables (ISO 11172-3 / 13818-3)
_SAMPLE_RATES = {
    3: (44100, 48000, 32000),  # MPEG-1
    2: (22050, 24000, 16000),  # MPEG-2
    0: (11025, 12000, 8000),   # MPEG-2.5
}
# Layer III bitrates (kbit/s); MPEG-2/2.5 share the LSF column
_BITRATES_L3 = {
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    0: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}


def _parse_header(data: bytes, i: int):
    """-> (sample_rate, channels, frame_length) or None."""
    if i + 4 > len(data) or data[i] != 0xFF or (data[i + 1] & 0xE0) != 0xE0:
        return None
    version = (data[i + 1] >> 3) & 0x3     # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (data[i + 1] >> 1) & 0x3       # 1 = Layer III
    sr_idx = (data[i + 2] >> 2) & 0x3
    bitrate_idx = (data[i + 2] >> 4) & 0xF
    padding = (data[i + 2] >> 1) & 0x1
    mode = (data[i + 3] >> 6) & 0x3        # 3 = mono
    if version not in _SAMPLE_RATES or layer != 1 or sr_idx == 3 \
            or bitrate_idx in (0, 15):
        return None
    sr = _SAMPLE_RATES[version][sr_idx]
    bitrate = _BITRATES_L3[version][bitrate_idx] * 1000
    coeff = 144 if version == 3 else 72    # samples-per-frame / 8
    frame_len = coeff * bitrate // sr + padding
    return sr, (1 if mode == 3 else 2), frame_len


def mp3_stream_info(path: str | os.PathLike) -> tuple[int, int]:
    """(sample_rate, channels) from the first frame header that is CONFIRMED
    by a second valid header exactly one frame length later — a lone 11-bit
    sync match inside tag/junk bytes is common."""
    with open(path, "rb") as f:
        head = f.read(10)
        skip = 0
        # skip ID3v2 by its declared size (tags with embedded cover art can
        # exceed any fixed read budget)
        if head[:3] == b"ID3" and len(head) >= 10:
            skip = 10 + (((head[6] & 0x7F) << 21) | ((head[7] & 0x7F) << 14)
                         | ((head[8] & 0x7F) << 7) | (head[9] & 0x7F))
        f.seek(0, os.SEEK_END)
        file_end = f.tell()
        f.seek(skip)
        data = f.read(256 * 1024)
    i = 0
    n = len(data)
    while i + 4 <= n:
        hdr = _parse_header(data, i)
        if hdr is not None:
            sr, channels, frame_len = hdr
            j = i + frame_len
            nxt = _parse_header(data, j)
            if nxt is not None and nxt[0] == sr and nxt[1] == channels:
                return sr, channels
            # a lone header is only trusted when the confirming position is
            # past the END OF FILE (a genuine final frame), not merely past
            # the read buffer — junk syncs near the buffer edge must not win
            if skip + j + 4 > file_end and skip + i + frame_len <= file_end:
                return sr, channels
        i += 1
    raise ValueError(f"no valid MPEG audio frame found in {path}")


_mixer_rate: int | None = None


def decode_mp3(path: str | os.PathLike, normalize: bool = True) -> tuple[np.ndarray, int]:
    """Decode an mp3 to ((channels, T) float32 in [-1,1], sample_rate)."""
    global _mixer_rate

    sr, channels = mp3_stream_info(path)

    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    try:
        import pygame
    except ImportError as e:  # pragma: no cover - pygame is baked in here
        raise NotImplementedError(
            f"mp3 decoding needs the pygame/SDL_mixer codec (absent): {path}"
        ) from e

    if _mixer_rate != sr or not pygame.mixer.get_init():
        pygame.mixer.quit()
        # size=-16: decode to int16; channels=2 covers mono inputs (SDL
        # duplicates the channel; the duplicate is dropped below)
        pygame.mixer.init(frequency=sr, size=-16, channels=2)
        _mixer_rate = sr

    sound = pygame.mixer.Sound(str(path))
    arr = pygame.sndarray.array(sound)          # (T, 2) int16
    if arr.ndim == 1:
        arr = arr[:, None]
    if channels == 1:
        arr = arr[:, :1]
    out = arr.T.astype(np.float32)
    if normalize:
        out /= 32768.0
    return out, sr
