"""ctypes binding to the native FLAC decoder (native/flacdec).

Enables .flac datasets (LibriSpeech layout) without libsndfile/ffmpeg.
Returns float32 in [-1, 1] like the WAV path (torchaudio normalize=True
semantics). Builds lazily like worldline.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libflacdec.so"

_lib = None


def _load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=300)
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            raise OSError(f"flacdec native lib not built: {e}") from e
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.flacdec_probe.restype = ctypes.c_int
    lib.flacdec_probe.argtypes = [u8p, ctypes.c_long, ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_long)]
    lib.flacdec_decode.restype = ctypes.c_int
    lib.flacdec_decode.argtypes = [u8p, ctypes.c_long, ctypes.POINTER(ctypes.c_int32),
                                   ctypes.c_long, ctypes.POINTER(ctypes.c_long)]
    _lib = lib
    return lib


def decode_flac(path: str, normalize: bool = True) -> tuple[np.ndarray, int]:
    """-> (waveform (channels, T) float32, sample_rate)."""
    lib = _load_library()
    raw = np.frombuffer(open(path, "rb").read(), dtype=np.uint8)
    buf = raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    bits = ctypes.c_int()
    n = ctypes.c_long()
    rc = lib.flacdec_probe(buf, len(raw), ctypes.byref(sr), ctypes.byref(ch),
                           ctypes.byref(bits), ctypes.byref(n))
    if rc != 0:
        raise ValueError(f"flac decode failed (probe rc={rc}) for {path}")
    # STREAMINFO declares the length; streams without it get a size headroom
    capacity = n.value if n.value > 0 else max(len(raw) * 4, 1 << 20)
    out = np.zeros(capacity, dtype=np.int32)
    n_out = ctypes.c_long()
    rc = lib.flacdec_decode(buf, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                            capacity, ctypes.byref(n_out))
    if rc == 3:  # declared length was short: retry once with the real count
        out = np.zeros(n_out.value, dtype=np.int32)
        rc = lib.flacdec_decode(buf, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                                n_out.value, ctypes.byref(n_out))
    if rc != 0:
        raise ValueError(f"flac decode failed (decode rc={rc}) for {path}")
    x = out[: n_out.value].reshape(-1, ch.value).T.astype(np.float32)
    if normalize:
        x = x / float(2 ** (bits.value - 1))
    return np.ascontiguousarray(x), sr.value
