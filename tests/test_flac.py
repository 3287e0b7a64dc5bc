"""FLAC decoder tests. No FLAC encoder exists in this image, so the test
builds streams by hand with a minimal bit-writer: verbatim, constant and
fixed-order rice-coded subframes, mono and stereo — exercising the header
parser, UTF-8 numbers, rice decoding and fixed prediction."""

import numpy as np
import pytest


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits += [0] * q + [1]

    def write_rice(self, value: int, param: int):
        u = (2 * value) if value >= 0 else (-2 * value - 1)
        self.write_unary(u >> param)
        if param:
            self.write(u & ((1 << param) - 1), param)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def make_flac(channel_samples: list[np.ndarray], sr=16000, bps=16,
              subframe="verbatim", rice_param=4) -> bytes:
    """One-frame FLAC stream with independent channels."""
    n = len(channel_samples[0])
    ch = len(channel_samples)

    # STREAMINFO (34 bytes)
    si = BitWriter()
    si.write(16, 16)        # min block size
    si.write(16, 16)        # max block size
    si.write(0, 24)         # min frame size
    si.write(0, 24)         # max frame size
    si.write(sr, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.write(0, 128)        # md5
    si_bytes = si.bytes()

    header = b"fLaC" + bytes([0x80, 0, 0, len(si_bytes)]) + si_bytes

    fw = BitWriter()
    fw.write(0x3FFE, 14)    # sync
    fw.write(0, 1)          # reserved
    fw.write(0, 1)          # fixed blocksize strategy
    fw.write(7, 4)          # block size: 16-bit at end of header
    fw.write(0, 4)          # sample rate: from STREAMINFO
    fw.write(ch - 1, 4)     # independent channels
    fw.write(4, 3)          # 16 bps
    fw.write(0, 1)          # reserved
    fw.write(0, 8)          # frame number 0 (utf8)
    fw.write(n - 1, 16)     # block size - 1
    fw.write(0, 8)          # crc8 (unverified)

    for samples in channel_samples:
        fw.write(0, 1)      # padding
        if subframe == "verbatim":
            fw.write(1, 6)
            fw.write(0, 1)  # no wasted bits
            for s in samples:
                fw.write_signed(int(s), bps)
        elif subframe == "constant":
            fw.write(0, 6)
            fw.write(0, 1)
            fw.write_signed(int(samples[0]), bps)
        elif subframe == "fixed1":
            fw.write(8 + 1, 6)  # fixed order 1
            fw.write(0, 1)
            fw.write_signed(int(samples[0]), bps)      # warmup
            fw.write(0, 2)      # residual method 0
            fw.write(0, 4)      # partition order 0
            fw.write(rice_param, 4)
            for i in range(1, n):
                fw.write_rice(int(samples[i]) - int(samples[i - 1]), rice_param)
        else:
            raise ValueError(subframe)
    fw.align()
    fw.write(0, 16)  # crc16 (unverified)
    return header + fw.bytes()


@pytest.fixture(scope="module")
def flacdec():
    mod = pytest.importorskip("knnsvc_tpu.io.flac")
    try:
        mod._load_library()
    except OSError:
        pytest.skip("native toolchain unavailable")
    return mod


def _roundtrip(tmp_path, flacdec, data, name, **kw):
    raw = make_flac(data, **kw)
    p = tmp_path / name
    p.write_bytes(raw)
    x, sr = flacdec.decode_flac(str(p), normalize=False)
    return x, sr


def test_flac_verbatim_mono(tmp_path, flacdec):
    rng = np.random.default_rng(0)
    samples = rng.integers(-30000, 30000, 64)
    x, sr = _roundtrip(tmp_path, flacdec, [samples], "v.flac")
    assert sr == 16000 and x.shape == (1, 64)
    np.testing.assert_array_equal(x[0].astype(int), samples)


def test_flac_constant_stereo(tmp_path, flacdec):
    a = np.full(32, 1234)
    b = np.full(32, -777)
    x, sr = _roundtrip(tmp_path, flacdec, [a, b], "c.flac", subframe="constant")
    assert x.shape == (2, 32)
    np.testing.assert_array_equal(x[0].astype(int), a)
    np.testing.assert_array_equal(x[1].astype(int), b)


def test_flac_fixed_rice(tmp_path, flacdec):
    t = np.arange(100)
    samples = (1000 * np.sin(2 * np.pi * t / 25)).astype(int)
    x, sr = _roundtrip(tmp_path, flacdec, [samples], "f.flac", subframe="fixed1")
    assert x.shape == (1, 100)
    np.testing.assert_array_equal(x[0].astype(int), samples)


def test_load_audio_flac_normalized(tmp_path, flacdec):
    from knnsvc_tpu.io.audio import load_audio

    samples = np.array([0, 16384, -16384, 32767])
    p = tmp_path / "n.flac"
    p.write_bytes(make_flac([samples]))
    x, sr = load_audio(p)
    np.testing.assert_allclose(x[0], samples / 32768.0, atol=1e-6)


def make_flac_lpc(samples: np.ndarray, coefs: list[int], shift: int,
                  precision: int, sr=16000, bps=16, rice_param=6) -> bytes:
    """Mono one-frame stream with an LPC subframe: residuals computed with the
    exact decoder recurrence (pred = (sum c_j * x[i-1-j]) >> shift)."""
    n = len(samples)
    order = len(coefs)
    si = BitWriter()
    si.write(16, 16); si.write(16, 16); si.write(0, 24); si.write(0, 24)
    si.write(sr, 20); si.write(0, 3); si.write(bps - 1, 5); si.write(n, 36)
    si.write(0, 128)
    header = b"fLaC" + bytes([0x80, 0, 0, len(si.bytes())]) + si.bytes()

    fw = BitWriter()
    fw.write(0x3FFE, 14); fw.write(0, 2)
    fw.write(7, 4); fw.write(0, 4); fw.write(0, 4); fw.write(4, 3); fw.write(0, 1)
    fw.write(0, 8); fw.write(n - 1, 16); fw.write(0, 8)

    fw.write(0, 1)
    fw.write(32 | (order - 1), 6)   # LPC subframe
    fw.write(0, 1)
    for i in range(order):
        fw.write_signed(int(samples[i]), bps)
    fw.write(precision - 1, 4)
    fw.write_signed(shift, 5)
    for c in coefs:
        fw.write_signed(c, precision)
    fw.write(0, 2)                  # residual method 0
    fw.write(0, 4)                  # partition order 0
    fw.write(rice_param, 4)
    for i in range(order, n):
        pred = sum(coefs[j] * int(samples[i - 1 - j]) for j in range(order)) >> shift
        fw.write_rice(int(samples[i]) - pred, rice_param)
    fw.align(); fw.write(0, 16)
    return header + fw.bytes()


def test_flac_lpc(tmp_path, flacdec):
    rng = np.random.default_rng(3)
    t = np.arange(120)
    samples = (800 * np.sin(2 * np.pi * t / 30) + rng.integers(-20, 20, 120)).astype(int)
    coefs, shift, precision = [3, -3, 1], 1, 6  # arbitrary quantized predictor
    p = tmp_path / "l.flac"
    p.write_bytes(make_flac_lpc(samples, coefs, shift, precision))
    x, sr = flacdec.decode_flac(str(p), normalize=False)
    np.testing.assert_array_equal(x[0].astype(int), samples)


def test_flac_mid_side(tmp_path, flacdec):
    """Mid/side stereo frame (channel assignment 10) with verbatim subframes."""
    rng = np.random.default_rng(4)
    L = rng.integers(-20000, 20000, 48)
    R = rng.integers(-20000, 20000, 48)
    mid = (L + R) >> 1
    side = L - R

    n, bps, sr = 48, 16, 16000
    si = BitWriter()
    si.write(16, 16); si.write(16, 16); si.write(0, 24); si.write(0, 24)
    si.write(sr, 20); si.write(1, 3); si.write(bps - 1, 5); si.write(n, 36)
    si.write(0, 128)
    header = b"fLaC" + bytes([0x80, 0, 0, len(si.bytes())]) + si.bytes()

    fw = BitWriter()
    fw.write(0x3FFE, 14); fw.write(0, 2)
    fw.write(7, 4); fw.write(0, 4)
    fw.write(10, 4)                 # mid/side
    fw.write(4, 3); fw.write(0, 1)
    fw.write(0, 8); fw.write(n - 1, 16); fw.write(0, 8)
    for vals, width in ((mid, bps), (side, bps + 1)):  # side gets +1 bit
        fw.write(0, 1); fw.write(1, 6); fw.write(0, 1)
        for s in vals:
            fw.write_signed(int(s), width)
    fw.align(); fw.write(0, 16)

    p = tmp_path / "ms.flac"
    p.write_bytes(header + fw.bytes())
    x, sr2 = flacdec.decode_flac(str(p), normalize=False)
    assert x.shape == (2, 48)
    np.testing.assert_array_equal(x[0].astype(int), L)
    np.testing.assert_array_equal(x[1].astype(int), R)
