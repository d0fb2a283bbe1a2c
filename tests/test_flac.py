"""FLAC decoder round-trips (ref model: bevy_audio's flac feature via
symphonia). Files are encoded in-test with a minimal bit-writer —
verbatim, constant, and fixed-prediction+rice subframes cover the
decoder's main paths."""

import numpy as np
import pytest

from bevy_tpu.audio_codecs import decode_flac, load_audio


class _W:
    def __init__(self):
        self.bits = []

    def w(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def ws(self, val, n):
        self.w(val & ((1 << n) - 1), n)

    def unary(self, q):
        self.bits.extend([0] * q + [1])

    def rice(self, v, k):
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1
        self.unary(z >> k)
        self.w(z & ((1 << k) - 1), k)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def _streaminfo(sr, nch, bps, total):
    bits = (sr << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    si = bytearray(34)
    si[0:2] = (4096).to_bytes(2, "big")      # min block
    si[2:4] = (4096).to_bytes(2, "big")
    si[10:18] = bits.to_bytes(8, "big")
    return b"\x80\x00\x00\x22" + bytes(si)   # last block, type 0, len 34


def _frame_header(w, bsize, ch_code, bps_code):
    w.w(0b11111111111110, 14)
    w.w(0, 1)          # reserved
    w.w(0, 1)          # fixed blocksize
    w.w(6, 4)          # bs_code 6: 8-bit size-1 follows
    w.w(0, 4)          # sr from streaminfo
    w.w(ch_code, 4)
    w.w(bps_code, 3)
    w.w(0, 1)
    w.w(0, 8)          # frame number 0 (utf8 1 byte)
    w.w(bsize - 1, 8)
    w.w(0, 8)          # CRC-8 (decoder skips)


def test_flac_verbatim_mono(tmp_path):
    samples = np.array([0, 1000, -1000, 32000, -32000, 7, -7, 123],
                       np.int64)
    w = _W()
    _frame_header(w, len(samples), ch_code=0, bps_code=4)
    w.w(0, 1); w.w(1, 6); w.w(0, 1)          # VERBATIM subframe
    for s in samples:
        w.ws(int(s), 16)
    w.align()
    w.w(0, 16)                               # CRC-16
    path = tmp_path / "t.flac"
    path.write_bytes(b"fLaC" + _streaminfo(44100, 1, 16, len(samples)) +
                     w.bytes())
    out, sr = decode_flac(path)
    assert sr == 44100
    np.testing.assert_allclose(out * 32768.0, samples, atol=1e-3)


def test_flac_constant_stereo(tmp_path):
    n = 16
    w = _W()
    _frame_header(w, n, ch_code=1, bps_code=4)   # 2 independent channels
    for val in (5000, -2500):
        w.w(0, 1); w.w(0, 6); w.w(0, 1)          # CONSTANT
        w.ws(val, 16)
    w.align()
    w.w(0, 16)
    path = tmp_path / "t.flac"
    path.write_bytes(b"fLaC" + _streaminfo(48000, 2, 16, n) + w.bytes())
    out, sr = decode_flac(path)
    assert out.shape == (n, 2) and sr == 48000
    assert np.allclose(out[:, 0] * 32768.0, 5000)
    assert np.allclose(out[:, 1] * 32768.0, -2500)


def test_flac_fixed_rice(tmp_path):
    # order-1 fixed prediction: residual[i] = x[i] - x[i-1]
    samples = np.array([100, 103, 105, 104, 110, 108, 111, 115], np.int64)
    res = np.diff(samples)
    w = _W()
    _frame_header(w, len(samples), ch_code=0, bps_code=4)
    w.w(0, 1); w.w(9, 6); w.w(0, 1)          # FIXED order 1 (type 8+1)
    w.ws(int(samples[0]), 16)                # warmup
    w.w(0, 2)                                # residual method 0 (rice 4-bit)
    w.w(0, 4)                                # partition order 0
    k = 2
    w.w(k, 4)
    for r in res:
        w.rice(int(r), k)
    w.align()
    w.w(0, 16)
    path = tmp_path / "t.flac"
    path.write_bytes(b"fLaC" + _streaminfo(44100, 1, 16, len(samples)) +
                     w.bytes())
    out, _ = decode_flac(path)
    np.testing.assert_allclose(out * 32768.0, samples, atol=1e-3)


def test_load_audio_dispatch(tmp_path):
    with pytest.raises(ValueError, match="codec"):
        load_audio(tmp_path / "x.mp3")
