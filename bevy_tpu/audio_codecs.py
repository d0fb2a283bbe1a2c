"""Audio decoders beyond stdlib WAV (reference twin: bevy_audio's
symphonia-backed decoders, `bevy_audio/src/audio_source.rs` feature
list — wav/flac/vorbis/mp3).

Implemented: **FLAC** (native pure-python decoder below — the lossless
format game assets actually ship) and **Ogg-Vorbis/MP3 gating** with a
clear error (no system codec libraries in this environment; symphonia's
role has no numpy equivalent worth 5k lines). The decoder handles the
mainstream encoder output: 16/24-bit, mono/stereo, constant/verbatim/
fixed/LPC subframes, rice residual partitions — i.e. everything
`flac`/`ffmpeg` emit by default.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "load_audio"]


class _Bits:
    """MSB-first bit reader over bytes."""

    __slots__ = ("d", "pos")

    def __init__(self, d):
        self.d = d
        self.pos = 0            # bit position

    def read(self, n):
        v = 0
        d, p = self.d, self.pos
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def read_signed(self, n):
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self):
        d, p = self.d, self.pos
        q = 0
        while not (d[p >> 3] >> (7 - (p & 7))) & 1:
            q += 1
            p += 1
        self.pos = p + 1
        return q

    def rice(self, k):
        q = self.unary()
        r = self.read(k) if k else 0
        v = (q << k) | r
        return (v >> 1) ^ -(v & 1)          # zigzag

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def utf8(self):
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n = 0
        while (b0 << n) & 0x80:
            n += 1
        v = b0 & (0x7F >> n)
        for _ in range(n - 1):
            v = (v << 6) | (self.read(8) & 0x3F)
        return v


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _subframe(br, n, bps):
    # header: 1 pad bit, 6 type bits, 1 wasted-bits flag
    br.read(1)
    styp = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if styp == 0:                               # CONSTANT
        v = br.read_signed(eff)
        out = np.full(n, v, np.int64)
    elif styp == 1:                             # VERBATIM
        out = np.array([br.read_signed(eff) for _ in range(n)], np.int64)
    elif 8 <= styp <= 12:                       # FIXED order 0-4
        order = styp - 8
        out = _predicted(br, n, eff, order, _FIXED_COEFS[order], 0)
    elif styp >= 32:                            # LPC order 1-32
        order = styp - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        shift = br.read_signed(5)
        coefs = [br.read_signed(prec) for _ in range(order)]
        out = _predicted_lpc(br, n, order, warm, coefs, shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {styp}")
    return out << wasted


def _residual(br, n, order):
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    kbits = 4 + method
    esc = (1 << kbits) - 1
    po = br.read(4)
    nparts = 1 << po
    res = np.zeros(n - order, np.int64)
    idx = 0
    for p in range(nparts):
        cnt = (n >> po) - (order if p == 0 else 0)
        k = br.read(kbits)
        if k == esc:
            bits = br.read(5)
            for i in range(cnt):
                res[idx + i] = br.read_signed(bits) if bits else 0
        else:
            for i in range(cnt):
                res[idx + i] = br.rice(k)
        idx += cnt
    return res


def _predicted(br, n, eff, order, coefs, _):
    warm = [br.read_signed(eff) for _ in range(order)]
    res = _residual(br, n, order)
    out = np.zeros(n, np.int64)
    out[:order] = warm
    c = coefs
    for i in range(order, n):
        p = 0
        for j, cj in enumerate(c):
            p += cj * out[i - 1 - j]
        out[i] = p + res[i - order]
    return out


def _predicted_lpc(br, n, order, warm, coefs, shift):
    res = _residual(br, n, order)
    out = np.zeros(n, np.int64)
    out[:order] = warm
    for i in range(order, n):
        p = 0
        for j in range(order):
            p += coefs[j] * out[i - 1 - j]
        out[i] = (p >> shift) + res[i - order]
    return out


def decode_flac(path):
    """Decode a FLAC file → (samples (N,) or (N, ch) float32 in [-1, 1],
    sample_rate)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC file")
    pos = 4
    sr = bps = nch = total = None
    while True:
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        if btype == 0:                       # STREAMINFO
            si = data[pos + 4:pos + 4 + blen]
            bits = int.from_bytes(si[10:18], "big")
            sr = bits >> 44
            nch = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
        pos += 4 + blen
        if last:
            break
    chans = [[] for _ in range(nch)]
    while pos < len(data) - 2:
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            break
        br = _Bits(data)
        br.pos = pos * 8
        br.read(14)                          # sync
        br.read(1)                           # reserved
        blocking = br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        br.utf8()                            # frame/sample number
        if bs_code == 6:
            bsize = br.read(8) + 1
        elif bs_code == 7:
            bsize = br.read(16) + 1
        elif bs_code == 1:
            bsize = 192
        elif 2 <= bs_code <= 5:
            bsize = 576 << (bs_code - 2)
        else:
            bsize = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        br.read(8)                           # CRC-8
        if ch_code < 8:
            sub_ch = ch_code + 1
            mode = "indep"
        else:
            sub_ch = 2
            mode = ("left", "right", "mid")[ch_code - 8]
        subs = []
        for c in range(sub_ch):
            b = bps
            # side channels carry one extra bit
            if (mode == "left" and c == 1) or (mode == "right" and c == 0) \
                    or (mode == "mid" and c == 1):
                b += 1
            subs.append(_subframe(br, bsize, b))
        br.align()
        br.read(16)                          # CRC-16
        pos = br.pos >> 3
        if mode == "indep":
            for c in range(sub_ch):
                chans[c].append(subs[c])
        elif mode == "left":                 # left + side
            chans[0].append(subs[0])
            chans[1].append(subs[0] - subs[1])
        elif mode == "right":                # side + right
            chans[0].append(subs[1] + subs[0])
            chans[1].append(subs[1])
        else:                                # mid + side
            side = subs[1]
            mid = (subs[0] << 1) | (side & 1)
            chans[0].append((mid + side) >> 1)
            chans[1].append((mid - side) >> 1)
    arrs = [np.concatenate(c) if c else np.zeros(0, np.int64)
            for c in chans]
    scale = float(1 << (bps - 1))
    out = np.stack(arrs, -1).astype(np.float32) / scale
    if total:
        out = out[:total]
    if nch == 1:
        out = out[:, 0]
    return out, int(sr)


def load_audio(path):
    """Extension-dispatched audio decode → AudioSource (ref: the
    AudioLoader extension list, bevy_audio/src/audio_source.rs)."""
    from bevy_tpu.audio import AudioSource
    s = str(path)
    if s.endswith(".wav"):
        return AudioSource.from_wav(path)
    if s.endswith(".flac"):
        samples, sr = decode_flac(path)
        return AudioSource(samples, sr)
    if s.endswith((".ogg", ".oga")):
        from bevy_tpu.vorbis import decode_vorbis
        samples, sr = decode_vorbis(path)
        return AudioSource(samples, sr)
    if s.endswith((".mp3", ".aac", ".m4a")):
        samples, sr = decode_via_sdl(path)
        return AudioSource(samples, sr)
    raise ValueError(f"unknown audio format: {s}")


def decode_via_sdl(path, sample_rate=44100):
    """mp3/aac via SDL_mixer (pygame) — the system-codec backend, the
    role symphonia's optional mp3/aac features play for bevy_audio
    (bevy_audio Cargo features; rodio decoders are third-party there
    too). Uses the dummy audio driver so headless images decode without
    a sound device. Raises ValueError when SDL lacks the codec."""
    import os

    import numpy as np

    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    try:
        import pygame
        if not pygame.mixer.get_init():
            pygame.mixer.init(frequency=sample_rate)
        snd = pygame.mixer.Sound(str(path))
        import pygame.sndarray
        arr = pygame.sndarray.array(snd)
    except Exception as e:
        raise ValueError(
            f"{path}: mp3/aac decode needs SDL_mixer with that codec "
            f"({e}); ship wav, flac or ogg") from e
    f = arr.astype(np.float32) / 32768.0
    if f.ndim == 2:
        f = f.mean(-1)
    mixer_sr = pygame.mixer.get_init()[0]
    return f, mixer_sr
