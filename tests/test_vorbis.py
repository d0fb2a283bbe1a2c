"""Ogg/Vorbis decoder (ref model: bevy_audio's vorbis feature — the
default bevy audio format). Test vectors are the reference repo's CC0
sound assets (real libvorbis streams: floor1, residue type 2, square
polar coupling, long/short block switching)."""

from pathlib import Path

import numpy as np
import pytest

ASSETS = Path("/root/reference/assets/sounds")
BLIP = ASSETS / "breakout_collision.ogg"


pytestmark = pytest.mark.skipif(
    not BLIP.exists(), reason="reference sound assets not present")


def test_decode_blip_stats():
    from bevy_tpu.vorbis import decode_vorbis

    pcm, sr = decode_vorbis(BLIP)
    assert sr == 44100
    assert pcm.shape[1] == 1
    dur = pcm.shape[0] / sr
    assert 0.1 < dur < 0.2, dur
    x = pcm[:, 0]
    rms = float(np.sqrt((x ** 2).mean()))
    assert 0.05 < rms < 0.5, rms          # real signal, not noise/silence
    assert float(np.abs(x).max()) <= 1.0
    assert np.isfinite(x).all()
    # percussive shape: early peak, monotonic-ish decay to near silence
    env = np.abs(x[:len(x) // 10 * 10]).reshape(10, -1).max(1)
    assert env[:3].max() > 4 * env[-1], env
    assert env[-1] < 0.1


def test_decode_through_audio_loader():
    from bevy_tpu.audio_codecs import load_audio

    src = load_audio(BLIP)
    assert src.sample_rate == 44100
    assert src.samples.shape[0] > 4000


def test_ogg_packet_framing():
    """Header packets reassemble: identification first (packtype 1),
    then comment (3), then setup (5)."""
    from bevy_tpu.vorbis import ogg_packets

    pkts = ogg_packets(BLIP.read_bytes())
    p1, _ = next(pkts)
    assert p1[0] == 1 and p1[1:7] == b"vorbis"
    p2, _ = next(pkts)
    assert p2[0] == 3 and p2[1:7] == b"vorbis"
    p3, _ = next(pkts)
    assert p3[0] == 5 and p3[1:7] == b"vorbis"
    n_audio = sum(1 for p, _ in pkts if p and not (p[0] & 1))
    assert n_audio > 3


def test_bit_reader_lsb_first():
    from bevy_tpu.vorbis import Bits

    br = Bits(bytes([0b10110100, 0b0110_0011]))
    assert br.read(3) == 0b100
    assert br.read(6) == 0b110110   # spans the byte boundary, LSB first
    assert br.read(7) == 0b0110001
