"""Audio output driver (ref model: bevy_audio's rodio OutputStream —
here the headless decode → mix → device chain writes a WAV)."""

import wave

import numpy as np

from bevy_tpu import App
from bevy_tpu.audio import AudioPlugin, AudioSource, WavOutput
from bevy_tpu.time import TimePlugin


def test_wav_output_drains_mixer(tmp_path):
    out = WavOutput(tmp_path / "out.wav", sample_rate=8000)
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), AudioPlugin(sample_rate=8000, output=out))
    app.audio.play(AudioSource.sine(440.0, seconds=0.5, sample_rate=8000))
    for _ in range(6):
        app.update(dt=1 / 60)
    assert out.frames_written >= 6 * int(8000 / 60) - 6
    path = out.save()
    with wave.open(str(path), "rb") as f:
        assert f.getframerate() == 8000
        data = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    # the sine actually made it through the mixer
    assert np.abs(data.astype(np.int32)).max() > 1000


def test_stereo_spatial_pan():
    """ref model: rodio SpatialSink — a source to the listener's right
    is louder in the right channel."""
    from bevy_tpu.audio import AudioMixer, AudioSource, PlaybackSettings

    m = AudioMixer(sample_rate=8000, listener=(0.0, 0.0, 0.0))
    m.play(AudioSource.sine(440.0, 0.5, 8000),
           PlaybackSettings(spatial=True, position=(5.0, 0.0, 0.0)))
    out = m.render_stereo(800)
    assert out.shape == (800, 2)
    assert np.abs(out[:, 1]).max() > np.abs(out[:, 0]).max() * 2


def test_pipe_output_streams_pcm(tmp_path):
    """PipeOutput drives an aplay-compatible player; a stand-in binary
    captures the PCM stream so the device path is exercised headless."""
    import numpy as np

    from bevy_tpu.audio import PipeOutput

    sink = tmp_path / "captured.pcm"
    fake = tmp_path / "fake_aplay"
    fake.write_text("#!/bin/sh\ncat > " + str(sink) + "\n")
    fake.chmod(0o755)

    out = PipeOutput(command=[str(fake)])
    tone = np.sin(np.linspace(0, 2 * np.pi * 10, 4410)).astype(np.float32)
    out.push(tone)
    out.close()
    data = np.frombuffer(sink.read_bytes(), np.int16)
    # construction primes the pipe with 64 silent samples (no-device
    # probe) before the pushed tone
    assert len(data) == 64 + 4410
    assert not data[:64].any()
    assert abs(int(data[64:].max()) - 32767) < 64     # full-scale sine
    assert out.frames_written == 4410


def test_alsa_output_unavailable_raises_cleanly():
    """Without libasound (headless image) AlsaOutput must raise at
    construction — the open_audio_output chain then falls back."""
    import pytest

    from bevy_tpu.audio import AlsaOutput, WavOutput, open_audio_output

    try:
        import ctypes
        ctypes.CDLL("libasound.so.2")
        has_alsa = True
    except OSError:
        has_alsa = False
    if not has_alsa:
        with pytest.raises(Exception):
            AlsaOutput()
        out = open_audio_output()
        assert isinstance(out, WavOutput)  # no aplay in the image either


def test_pipe_output_dead_player_falls_back(tmp_path):
    """A player binary that exists but exits immediately (no audio
    device) must fail at construction so open_audio_output degrades to
    WavOutput instead of BrokenPipeError-ing the mixer drain later."""
    import pytest

    from bevy_tpu.audio import PipeOutput

    fake = tmp_path / "fake_aplay_nodev"
    fake.write_text("#!/bin/sh\nexit 1\n")
    fake.chmod(0o755)
    with pytest.raises((OSError, BrokenPipeError)):
        PipeOutput(command=[str(fake)])


def test_pipe_output_mid_run_death_goes_silent(tmp_path):
    """If the player dies mid-run, push() marks the output dead and
    returns instead of raising from the mixer drain."""
    import numpy as np

    from bevy_tpu.audio import PipeOutput

    sink = tmp_path / "c.pcm"
    fake = tmp_path / "fake_aplay_dies"
    # consume the prime + first chunk, then exit
    fake.write_text("#!/bin/sh\nhead -c 9000 > " + str(sink) + "\nexit 0\n")
    fake.chmod(0o755)
    out = PipeOutput(command=[str(fake)])
    tone = np.zeros(44100, np.float32)
    for _ in range(8):
        out.push(tone)                 # must not raise
    assert out.dead
    out.close()
