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
