"""Audio playback control (reference twin:
examples/audio/audio_control.rs — pause/resume a sink, change volume
and playback speed at runtime; plus spatial falloff as in
spatial_audio_2d.rs)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu.audio import AudioMixer, AudioSource, PlaybackSettings


def demo():
    mixer = AudioMixer()
    music = mixer.play(AudioSource.sine(220, seconds=2.0),
                       PlaybackSettings(looped=True, volume=0.8))
    out = mixer.render(4410)                       # 0.1 s
    rms_playing = float(np.sqrt((out ** 2).mean()))

    # volume control (ref: AudioSink::set_volume)
    music.set_volume(0.2)
    out = mixer.render(4410)
    rms_quiet = float(np.sqrt((out ** 2).mean()))

    # speed control (ref: AudioSink::set_speed): doubling speed doubles
    # the perceived pitch — estimate via zero crossings
    def zero_crossings(x):
        return int(np.sum(np.diff(np.signbit(x).astype(int)) != 0))

    music.set_volume(0.8)
    music.settings.speed = 1.0
    zc1 = zero_crossings(mixer.render(4410))
    music.settings.speed = 2.0
    zc2 = zero_crossings(mixer.render(4410))

    # pause / resume (ref: AudioSink::pause / play)
    music.pause()
    rms_paused = float(np.sqrt((mixer.render(4410) ** 2).mean()))
    music.play()
    rms_resumed = float(np.sqrt((mixer.render(4410) ** 2).mean()))
    music.stop()

    # spatial falloff (ref: SpatialAudioSink): distance halves the volume
    near = mixer.play(AudioSource.sine(440, seconds=1.0),
                      PlaybackSettings(volume=1.0, spatial=True,
                                       position=(1.0, 0.0, 0.0)))
    rms_near = float(np.sqrt((mixer.render(4410) ** 2).mean()))
    near.stop()
    far = mixer.play(AudioSource.sine(440, seconds=1.0),
                     PlaybackSettings(volume=1.0, spatial=True,
                                      position=(8.0, 0.0, 0.0)))
    rms_far = float(np.sqrt((mixer.render(4410) ** 2).mean()))
    far.stop()

    print(f"playing rms {rms_playing:.3f} -> quiet {rms_quiet:.3f} -> "
          f"paused {rms_paused:.3f} -> resumed {rms_resumed:.3f}")
    print(f"speed 1x zero-crossings {zc1} vs 2x {zc2}")
    print(f"spatial near rms {rms_near:.3f} vs far {rms_far:.3f}")
    return dict(playing=rms_playing, quiet=rms_quiet, paused=rms_paused,
                resumed=rms_resumed, zc1=zc1, zc2=zc2, near=rms_near,
                far=rms_far)


if __name__ == "__main__":
    demo()
