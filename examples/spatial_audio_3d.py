"""Spatial audio 3D (reference twin:
examples/audio/spatial_audio_3d.rs — distance attenuation as the
emitter flies past the listener in 3D)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu.audio import AudioMixer, AudioSource, PlaybackSettings


def main():
    mixer = AudioMixer(listener=(0.0, 1.0, 0.0), spatial_scale=0.35)
    tone = AudioSource.sine(440.0, seconds=6.0)
    sink = mixer.play(tone, PlaybackSettings(
        looped=True, spatial=True, position=(-20.0, 1.0, 4.0)))
    levels = []
    for x in np.linspace(-20.0, 20.0, 9):
        sink.settings.position = np.asarray([x, 1.0, 4.0], np.float32)
        chunk = mixer.render(2048)
        levels.append(round(float(np.abs(chunk).mean()), 4))
    peak = int(np.argmax(levels))
    print("fly-by levels:", levels)
    print(f"loudest at sample {peak} (closest approach)")


if __name__ == "__main__":
    main()
