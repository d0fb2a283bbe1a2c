"""Spatial audio 2D (reference twin:
examples/audio/spatial_audio_2d.rs — an emitter orbits the listener;
stereo pan + distance falloff follow it)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu.audio import AudioMixer, AudioSource, PlaybackSettings


def main():
    mixer = AudioMixer(listener=(0.0, 0.0, 0.0), spatial_scale=0.2)
    tone = AudioSource.sine(330.0, seconds=4.0)
    sink = mixer.play(tone, PlaybackSettings(
        looped=True, spatial=True, position=(5.0, 0.0, 0.0)))
    # orbit the emitter; sample the stereo mix at 8 positions
    levels = []
    for k in range(8):
        a = k / 8 * 2 * np.pi
        sink.settings.position = np.asarray(
            [5.0 * np.cos(a), 5.0 * np.sin(a), 0.0], np.float32)
        chunk = mixer.render_stereo(2048) if hasattr(
            mixer, "render_stereo") else mixer.render(2048)
        if chunk.ndim == 2:
            l, r = np.abs(chunk[:, 0]).mean(), np.abs(chunk[:, 1]).mean()
            levels.append((round(float(l), 3), round(float(r), 3)))
        else:
            levels.append(round(float(np.abs(chunk).mean()), 3))
    print("stereo levels around the orbit:", levels)


if __name__ == "__main__":
    main()
