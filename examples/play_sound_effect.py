"""One-shot sound effects (reference twin:
examples/audio/play_sound_effect.rs — fire-and-forget sinks that
auto-remove when finished)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu.audio import AudioMixer, AudioSource, PlaybackSettings


def main():
    mixer = AudioMixer()
    blip = AudioSource.sine(880.0, seconds=0.05)
    for k in range(3):                  # three overlapping one-shots
        mixer.play(blip, PlaybackSettings(volume=0.5))
        mixer.render(1024)
    print("live sinks while playing:", len(mixer.sinks))
    # drain past the end: finished sinks despawn (PlaybackSettings::ONCE)
    for _ in range(8):
        mixer.render(1024)
    print("live sinks after finish:", len(mixer.sinks))


if __name__ == "__main__":
    main()
