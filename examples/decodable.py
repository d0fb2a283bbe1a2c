"""Custom decodable source (reference twin:
examples/audio/decodable.rs — implement a procedural Decodable source;
here a generator function builds the sample stream)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu.audio import AudioMixer, AudioSource, PlaybackSettings


def sawtooth_source(freq=220.0, seconds=1.0, rate=44100):
    """The custom 'decoder': any callable producing samples becomes an
    AudioSource (the Decodable trait's role)."""
    t = np.arange(int(seconds * rate)) / rate
    wave = 2.0 * (t * freq - np.floor(t * freq + 0.5))
    return AudioSource(wave.astype(np.float32) * 0.4, rate)


def main():
    mixer = AudioMixer()
    mixer.play(sawtooth_source(), PlaybackSettings(looped=True))
    chunk = mixer.render(4096)
    # a sawtooth has rich harmonics: verify non-sine crest factor
    crest = float(np.abs(chunk).max() / (np.sqrt((chunk ** 2).mean())))
    print(f"sawtooth crest factor: {crest:.2f} (sine would be ~1.41)")


if __name__ == "__main__":
    main()
