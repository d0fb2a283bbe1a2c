"""Pitch source (reference twin: examples/audio/pitch.rs — play a pure
tone at a frequency chosen at runtime; the Pitch audio source)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu.audio import AudioMixer, AudioSource, PlaybackSettings

NOTES = {"A4": 440.0, "C5": 523.25, "E5": 659.25}


def main():
    mixer = AudioMixer()
    for name, hz in NOTES.items():
        sink = mixer.play(AudioSource.sine(hz, seconds=0.2),
                          PlaybackSettings(volume=0.9))
        chunk = mixer.render(4410)           # 0.1 s
        sink.stop()
        sp = np.abs(np.fft.rfft(chunk * np.hanning(len(chunk))))
        peak = float(np.fft.rfftfreq(len(chunk), 1 / 44100)[int(sp.argmax())])
        print(f"{name}: asked {hz:.2f} Hz, measured {peak:.1f} Hz")


build_app = None  # host-only example


if __name__ == "__main__":
    main()
