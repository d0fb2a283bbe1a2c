"""Soundtrack (reference twin: examples/audio/soundtrack.rs — swap the
music track when the game state changes, crossfading the old sink out
and the new one in over a fade window)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu.audio import AudioMixer, AudioSource, PlaybackSettings

FADE_STEPS = 8
CHUNK = 1102                      # ~25 ms at 44.1 kHz


def crossfade(mixer, out_sink, in_sink):
    """Linear crossfade rendered chunk by chunk (the fade systems of the
    reference, compressed into a loop)."""
    rendered = []
    for i in range(FADE_STEPS):
        t = (i + 1) / FADE_STEPS
        if out_sink is not None:
            out_sink.set_volume(1.0 - t)
        in_sink.set_volume(t)
        rendered.append(mixer.render(CHUNK))
    if out_sink is not None:
        out_sink.stop()
    return np.concatenate(rendered)


def main():
    mixer = AudioMixer()
    calm = mixer.play(AudioSource.sine(220, seconds=4.0),
                      PlaybackSettings(looped=True, volume=1.0))
    intro = mixer.render(CHUNK * 2)
    print(f"calm track rms {float(np.sqrt((intro**2).mean())):.3f}")

    # battle starts: crossfade calm -> tense
    tense = mixer.play(AudioSource.sine(660, seconds=4.0),
                       PlaybackSettings(looped=True, volume=0.0))
    fade = crossfade(mixer, calm, tense)
    a = fade[: CHUNK]
    b = fade[-CHUNK:]

    def dominant_band(x):
        sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        return float(np.fft.rfftfreq(len(x), 1 / 44100)[int(sp.argmax())])

    print(f"fade start dominant {dominant_band(a):.0f} Hz -> "
          f"end {dominant_band(b):.0f} Hz")
    tense.stop()


build_app = None  # host-only example


if __name__ == "__main__":
    main()
