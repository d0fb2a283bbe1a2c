"""Audio (reference twin: bevy_audio — AudioPlayer/PlaybackSettings
components, rodio mixer/sink `src/audio_output.rs:9`, spatial falloff).

Host-side: decoding (wav via stdlib) and the mixer are implemented and
tested; a physical output device is out of scope in this environment — the
mixer renders frames into a buffer a host driver can hand to any sink
(the rodio position). Spatial volume uses inverse-distance falloff against
the listener like the reference's spatial scale.
"""

from __future__ import annotations

import wave
from typing import Optional

import numpy as np

from bevy_tpu.app.plugin import Plugin


class AudioSource:
    """Decoded waveform (ref: AudioSource asset)."""

    def __init__(self, samples: np.ndarray, sample_rate: int):
        self.samples = np.asarray(samples, np.float32)  # (n,) or (n, 2)
        self.sample_rate = int(sample_rate)

    @classmethod
    def from_wav(cls, path):
        with wave.open(str(path), "rb") as w:
            n = w.getnframes()
            raw = np.frombuffer(w.readframes(n), dtype=np.int16)
            ch = w.getnchannels()
            data = raw.astype(np.float32) / 32768.0
            if ch > 1:
                data = data.reshape(-1, ch)[:, :2]
            return cls(data, w.getframerate())

    @classmethod
    def sine(cls, freq=440.0, seconds=1.0, sample_rate=44100):
        t = np.arange(int(seconds * sample_rate)) / sample_rate
        return cls(np.sin(2 * np.pi * freq * t).astype(np.float32),
                   sample_rate)

    @property
    def duration(self):
        return len(self.samples) / self.sample_rate


class PlaybackSettings:
    """ref: PlaybackSettings (ONCE / LOOP / DESPAWN semantics)."""

    def __init__(self, volume=1.0, speed=1.0, looped=False, paused=False,
                 spatial=False, position=(0.0, 0.0, 0.0)):
        self.volume = volume
        self.speed = speed
        self.looped = looped
        self.paused = paused
        self.spatial = spatial
        self.position = np.asarray(position, np.float32)


class AudioSink:
    """Control over one playing sound (ref: AudioSink)."""

    def __init__(self, source: AudioSource, settings: PlaybackSettings):
        self.source = source
        self.settings = settings
        self.cursor = 0.0   # sample position
        self.stopped = False

    def pause(self):
        self.settings.paused = True

    def play(self):
        self.settings.paused = False

    def stop(self):
        self.stopped = True

    def set_volume(self, v):
        self.settings.volume = v

    @property
    def finished(self):
        return self.stopped or (not self.settings.looped and
                                self.cursor >= len(self.source.samples))


class AudioMixer:
    """ref: rodio's mixer. `render(n)` produces the next n output samples,
    advancing all sinks; a host output loop would feed these to a device."""

    def __init__(self, sample_rate=44100, listener=(0.0, 0.0, 0.0),
                 spatial_scale=1.0):
        self.sample_rate = sample_rate
        self.sinks: list[AudioSink] = []
        self.listener = np.asarray(listener, np.float32)
        self.spatial_scale = spatial_scale

    def play(self, source: AudioSource,
             settings: Optional[PlaybackSettings] = None) -> AudioSink:
        sink = AudioSink(source, settings or PlaybackSettings())
        self.sinks.append(sink)
        return sink

    def render(self, n: int) -> np.ndarray:
        out = np.zeros(n, np.float32)
        for sink in list(self.sinks):
            if sink.finished:
                self.sinks.remove(sink)
                continue
            if sink.settings.paused:
                continue
            src = sink.source.samples
            mono = src if src.ndim == 1 else src.mean(-1)
            step = sink.settings.speed * sink.source.sample_rate / self.sample_rate
            idx = sink.cursor + np.arange(n) * step
            if sink.settings.looped:
                idx = idx % len(mono)
            valid = idx < len(mono)
            samples = np.where(valid, mono[np.minimum(
                idx.astype(np.int64), len(mono) - 1)], 0.0)
            vol = sink.settings.volume
            if sink.settings.spatial:
                d = np.linalg.norm(sink.settings.position - self.listener)
                vol = vol / (1.0 + d * self.spatial_scale)
            out += samples * vol
            sink.cursor = float(idx[-1] + step)
        return np.clip(out, -1.0, 1.0)

    def render_stereo(self, n: int) -> np.ndarray:
        """(n, 2) stereo mix: spatial sinks pan by listener-relative x
        with equal-power panning (ref: rodio's SpatialSink dual-ear
        model, collapsed to constant-power pan)."""
        out = np.zeros((n, 2), np.float32)
        for sink in list(self.sinks):
            if sink.finished:
                self.sinks.remove(sink)
                continue
            if sink.settings.paused:
                continue
            src = sink.source.samples
            mono = src if src.ndim == 1 else src.mean(-1)
            step = sink.settings.speed * sink.source.sample_rate / \
                self.sample_rate
            idx = sink.cursor + np.arange(n) * step
            if sink.settings.looped:
                idx = idx % len(mono)
            valid = idx < len(mono)
            samples = np.where(valid, mono[np.minimum(
                idx.astype(np.int64), len(mono) - 1)], 0.0)
            vol = sink.settings.volume
            pan = 0.5
            if sink.settings.spatial:
                rel = sink.settings.position - self.listener
                d = np.linalg.norm(rel)
                vol = vol / (1.0 + d * self.spatial_scale)
                if d > 1e-6:
                    pan = 0.5 + 0.5 * np.clip(rel[0] / max(d, 1e-6), -1, 1)
            theta = pan * np.pi / 2
            out[:, 0] += samples * vol * np.cos(theta)
            out[:, 1] += samples * vol * np.sin(theta)
            sink.cursor = float(idx[-1] + step)
        return np.clip(out, -1.0, 1.0)




class WavOutput:
    """Host audio "device": drains the mixer in real-time-sized chunks
    each frame and writes a 16-bit PCM .wav on save (the headless stand-
    in for rodio's OutputStream — ref: audio_output.rs)."""

    def __init__(self, path, sample_rate=44100):
        self.path = path
        self.sample_rate = sample_rate
        self.chunks = []

    def push(self, samples: np.ndarray):
        self.chunks.append(np.asarray(samples, np.float32))

    @property
    def frames_written(self):
        return sum(len(c) for c in self.chunks)

    def save(self):
        import struct
        import wave

        data = (np.clip(np.concatenate(self.chunks) if self.chunks
                        else np.zeros(1, np.float32), -1, 1)
                * 32767).astype(np.int16)
        with wave.open(str(self.path), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(self.sample_rate)
            f.writeframes(data.tobytes())
        return self.path


class PipeOutput:
    """Real-device output via an `aplay`-compatible subprocess (ref:
    audio_output.rs — the rodio OutputStream role, as a pipe to the
    system player). Mixed f32 chunks are converted to 16-bit PCM and
    streamed to the child's stdin:

        AudioPlugin(output=PipeOutput())          # /usr/bin/aplay
        AudioPlugin(output=PipeOutput(["pacat", "--format=s16le"]))

    Raises FileNotFoundError at construction when the player binary is
    absent, so headless images fail fast and fall back to WavOutput."""

    def __init__(self, command=None, sample_rate=44100):
        import subprocess
        import time

        self.sample_rate = sample_rate
        cmd = command or ["aplay", "-q", "-f", "S16_LE",
                          "-r", str(sample_rate), "-c", "1", "-t", "raw"]
        self.proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)
        self.frames_written = 0
        self.dead = False
        # Prime: a player binary that exists but has no device exits
        # right after startup; writing then raises BrokenPipeError from
        # the mixer drain. Probe with a short silent write + poll so
        # open_audio_output can fall through to WavOutput instead.
        try:
            self.proc.stdin.write(b"\x00\x00" * 64)
            self.proc.stdin.flush()
            time.sleep(0.05)
            if self.proc.poll() is not None:
                raise OSError(
                    f"player exited rc={self.proc.returncode} (no device?)")
        except (BrokenPipeError, OSError):
            self.close()
            raise

    def push(self, samples: np.ndarray):
        if self.dead:
            return
        pcm = (np.clip(np.asarray(samples, np.float32), -1, 1)
               * 32767).astype(np.int16)
        try:
            self.proc.stdin.write(pcm.tobytes())
            self.proc.stdin.flush()
        except (BrokenPipeError, OSError):
            self.dead = True          # device vanished mid-run: go silent
            return
        self.frames_written += len(pcm)

    def close(self):
        try:
            if self.proc.stdin:
                self.proc.stdin.close()
        except (BrokenPipeError, OSError):
            pass
        try:
            self.proc.wait(timeout=5)
        except Exception:
            self.proc.kill()


class AlsaOutput:
    """Direct ALSA PCM output via ctypes on libasound (ref:
    audio_output.rs:9 — the cpal/rodio device; feature-flagged: construct
    only where /dev/snd exists). Uses the blocking writei API on the
    `default` device, S16_LE mono."""

    def __init__(self, device=b"default", sample_rate=44100):
        import ctypes

        self._lib = ctypes.CDLL("libasound.so.2")   # raises when absent
        self.sample_rate = sample_rate
        self._pcm = ctypes.c_void_p()
        # SND_PCM_STREAM_PLAYBACK = 0, blocking mode = 0
        rc = self._lib.snd_pcm_open(ctypes.byref(self._pcm), device, 0, 0)
        if rc < 0:
            raise OSError(f"snd_pcm_open failed: {rc}")
        # format SND_PCM_FORMAT_S16_LE=2, access RW_INTERLEAVED=3,
        # 1 channel, latency 100ms
        rc = self._lib.snd_pcm_set_params(
            self._pcm, 2, 3, 1, sample_rate, 1, 100000)
        if rc < 0:
            raise OSError(f"snd_pcm_set_params failed: {rc}")
        self.frames_written = 0

    def push(self, samples: np.ndarray):
        import ctypes

        pcm = (np.clip(np.asarray(samples, np.float32), -1, 1)
               * 32767).astype(np.int16)
        buf = pcm.tobytes()
        n = self._lib.snd_pcm_writei(
            self._pcm, ctypes.c_char_p(buf), len(pcm))
        if n < 0:                        # underrun etc: try to recover
            self._lib.snd_pcm_recover(self._pcm, n, 1)
            n = self._lib.snd_pcm_writei(
                self._pcm, ctypes.c_char_p(buf), len(pcm))
        self.frames_written += max(int(n), 0)

    def close(self):
        self._lib.snd_pcm_drain(self._pcm)
        self._lib.snd_pcm_close(self._pcm)


def open_audio_output(path_fallback="/tmp/bevy_tpu_audio.wav",
                      sample_rate=44100):
    """Best real output available: ALSA device → aplay pipe → WAV drain
    (the reference's device enumeration fallback, flattened)."""
    try:
        return AlsaOutput(sample_rate=sample_rate)
    except Exception:
        pass
    try:
        return PipeOutput(sample_rate=sample_rate)
    except Exception:
        pass
    return WavOutput(path_fallback, sample_rate=sample_rate)


class AudioPlugin(Plugin):
    """ref: AudioPlugin — exposes `app.audio` (mixer), registers the
    .wav loader with the asset server if present, and (when `output` is
    given) drains one frame's worth of mixed samples per update into the
    output driver — the full decode → mix → device chain, headless."""

    def __init__(self, sample_rate=44100, output=None):
        self.sample_rate = sample_rate
        self.output = output

    def build(self, app):
        app.audio = AudioMixer(self.sample_rate)
        server = getattr(app, "assets", None)
        if server is not None:
            # every decodable format (ref: the AudioLoader extension
            # list, bevy_audio/src/audio_source.rs) — wav/flac native,
            # ogg via the owned Vorbis decoder, mp3/aac via SDL_mixer
            from bevy_tpu.audio_codecs import load_audio
            for ext in (".wav", ".flac", ".ogg", ".oga", ".mp3",
                        ".aac", ".m4a"):
                server.register_loader(ext, load_audio)
        out = self.output
        if out is not None:
            sr = self.sample_rate

            def drain(app_):
                dt = getattr(app_, "last_dt", 1.0 / 60.0) or 1.0 / 60.0
                out.push(app_.audio.render(max(int(sr * dt), 1)))

            app.add_frame_hook(drain)
