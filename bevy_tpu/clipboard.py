"""Clipboard (reference twin: bevy_clipboard — the arboard-backed
system clipboard resource).

Headless TPU hosts have no window system, so the default store is
in-process; when a real clipboard helper exists on the host
(xclip/pbcopy), reads/writes pass through it. Text inputs paste with
Ctrl+V (wired in bevy_tpu.ui's host tick)."""

from __future__ import annotations

import shutil
import subprocess

from bevy_tpu.app.plugin import Plugin


class Clipboard:
    """ref: the Clipboard resource (get_text/set_text)."""

    def __init__(self, use_system=True):
        self._text = ""
        self._sys = None
        if use_system:
            if shutil.which("xclip"):
                self._sys = ("xclip -selection clipboard",
                             "xclip -selection clipboard -o")
            elif shutil.which("pbcopy"):
                self._sys = ("pbcopy", "pbpaste")

    def set_text(self, text: str):
        self._text = str(text)
        if self._sys:
            try:
                subprocess.run(self._sys[0].split(), input=self._text,
                               text=True, timeout=2, check=False)
            except Exception:
                pass

    def get_text(self) -> str:
        if self._sys:
            try:
                out = subprocess.run(self._sys[1].split(),
                                     capture_output=True, text=True,
                                     timeout=2)
                if out.returncode == 0:
                    return out.stdout
            except Exception:
                pass
        return self._text


class ClipboardPlugin(Plugin):
    """ref: ClipboardPlugin — installs `app.clipboard`."""

    def __init__(self, use_system=True):
        self.use_system = use_system

    def build(self, app):
        app.clipboard = Clipboard(self.use_system)
