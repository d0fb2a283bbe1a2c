"""Persistent user settings (reference twin: bevy_settings —
SettingsPlugin + SettingsGroup resources persisted to disk,
`src/lib.rs:110,167`, `src/store_fs.rs`).

Host-side JSON store: register setting groups (plain dicts of JSON-able
values); they load at build, save on change (explicitly or at app exit via
a frame hook watching dirtiness).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

from bevy_tpu.app.plugin import Plugin


class Settings:
    def __init__(self, path):
        self.path = Path(path)
        self._data: Dict[str, Dict[str, Any]] = {}
        self._dirty = False
        if self.path.exists():
            try:
                self._data = json.loads(self.path.read_text())
            except (json.JSONDecodeError, OSError):
                self._data = {}

    def register_group(self, name: str, defaults: Dict[str, Any]):
        """Defaults apply for missing keys; stored values win (ref:
        SettingsGroup registration)."""
        group = dict(defaults)
        group.update(self._data.get(name, {}))
        self._data[name] = group
        self._dirty = True
        return group

    def get(self, name: str, key: str):
        return self._data[name][key]

    def set(self, name: str, key: str, value):
        self._data.setdefault(name, {})[key] = value
        self._dirty = True

    def group(self, name: str) -> Dict[str, Any]:
        return dict(self._data.get(name, {}))

    def save(self):
        if not self._dirty:
            return
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(self._data, indent=1, sort_keys=True))
        self._dirty = False


class SettingsPlugin(Plugin):
    """ref: SettingsPlugin. `app.settings` is the store; saves whenever
    dirty at frame boundaries (the fs-store flush position)."""

    def __init__(self, path="settings.json", autosave_every: int = 60):
        self.path = path
        self.autosave_every = autosave_every

    def build(self, app):
        store = Settings(self.path)
        app.settings = store
        counter = {"n": 0}
        every = self.autosave_every

        def tick(app_):
            counter["n"] += 1
            if counter["n"] % every == 0:
                store.save()

        app.add_frame_hook(tick)
