"""Settings persistence tests (ref model: bevy_settings round-trip)."""

from bevy_tpu import App
from bevy_tpu.settings import Settings, SettingsPlugin
from bevy_tpu.time import TimePlugin


def test_defaults_and_persistence(tmp_path):
    p = tmp_path / "settings.json"
    s = Settings(p)
    g = s.register_group("video", {"width": 1280, "vsync": True})
    assert g["width"] == 1280
    s.set("video", "width", 1920)
    s.save()

    s2 = Settings(p)
    g2 = s2.register_group("video", {"width": 1280, "vsync": True})
    assert g2["width"] == 1920        # stored value wins
    assert g2["vsync"] is True        # default fills missing


def test_plugin_autosaves(tmp_path):
    p = tmp_path / "s.json"
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), SettingsPlugin(path=str(p), autosave_every=3))
    app.settings.register_group("audio", {"volume": 0.8})
    app.settings.set("audio", "volume", 0.5)
    for _ in range(4):
        app.update(dt=1 / 60)
    assert p.exists()
    assert Settings(p).get("audio", "volume") == 0.5


def test_corrupt_file_recovers(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text("{not json")
    s = Settings(p)
    assert s.register_group("a", {"x": 1})["x"] == 1
