"""Asset server + diagnostics tests (ref models: bevy_asset server tests,
bevy_diagnostic ring-buffer semantics)."""

import json
import time

import numpy as np
import pytest

from bevy_tpu import App
from bevy_tpu.asset import AssetPlugin, AssetServer, LoadState
from bevy_tpu.diagnostic import (
    Diagnostic, FrameTimeDiagnosticsPlugin, LogDiagnosticsPlugin,
)
from bevy_tpu.time import TimePlugin


def test_async_load_and_get(tmp_path):
    (tmp_path / "data.json").write_text(json.dumps({"hp": 5}))
    server = AssetServer(root=str(tmp_path))
    h = server.load("data.json")
    deadline = time.time() + 5
    while server.load_state(h) == LoadState.LOADING and time.time() < deadline:
        time.sleep(0.01)
    assert server.load_state(h) == LoadState.LOADED
    assert server.get(h) == {"hp": 5}
    # same path → same handle (ref: path de-dup)
    assert server.load("data.json") is h


def test_image_loader(tmp_path):
    from PIL import Image
    Image.fromarray(np.full((4, 4, 4), 128, np.uint8)).save(tmp_path / "t.png")
    server = AssetServer(root=str(tmp_path))
    img = server.load_sync("t.png")
    assert img.shape == (4, 4, 4) and img.dtype == np.uint8


def test_failed_load_reported(tmp_path):
    server = AssetServer(root=str(tmp_path))
    h = server.load("missing.png")
    deadline = time.time() + 5
    while server.load_state(h) == LoadState.LOADING and time.time() < deadline:
        time.sleep(0.01)
    assert server.load_state(h) == LoadState.FAILED
    assert server.get(h) is None


def test_hot_reload(tmp_path):
    f = tmp_path / "cfg.json"
    f.write_text(json.dumps({"v": 1}))
    server = AssetServer(root=str(tmp_path))
    h = server.load("cfg.json")
    assert server.load_sync("cfg.json") == {"v": 1}
    time.sleep(0.05)
    f.write_text(json.dumps({"v": 2}))
    import os
    os.utime(f, (time.time() + 2, time.time() + 2))
    server.check_modified()
    assert server.get(h) == {"v": 2}
    kinds = [k for k, _ in server.drain_events()]
    assert "modified" in kinds


def test_frame_time_diagnostics():
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), FrameTimeDiagnosticsPlugin())
    for _ in range(5):
        app.update(dt=1 / 60)
    store = app.diagnostics
    ft = store.get(FrameTimeDiagnosticsPlugin.FRAME_TIME)
    assert ft.value is not None and ft.value > 0
    assert store.get(FrameTimeDiagnosticsPlugin.FRAME_COUNT).value == 5
    assert store.get(FrameTimeDiagnosticsPlugin.FPS).average > 0


def test_diagnostic_smoothing():
    d = Diagnostic("x", max_history=4)
    for v in [10.0, 20.0, 30.0]:
        d.add_measurement(v)
    assert d.value == 30.0
    assert d.average == 20.0
    assert 10.0 < d.smoothed < 30.0
