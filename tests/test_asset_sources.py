"""Asset pipeline depth (ref models: bevy_asset multi-source readers
`io/source.rs` — embedded/memory/http — plus labeled sub-assets and
dependency-gated load state, `server/mod.rs:364,588`)."""

import json

import numpy as np
import pytest

from bevy_tpu.asset import AssetServer, LoadedAsset, LoadState


def test_embedded_source(tmp_path):
    srv = AssetServer(root=str(tmp_path))
    srv.add_embedded("cfg/settings.json", b'{"speed": 3}')
    out = srv.load_sync("embedded://cfg/settings.json")
    assert out == {"speed": 3}


def test_memory_source_image(tmp_path):
    from PIL import Image
    import io
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., 1] = 255
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    srv = AssetServer(root=str(tmp_path))
    srv.add_memory("gen/tex.png", buf.getvalue())
    out = srv.load_sync("memory://gen/tex.png")
    assert out.shape == (4, 4, 4) and out[..., 1].min() == 255


def test_missing_embedded_fails(tmp_path):
    srv = AssetServer(root=str(tmp_path))
    h = srv.load("embedded://nope.json")
    srv._futures[h.id].result()
    assert srv.load_state(h) == LoadState.FAILED


def test_labeled_sub_assets(tmp_path):
    (tmp_path / "multi.json").write_text(json.dumps(
        {"a": 1, "b": 2}))
    srv = AssetServer(root=str(tmp_path))

    def loader(path):
        data = json.loads(path.read_text())
        return LoadedAsset(data, labels={f"Part{k}": v
                                         for k, v in data.items()})

    srv.register_loader(".json", loader)
    whole = srv.load_sync("multi.json")
    assert whole == {"a": 1, "b": 2}
    part = srv.load_sync("multi.json#Parta")
    assert part == 1
    h = srv.load("multi.json")
    assert srv.get_labeled(h, "Partb") == 2
    bad = srv.load("multi.json#Nope")
    srv._futures[bad.id].result()
    assert srv.load_state(bad) == LoadState.FAILED


def test_dependency_gated_state(tmp_path):
    (tmp_path / "dep.json").write_text('{"leaf": true}')
    (tmp_path / "main.json").write_text('{"uses": "dep.json"}')
    srv = AssetServer(root=str(tmp_path))

    def loader(path):
        data = json.loads(path.read_text())
        deps = [data["uses"]] if "uses" in data else []
        return LoadedAsset(data, dependencies=deps)

    srv.register_loader(".json", loader)
    h = srv.load("main.json")
    srv._futures[h.id].result()
    # drain dependency futures
    for dep in srv._deps[h.id]:
        srv._futures[dep.id].result()
    assert srv.load_state_with_dependencies(h) == LoadState.LOADED
    assert srv.get(srv._deps[h.id][0]) == {"leaf": True}


def test_http_source_gated(tmp_path):
    srv = AssetServer(root=str(tmp_path))
    h = srv.load("http://127.0.0.1:1/never.json")
    srv._futures[h.id].result()
    assert srv.load_state(h) == LoadState.FAILED
    assert "egress" in str(srv._assets[h.id]) or "unreachable" in \
        str(srv._assets[h.id])


def test_inotify_watcher_reloads_on_write(tmp_path):
    """Event-driven hot reload (ref: bevy_asset's notify FileWatcher):
    a write lands in the next check without an mtime poll sweep."""
    import time

    from bevy_tpu.asset import AssetServer, LoadState
    from bevy_tpu.asset_watch import attach_watcher

    f = tmp_path / "note.txt"
    f.write_text("v1")
    server = AssetServer(str(tmp_path), watch=True)
    server.register_loader(".txt", lambda p: p.read_text())
    h = server.load("note.txt")
    server.block_on(h) if hasattr(server, "block_on") else None
    for _ in range(50):
        if server.load_state(h) == LoadState.LOADED:
            break
        time.sleep(0.02)
    assert server.get(h) == "v1"

    watcher = attach_watcher(server)
    if watcher is None:
        import pytest
        pytest.skip("inotify unavailable on this platform")
    assert server.check_watched() == 0      # quiescent: no events
    f.write_text("v2")
    time.sleep(0.05)
    n = server.check_watched()
    assert n == 1, n
    assert server.get(h) == "v2"
    # sub-second double edit still lands (the poll would miss mtimes)
    f.write_text("v3")
    time.sleep(0.05)
    assert server.check_watched() == 1
    assert server.get(h) == "v3"
    watcher.close()
