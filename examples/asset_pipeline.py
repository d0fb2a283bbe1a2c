"""Asset pipeline tour (reference twins: examples/asset/
asset_loading.rs, hot_asset_reloading.rs, processing/asset_processing.rs
— async loads with handles and load states, multi-source paths
(embedded/memory), labeled sub-assets, custom loaders, and the offline
AssetProcessor with hash-gated reprocessing)."""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu.asset import AssetServer, LoadState, LoadedAsset
from bevy_tpu.asset_processor import AssetProcessor


def demo():
    root = Path(tempfile.mkdtemp(prefix="assets_"))
    (root / "level.json").write_text(json.dumps(
        {"spawn": [1, 2], "par": 3}))
    srv = AssetServer(root=str(root))

    # async load: the handle is usable immediately (ref: AssetServer::load)
    h = srv.load("level.json")
    srv._futures[h.id].result()
    print("load state:", srv.load_state(h), "->", srv.get(h))

    # multi-source: embedded bytes + generated in-memory assets
    srv.add_embedded("cfg/defaults.json", b'{"volume": 0.8}')
    print("embedded:", srv.load_sync("embedded://cfg/defaults.json"))

    # custom loader with labeled sub-assets (ref: gltf's labeled assets)
    def loader(path):
        data = json.loads(path.read_text())
        return LoadedAsset(data, labels={k.upper(): v
                                         for k, v in data.items()})

    srv.register_loader(".json", loader)
    print("sub-asset:", srv.load_sync("level.json#PAR"))

    # offline processor: transform + cache with .meta hash gating
    # (ref: AssetProcessor, processor/mod.rs — processed reads)
    processed = Path(tempfile.mkdtemp(prefix="processed_"))
    runs = {"n": 0}

    def double_par(data: bytes, path: Path) -> bytes:
        runs["n"] += 1
        doc = json.loads(data)
        doc["par"] = doc["par"] * 2
        return json.dumps(doc).encode()

    proc = AssetProcessor(str(root), str(processed))
    proc.register(".json", double_par)
    proc.process_all()
    first = runs["n"]
    proc.process_all()                      # unchanged → hash-gated skip
    out = json.loads((processed / "level.json").read_text())
    print(f"processed par={out['par']} (ran {first} then "
          f"{runs['n'] - first} more times)")
    return out["par"], first, runs["n"] - first


if __name__ == "__main__":
    demo()
