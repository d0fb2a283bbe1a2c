"""Embedded assets (reference twin: examples/asset/embedded_asset.rs —
assets bundled in the binary via the embedded:// source; AssetServer's
embedded/memory registry plays that role)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu.asset import AssetServer


def main():
    server = AssetServer(root="/tmp")
    # "embed" a texture: bytes registered at build time, addressed by an
    # embedded:// path (ref: embedded_asset! macro)
    px = np.zeros((4, 4, 3), np.uint8)
    px[::2, ::2] = 255
    import io
    try:
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(px).save(buf, format="PNG")
        blob = buf.getvalue()
    except ImportError:
        blob = px.tobytes()
    server.add_embedded("textures/checker.png", blob)
    asset = server.load_sync("embedded://textures/checker.png")
    arr = np.asarray(asset)
    print(f"embedded asset decoded: shape {arr.shape}")


if __name__ == "__main__":
    main()
