"""glTF loading (reference twin: examples/3d/load_gltf.rs — load a
scene file and spawn its meshes/materials/textures).

Generates a small textured two-node .glb on first run (no binary
assets in-repo), then loads it through the asset pipeline and spawns it
with Mesh3dPlugin + texture atlas."""

from __future__ import annotations

import json
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.gltf import load_glb
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh3d import DirectionalLight, Mesh3dPlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.texture import AtlasBuilder
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _cube_geometry(s):
    pos, nrm, uv, tri = [], [], [], []
    faces = [((0, 0, 1), [(-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s)]),
             ((0, 0, -1), [(s, -s, -s), (-s, -s, -s), (-s, s, -s), (s, s, -s)]),
             ((1, 0, 0), [(s, -s, s), (s, -s, -s), (s, s, -s), (s, s, s)]),
             ((-1, 0, 0), [(-s, -s, -s), (-s, -s, s), (-s, s, s), (-s, s, -s)]),
             ((0, 1, 0), [(-s, s, s), (s, s, s), (s, s, -s), (-s, s, -s)]),
             ((0, -1, 0), [(-s, -s, -s), (s, -s, -s), (s, -s, s), (-s, -s, s)])]
    for n, corners in faces:
        b = len(pos)
        pos += corners
        nrm += [n] * 4
        uv += [(0, 1), (1, 1), (1, 0), (0, 0)]
        tri += [(b, b + 1, b + 2), (b, b + 2, b + 3)]
    return (np.asarray(pos, np.float32), np.asarray(nrm, np.float32),
            np.asarray(uv, np.float32), np.asarray(tri, np.uint16))


def generate_glb(path: Path):
    """A two-node glb: one checkered-texture cube, one plain cube."""
    import io

    from PIL import Image

    pos, nrm, uv, tri = _cube_geometry(0.5)
    yy, xx = np.mgrid[0:16, 0:16]
    checker = ((yy // 4 + xx // 4) % 2 * 200 + 55).astype(np.uint8)
    img = np.stack([checker, checker // 2, 255 - checker,
                    np.full_like(checker, 255)], -1)
    png = io.BytesIO()
    Image.fromarray(img).save(png, format="PNG")
    blobs = [pos.tobytes(), nrm.tobytes(), uv.tobytes(), tri.tobytes(),
             png.getvalue()]
    views, off, binc = [], 0, b""
    for b in blobs:
        b += b"\0" * (-len(b) % 4)
        views.append({"buffer": 0, "byteOffset": off, "byteLength": len(b)})
        binc += b
        off += len(b)
    gltf = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"name": "checker", "mesh": 0, "translation": [-0.8, 0, 0]},
            {"name": "plain", "mesh": 1, "translation": [0.8, 0, 0],
             "rotation": [0.0, 0.3826834, 0.0, 0.9238795]},
        ],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0, "NORMAL": 1,
                                            "TEXCOORD_0": 2},
                             "indices": 3, "material": 0}]},
            {"primitives": [{"attributes": {"POSITION": 0, "NORMAL": 1,
                                            "TEXCOORD_0": 2},
                             "indices": 3, "material": 1}]},
        ],
        "materials": [
            {"pbrMetallicRoughness": {
                "baseColorFactor": [1, 1, 1, 1],
                "baseColorTexture": {"index": 0},
                "metallicFactor": 0.0, "roughnessFactor": 0.7}},
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.3, 0.2, 1.0],
                "metallicFactor": 0.2, "roughnessFactor": 0.4}},
        ],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 4, "mimeType": "image/png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 24,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 24,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 24,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 36,
             "type": "SCALAR"},
        ],
        "bufferViews": views,
        "buffers": [{"byteLength": len(binc)}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    total = 12 + 8 + len(js) + 8 + len(binc)
    out = struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(binc), 0x004E4942) + binc
    path.write_bytes(out)


def build_app(width=480, height=270, backend="auto") -> App:
    glb = Path("/tmp/bevy_tpu_demo.glb")
    if not glb.exists():
        generate_glb(glb)
    doc = load_glb(glb)
    atlas = AtlasBuilder(256, 256)
    app = App(capacity=16)
    plugin = Mesh3dPlugin(atlas=atlas, backend=backend)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    doc.spawn(app.world, plugin, atlas=atlas)
    app.world.spawn(DirectionalLight(illuminance=1.1),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.05, 0.93)))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0.6, 3.0)))
    return app


def main():
    from PIL import Image

    app = build_app()
    app.update(dt=1 / 60)
    Image.fromarray(np.asarray(frame_image(app))).save("/tmp/load_gltf.png")
    print("load_gltf: rendered → /tmp/load_gltf.png")


if __name__ == "__main__":
    main()
