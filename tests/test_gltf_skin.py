"""glTF skins/animations/textures (ref models: bevy_gltf loader tests —
skinned mesh sub-assets, animation clip import, baseColorTexture).

Builds a synthetic .glb in-memory: a 2-bone vertical "arm" (8-vertex
prism), bone1 rotating 90° about Z over 1s, plus a 2x2 PNG texture.
"""

import io
import json
import struct

import numpy as np
import pytest

from bevy_tpu.gltf import load_glb


def _pack_glb(gltf: dict, bin_chunk: bytes) -> bytes:
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    bin_chunk += b"\0" * (-len(bin_chunk) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    out = struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk
    return out


def _build_skinned_glb(path):
    from PIL import Image

    # geometry: prism of 8 verts, two segments along +Y (0..1..2)
    pos = np.asarray([
        [-0.1, 0.0, -0.1], [0.1, 0.0, -0.1], [0.1, 0.0, 0.1], [-0.1, 0.0, 0.1],
        [-0.1, 1.0, -0.1], [0.1, 1.0, -0.1], [0.1, 1.0, 0.1], [-0.1, 1.0, 0.1],
    ], np.float32)
    nrm = np.tile([0.0, 0.0, 1.0], (8, 1)).astype(np.float32)
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]] * 2, np.float32)
    tris = np.asarray([[0, 1, 5], [0, 5, 4], [3, 2, 6], [3, 6, 7]], np.uint16)
    joints = np.asarray([[0, 0, 0, 0]] * 4 + [[1, 0, 0, 0]] * 4, np.uint16)
    weights = np.asarray([[1, 0, 0, 0]] * 8, np.float32)
    # skin: bone0 at origin, bone1 at +1y child of bone0
    ibm = np.stack([np.eye(4, dtype=np.float32),
                    np.eye(4, dtype=np.float32)])
    ibm[1, 1, 3] = -1.0                     # inverse bind of bone1 (y=1)
    ibm_colmajor = ibm.transpose(0, 2, 1).reshape(-1)
    # animation: bone1 rotates 0 → 90° about Z over 1s
    times = np.asarray([0.0, 1.0], np.float32)
    s2 = np.sin(np.pi / 4)
    rots = np.asarray([[0, 0, 0, 1], [0, 0, s2, np.cos(np.pi / 4)]],
                      np.float32)
    # 2x2 texture png
    img = Image.fromarray(np.asarray(
        [[[255, 0, 0, 255], [0, 255, 0, 255]],
         [[0, 0, 255, 255], [255, 255, 0, 255]]], np.uint8))
    png = io.BytesIO()
    img.save(png, format="PNG")
    png = png.getvalue()

    blobs = [pos.tobytes(), nrm.tobytes(), uv.tobytes(), tris.tobytes(),
             joints.tobytes(), weights.tobytes(), ibm_colmajor.tobytes(),
             times.tobytes(), rots.tobytes(), png]
    views, offset, bin_chunk = [], 0, b""
    for b in blobs:
        b += b"\0" * (-len(b) % 4)
        views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(b)})
        bin_chunk += b
        offset += len(b)

    gltf = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"name": "root", "children": [1, 3]},
            {"name": "bone0", "children": [2]},
            {"name": "bone1", "translation": [0, 1, 0]},
            {"name": "meshnode", "mesh": 0, "skin": 0},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2,
                           "JOINTS_0": 4, "WEIGHTS_0": 5},
            "indices": 3, "material": 0}]}],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": 6}],
        "animations": [{
            "name": "bend",
            "samplers": [{"input": 7, "output": 8,
                          "interpolation": "LINEAR"}],
            "channels": [{"sampler": 0,
                          "target": {"node": 2, "path": "rotation"}}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [1, 1, 1, 1],
            "baseColorTexture": {"index": 0},
            "metallicFactor": 0.0, "roughnessFactor": 0.8}}],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 9, "mimeType": "image/png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 8, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 8, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 8, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 12, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5123, "count": 8, "type": "VEC4"},
            {"bufferView": 5, "componentType": 5126, "count": 8, "type": "VEC4"},
            {"bufferView": 6, "componentType": 5126, "count": 2, "type": "MAT4"},
            {"bufferView": 7, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 8, "componentType": 5126, "count": 2, "type": "VEC4"},
        ],
        "bufferViews": views,
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    path.write_bytes(_pack_glb(gltf, bin_chunk))


def test_load_skin_and_animation(tmp_path):
    p = tmp_path / "arm.glb"
    _build_skinned_glb(p)
    doc = load_glb(p)
    assert len(doc.skins) == 1
    sk = doc.skins[0].skeleton
    assert sk.num_joints == 2
    assert list(sk.parents) == [-1, 0]
    np.testing.assert_allclose(sk.rest_t[1], [0, 1, 0], atol=1e-6)
    # explicit inverse bind from the file, not recomputed
    np.testing.assert_allclose(sk.inverse_bind()[1][1, 3], -1.0, atol=1e-6)

    skeleton, mesh, weights, clips = doc.skinned_bundle()
    assert weights.shape == (8, 2)
    np.testing.assert_allclose(weights[:4, 0], 1.0)
    np.testing.assert_allclose(weights[4:, 1], 1.0)
    assert len(clips) == 1
    clip = clips[0]
    assert abs(clip.duration - 1.0) < 1e-6
    # halfway through, bone1 is rotated ~45° about Z
    mid = clip.r[clip.num_frames // 2, 1]
    assert abs(abs(mid[2]) - np.sin(np.pi / 8)) < 0.02, mid


def test_texture_decoded(tmp_path):
    p = tmp_path / "arm.glb"
    _build_skinned_glb(p)
    doc = load_glb(p)
    prim = doc.primitives[0]
    assert prim.base_color_image is not None
    assert prim.base_color_image.shape == (2, 2, 4)
    assert tuple(prim.base_color_image[0, 0]) == (255, 0, 0, 255)


def test_skinned_render_end_to_end(tmp_path):
    """Loaded skin drives SkinnedMeshPlugin: the animated arm renders and
    the animation visibly moves vertices frame to frame."""
    from bevy_tpu import App
    from bevy_tpu.animation import AnimationPlayer
    from bevy_tpu.render import RenderPlugin
    from bevy_tpu.render.camera import Camera3d
    from bevy_tpu.render.mesh3d import DirectionalLight, MeshMaterial
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.render.skinned import SkinnedMesh3d, SkinnedMeshPlugin
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    p = tmp_path / "arm.glb"
    _build_skinned_glb(p)
    doc = load_glb(p)
    skeleton, mesh, weights, clips = doc.skinned_bundle()

    app = App(capacity=16)
    sp = SkinnedMeshPlugin(skeleton, mesh, weights, clips)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=128), sp)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0.5, 3.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(SkinnedMesh3d(), AnimationPlayer(),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                    *transform_bundle(translation=(0.0, -0.5, 0.0)))
    app.update(dt=1 / 30)
    img0 = frame_image(app).astype(int)
    for _ in range(12):
        app.update(dt=1 / 30)
    img1 = frame_image(app).astype(int)
    assert (img0[..., :3].sum(-1) > 0).mean() > 0.002   # something rendered
    moved = (np.abs(img0 - img1).max(-1) > 10).mean()
    assert moved > 0.001, "animation did not move the mesh"


def test_convert_coordinates_yaw(tmp_path):
    """ref: bevy_gltf convert_coordinates.rs — +Z-forward assets get a
    180-degree yaw and mirrored x/z translations."""
    import numpy as np

    from bevy_tpu.gltf import load_glb
    from bevy_tpu.render.mesh3d import Mesh3dPlugin
    from bevy_tpu.transform import Transform
    from bevy_tpu import App

    path = tmp_path / "conv.glb"
    _build_skinned_glb(path)
    doc = load_glb(path)
    plugin = Mesh3dPlugin(backend="xla")
    app = App(capacity=32)
    rows_p = doc.spawn(app.world, plugin)
    rows_c = doc.spawn(app.world, plugin, convert_coordinates=True)
    for rp, rc in zip(rows_p, rows_c):
        tp = np.asarray(app.world.get(rp, Transform).translation)
        tc = np.asarray(app.world.get(rc, Transform).translation)
        assert np.allclose(tc, [-tp[0], tp[1], -tp[2]], atol=1e-6)
