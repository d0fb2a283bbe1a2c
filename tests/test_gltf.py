"""glTF loader tests against a programmatically built .glb (ref model:
bevy_gltf loader — meshes, materials, node transforms)."""

import json
import struct

import numpy as np

from bevy_tpu import App
from bevy_tpu.gltf import load_glb, load_gltf
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _make_glb(path, material=None):
    """A single red triangle at z=0, node translated +x 0.5."""
    pos = np.asarray([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile([0, 0, 1], (3, 1)).astype(np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    bin_data = pos.tobytes() + nrm.tobytes() + idx.tobytes() + b"\x00\x00"
    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "materials": [material or {"pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 0.0, 0.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.8}}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2, "material": 0}]}],
        "nodes": [{"mesh": 0, "name": "tri",
                   "translation": [0.5, 0.0, 0.0]}],
        "scenes": [{"nodes": [0]}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    bin_pad = bin_data + b"\x00" * (-len(bin_data) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_pad)
    blob = struct.pack("<III", 0x46546C67, 2, total)
    blob += struct.pack("<II", len(js), 0x4E4F534A) + js
    blob += struct.pack("<II", len(bin_pad), 0x004E4942) + bin_pad
    path.write_bytes(blob)


def test_parse_glb(tmp_path):
    f = tmp_path / "tri.glb"
    _make_glb(f)
    doc = load_glb(f)
    assert len(doc.primitives) == 1
    prim = doc.primitives[0]
    assert prim.mesh.num_triangles == 1
    assert prim.mesh.num_vertices == 3
    assert prim.base_color == (1.0, 0.0, 0.0, 1.0)
    assert abs(prim.roughness - 0.8) < 1e-6
    node = doc.nodes[0]
    assert node.name == "tri"
    assert np.allclose(node.translation, [0.5, 0, 0])


def _make_gltf_text(dirpath, embed=False):
    """Same triangle as _make_glb, in the .gltf JSON text form — buffer
    external (tri.bin) or embedded as a base64 data: URI."""
    import base64

    pos = np.asarray([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile([0, 0, 1], (3, 1)).astype(np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    bin_data = pos.tobytes() + nrm.tobytes() + idx.tobytes() + b"\x00\x00"
    if embed:
        uri = ("data:application/octet-stream;base64," +
               base64.b64encode(bin_data).decode())
    else:
        (dirpath / "tri.bin").write_bytes(bin_data)
        uri = "tri.bin"
    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(bin_data), "uri": uri}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 0.0, 0.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.8}}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2, "material": 0}]}],
        "nodes": [{"mesh": 0, "name": "tri",
                   "translation": [0.5, 0.0, 0.0]}],
        "scenes": [{"nodes": [0]}],
    }
    f = dirpath / "tri.gltf"
    f.write_text(json.dumps(gltf))
    return f


def test_parse_gltf_text_external_buffer(tmp_path):
    doc = load_gltf(_make_gltf_text(tmp_path, embed=False))
    prim = doc.primitives[0]
    assert prim.mesh.num_triangles == 1
    assert prim.base_color == (1.0, 0.0, 0.0, 1.0)
    assert np.allclose(doc.nodes[0].translation, [0.5, 0, 0])


def test_parse_gltf_text_data_uri(tmp_path):
    doc = load_gltf(_make_gltf_text(tmp_path, embed=True))
    assert doc.primitives[0].mesh.num_vertices == 3


def test_spawn_and_render_glb(tmp_path):
    f = tmp_path / "tri.glb"
    _make_glb(f)
    doc = load_glb(f)

    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="xla")
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=96, height=64), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0.5, 0.0, 3.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0), *transform_bundle())
    rows = doc.spawn(app.world, plugin)
    assert len(rows) == 1
    app.update(dt=1 / 60)
    img = frame_image(app)
    c = img[40, 48]  # lower-center: inside the triangle
    assert c[0] > c[2] + 40, f"glTF triangle not rendered red: {c}"


def test_khr_material_extensions(tmp_path):
    """KHR_materials_* extension mapping onto MeshMaterial fields
    (ref: bevy_gltf/src/material.rs — transmission, volume, clearcoat,
    ior, anisotropy, emissive_strength)."""
    f = tmp_path / "khr.glb"
    _make_glb(f, material={
        "pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.1},
        "emissiveFactor": [0.1, 0.2, 0.3],
        "extensions": {
            "KHR_materials_emissive_strength": {"emissiveStrength": 4.0},
            "KHR_materials_transmission": {"transmissionFactor": 0.9},
            "KHR_materials_volume": {
                "thicknessFactor": 0.5, "attenuationDistance": 2.0,
                "attenuationColor": [0.9, 0.5, 0.4]},
            "KHR_materials_clearcoat": {
                "clearcoatFactor": 1.0, "clearcoatRoughnessFactor": 0.2},
            "KHR_materials_ior": {"ior": 1.33},
            "KHR_materials_anisotropy": {
                "anisotropyStrength": 0.7, "anisotropyRotation": 0.3},
        },
    })
    m = load_glb(f).primitives[0].material
    assert np.allclose(m["emissive"], [0.4, 0.8, 1.2])
    assert m["specular_transmission"] == 0.9
    assert m["thickness"] == 0.5
    assert m["attenuation_distance"] == 2.0
    assert np.allclose(m["attenuation_color"], [0.9, 0.5, 0.4])
    assert m["clearcoat"] == 1.0
    assert abs(m["clearcoat_roughness"] - 0.2) < 1e-6
    assert abs(m["ior"] - 1.33) < 1e-6
    assert abs(m["anisotropy_strength"] - 0.7) < 1e-6
    assert abs(m["anisotropy_rotation"] - 0.3) < 1e-6


def test_khr_unlit(tmp_path):
    f = tmp_path / "unlit.glb"
    _make_glb(f, material={
        "pbrMetallicRoughness": {"baseColorFactor": [0.2, 0.8, 0.4, 1.0]},
        "extensions": {"KHR_materials_unlit": {}},
    })
    prim = load_glb(f).primitives[0]
    assert np.allclose(prim.material["emissive"], [0.2, 0.8, 0.4])
    assert prim.base_color[:3] == (0.0, 0.0, 0.0)
