"""glTF 2.0 loading (reference twin: bevy_gltf — loader → Mesh/Material
assets with labeled sub-assets `src/loader/`; round-1 subset: .glb binary
container, triangle meshes with POSITION/NORMAL/(TEXCOORD_0), u16/u32
indices, pbrMetallicRoughness base color/metallic/roughness factors, node
TRS transforms flattened to world placements).
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import List

import numpy as np

from bevy_tpu.render.mesh import Mesh

_COMPONENT = {5120: np.int8, 5121: np.uint8, 5122: np.int16,
              5123: np.uint16, 5125: np.uint32, 5126: np.float32}
_NCOMP = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


class GltfPrimitive:
    def __init__(self, mesh: Mesh, base_color, metallic, roughness):
        self.mesh = mesh
        self.base_color = base_color
        self.metallic = metallic
        self.roughness = roughness


class GltfNode:
    def __init__(self, name, translation, rotation, scale, primitives):
        self.name = name
        self.translation = translation
        self.rotation = rotation     # xyzw
        self.scale = scale
        self.primitives: List[GltfPrimitive] = primitives


class GltfDocument:
    def __init__(self, nodes: List[GltfNode], primitives: List[GltfPrimitive]):
        self.nodes = nodes
        self.primitives = primitives

    def spawn(self, world, mesh_plugin, root_translation=(0.0, 0.0, 0.0)):
        """Instantiate all mesh nodes as Mesh3d entities (ref: glTF scene
        spawning with labeled sub-assets)."""
        from bevy_tpu.render.mesh3d import Mesh3d, MeshMaterial
        from bevy_tpu.transform import GlobalTransform, Transform

        rows = []
        root = np.asarray(root_translation, np.float32)
        for node in self.nodes:
            for prim in node.primitives:
                mid = mesh_plugin.add_mesh(prim.mesh)
                t = tuple(np.asarray(node.translation) + root)
                rows.append(world.spawn(
                    Mesh3d(mesh=mid),
                    MeshMaterial(base_color=tuple(prim.base_color),
                                 metallic=prim.metallic,
                                 perceptual_roughness=prim.roughness),
                    Transform(translation=t, rotation=tuple(node.rotation),
                              scale=tuple(node.scale)),
                    GlobalTransform(translation=t,
                                    rotation=tuple(node.rotation),
                                    scale=tuple(node.scale))))
        return rows


def _read_accessor(gltf, buffers, idx) -> np.ndarray:
    acc = gltf["accessors"][idx]
    view = gltf["bufferViews"][acc["bufferView"]]
    buf = buffers[view.get("buffer", 0)]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    dtype = _COMPONENT[acc["componentType"]]
    n = acc["count"] * _NCOMP[acc["type"]]
    stride = view.get("byteStride")
    itemsize = np.dtype(dtype).itemsize * _NCOMP[acc["type"]]
    if stride and stride != itemsize:
        rows = []
        for i in range(acc["count"]):
            start = offset + i * stride
            rows.append(np.frombuffer(buf, dtype, _NCOMP[acc["type"]], start))
        data = np.concatenate(rows)
    else:
        data = np.frombuffer(buf, dtype, n, offset)
    return data.reshape(acc["count"], _NCOMP[acc["type"]]) \
        if _NCOMP[acc["type"]] > 1 else data


def load_glb(path) -> GltfDocument:
    """Parse a .glb binary container (ref: loader/mod.rs)."""
    raw = Path(path).read_bytes()
    magic, version, _length = struct.unpack_from("<III", raw, 0)
    if magic != 0x46546C67:
        raise ValueError("not a glb file")
    if version != 2:
        raise ValueError(f"unsupported glTF version {version}")
    offset = 12
    gltf = None
    bin_chunk = b""
    while offset < len(raw):
        clen, ctype = struct.unpack_from("<II", raw, offset)
        chunk = raw[offset + 8: offset + 8 + clen]
        if ctype == 0x4E4F534A:      # 'JSON'
            gltf = json.loads(chunk)
        elif ctype == 0x004E4942:    # 'BIN'
            bin_chunk = chunk
        offset += 8 + clen
    if gltf is None:
        raise ValueError("glb missing JSON chunk")
    buffers = [bin_chunk]
    return _parse(gltf, buffers)


def _parse(gltf, buffers) -> GltfDocument:
    materials = gltf.get("materials", [])

    def material_of(prim):
        mi = prim.get("material")
        if mi is None:
            return (1.0, 1.0, 1.0, 1.0), 0.0, 0.5
        pbr = materials[mi].get("pbrMetallicRoughness", {})
        return (tuple(pbr.get("baseColorFactor", [1, 1, 1, 1])),
                float(pbr.get("metallicFactor", 1.0)),
                float(pbr.get("roughnessFactor", 1.0)))

    mesh_prims: List[List[GltfPrimitive]] = []
    all_prims: List[GltfPrimitive] = []
    for mesh in gltf.get("meshes", []):
        prims = []
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:   # triangles only
                continue
            attrs = prim["attributes"]
            pos = _read_accessor(gltf, buffers, attrs["POSITION"]).astype(np.float32)
            if "NORMAL" in attrs:
                nrm = _read_accessor(gltf, buffers, attrs["NORMAL"]).astype(np.float32)
            else:
                nrm = np.tile([0.0, 1.0, 0.0], (len(pos), 1)).astype(np.float32)
            uv = (_read_accessor(gltf, buffers, attrs["TEXCOORD_0"]).astype(np.float32)
                  if "TEXCOORD_0" in attrs
                  else np.zeros((len(pos), 2), np.float32))
            if "indices" in prim:
                idx = _read_accessor(gltf, buffers, prim["indices"])
                tris = np.asarray(idx, np.int32).reshape(-1, 3)
            else:
                tris = np.arange(len(pos), dtype=np.int32).reshape(-1, 3)
            color, metallic, rough = material_of(prim)
            p = GltfPrimitive(Mesh(pos, nrm, uv, tris), color, metallic, rough)
            prims.append(p)
            all_prims.append(p)
        mesh_prims.append(prims)

    nodes = []
    for node in gltf.get("nodes", []):
        if "mesh" not in node:
            continue
        nodes.append(GltfNode(
            node.get("name", ""),
            np.asarray(node.get("translation", [0, 0, 0]), np.float32),
            np.asarray(node.get("rotation", [0, 0, 0, 1]), np.float32),
            np.asarray(node.get("scale", [1, 1, 1]), np.float32),
            mesh_prims[node["mesh"]]))
    return GltfDocument(nodes, all_prims)


def register_gltf_loader(server):
    """Hook into the asset server (ref: GltfPlugin registering loaders)."""
    server.register_loader(".glb", load_glb)
