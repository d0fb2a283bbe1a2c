"""Custom skinned mesh (reference twin:
examples/animation/custom_skinned_mesh.rs — build joints, weights and a
skinned mesh by hand and animate the joint transforms)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.animation import AnimationClip, AnimationPlayer, Skeleton
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import Mesh
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, MeshMaterial,
)
from bevy_tpu.render.skinned import SkinnedMesh3d, SkinnedMeshPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_rig():
    """A 3-joint bending column: base -> mid -> tip, smooth weights
    (the hand-authored JOINT_INDEX/JOINT_WEIGHT attributes)."""
    parents = np.asarray([-1, 0, 1], np.int32)
    rest_t = np.asarray([[0, 0, 0], [0, 0.8, 0], [0, 0.8, 0]], np.float32)
    skeleton = Skeleton(parents, rest_t)
    # a segmented column: 9 rings x 4 corners, smooth-weighted to bones
    pos, nrm, tris, weights = [], [], [], []
    rings = 9
    for k in range(rings):
        y = k / (rings - 1) * 1.6
        for cx, cz in ((-0.15, -0.15), (0.15, -0.15), (0.15, 0.15),
                       (-0.15, 0.15)):
            pos.append([cx, y, cz])
            nrm.append([cx, 0.0, cz])
            w = np.zeros(3, np.float32)
            f = y / 1.6 * 2.0            # 0..2 over the two segments
            lo = int(np.clip(np.floor(f), 0, 1))
            t = f - lo
            w[lo] = 1.0 - t
            w[min(lo + 1, 2)] += t
            weights.append(w)
    for k in range(rings - 1):
        a = k * 4
        for i in range(4):
            j = (i + 1) % 4
            tris += [[a + i, a + 4 + i, a + j],
                     [a + j, a + 4 + i, a + 4 + j]]
    mesh = Mesh(np.asarray(pos, np.float32), np.asarray(nrm, np.float32),
                np.zeros((len(pos), 2), np.float32),
                np.asarray(tris, np.int32))
    return skeleton, mesh, np.asarray(weights, np.float32)


def bend_clip(skeleton):
    def pose(t):
        ang = 0.9 * np.sin(2 * np.pi * t)
        r = np.tile([0, 0, 0, 1.0], (3, 1)).astype(np.float32)
        half = ang / 2
        r[1] = [np.sin(half), 0, 0, np.cos(half)]
        r[2] = [np.sin(half), 0, 0, np.cos(half)]
        return {"translation": skeleton.rest_t.copy(), "rotation": r}

    return AnimationClip(1.0, pose)


def build_app(width=256, height=144, backend="pallas_interpret"):
    app = App(capacity=8)
    skeleton, mesh, weights = build_rig()
    plugin = SkinnedMeshPlugin(skeleton, mesh, weights,
                               [bend_clip(skeleton)], backend=backend)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1, 4)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    app.world.spawn(SkinnedMesh3d(), AnimationPlayer(clip=0),
                    MeshMaterial(base_color=(0.9, 0.55, 0.25, 1.0)),
                    *transform_bundle(translation=(0.0, -0.8, 0.0)))
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    for _ in range(10):
        app.update(dt=1 / 60)
    np.save("/tmp/custom_skinned_mesh.npy", frame_image(app))
    print("saved /tmp/custom_skinned_mesh.npy")
