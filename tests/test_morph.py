"""Morph targets (ref model: bevy_mesh morph + bevy_pbr morph.rs — a
weighted position-delta target visibly deforms the mesh)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.animation import AnimationClip, AnimationPlayer, Skeleton
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import DirectionalLight, MeshMaterial
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.skinned import (
    MorphWeights, SkinnedMesh3d, SkinnedMeshPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _render(weight):
    skel = Skeleton([-1], [[0.0, 0.0, 0.0]])

    def rest(_t):
        return {"translation": np.zeros((1, 3), np.float32),
                "rotation": np.asarray([[0, 0, 0, 1]], np.float32),
                "scale": np.ones((1, 3), np.float32)}

    mesh = cuboid(1.0, 1.0, 1.0)
    w = np.ones((mesh.num_vertices, 1), np.float32)
    # morph target: stretch +x vertices far right
    delta = np.zeros((1, mesh.num_vertices, 3), np.float32)
    delta[0, np.asarray(mesh.positions)[:, 0] > 0, 0] = 1.5

    app = App(capacity=16)
    sp = SkinnedMeshPlugin(skel, mesh, w, [AnimationClip(1.0, rest)],
                           morph_targets=delta)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), sp)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 4.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    wts = [0.0] * 8
    wts[0] = weight
    app.world.spawn(SkinnedMesh3d(), AnimationPlayer(),
                    MorphWeights(weights=wts),
                    MeshMaterial(base_color=(0.9, 0.9, 0.9, 1.0)),
                    *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app)


def _extent_x(img):
    bg = img[0, 0].astype(int)
    cov = np.abs(img.astype(int) - bg).max(-1) > 15
    xs = np.where(cov)[1]
    return xs.max()


def test_morph_weight_stretches_mesh():
    base = _extent_x(_render(0.0))
    full = _extent_x(_render(1.0))
    half = _extent_x(_render(0.5))
    assert full > base + 8, (base, full)
    assert base < half < full
