"""Anisotropic specular (ref model: StandardMaterial.anisotropy_strength /
anisotropy_rotation + bevy_pbr's Filament-derived anisotropic GGX in
pbr_lighting.wesl / anisotropy.wesl — D_GGX_Anisotropic + height-
correlated Smith with per-direction roughnesses at/ab)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(aniso, rot=0.0, rough=0.35):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    sphere = plugin.add_mesh(uv_sphere(0.9, 24, 16))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.02))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(PointLight(intensity=20.0, range=30.0),
                    *transform_bundle(translation=(0.5, 0.5, 2.5)))
    app.world.spawn(
        Mesh3d(mesh=sphere),
        MeshMaterial(base_color=(0.2, 0.2, 0.25, 1.0),
                     perceptual_roughness=rough, metallic=1.0,
                     anisotropy_strength=aniso, anisotropy_rotation=rot),
        *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app).astype(float)


def test_zero_strength_matches_isotropic():
    """aniso == 0 must reproduce the isotropic lobe (the aniso branch
    degenerates exactly when at == ab == alpha)."""
    iso = _scene(0.0)
    # force the aniso kernel by giving a second, invisible entity nonzero
    # strength: same visible sphere, kernel specializes to anisotropy=True
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    sphere = plugin.add_mesh(uv_sphere(0.9, 24, 16))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.02))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(PointLight(intensity=20.0, range=30.0),
                    *transform_bundle(translation=(0.5, 0.5, 2.5)))
    app.world.spawn(
        Mesh3d(mesh=sphere),
        MeshMaterial(base_color=(0.2, 0.2, 0.25, 1.0),
                     perceptual_roughness=0.35, metallic=1.0,
                     anisotropy_strength=0.0),
        *transform_bundle())
    app.world.spawn(   # behind the camera; forces the aniso kernel path
        Mesh3d(mesh=sphere),
        MeshMaterial(anisotropy_strength=0.8),
        *transform_bundle(translation=(0.0, 0.0, 30.0)))
    app.update(dt=1 / 60)
    forced = frame_image(app).astype(float)
    # the aniso D/vis expressions are analytically identical at s=0 but
    # reassociated (divisions by at/ab vs the a2 form) — allow fp slop
    assert np.abs(forced - iso).max() <= 4.0, np.abs(forced - iso).max()


def test_anisotropy_stretches_highlight():
    iso = _scene(0.0)
    an = _scene(0.9)
    # the lobe changes visibly (at/ab split reshapes the highlight)
    assert np.abs(an - iso).max() > 20


def test_anisotropy_rotation_changes_lobe():
    """anisotropy_rotation spins the tangent frame about the normal —
    the stretched highlight must move (ref: anisotropy_rotation field,
    pbr_material.rs)."""
    a0 = _scene(0.9, rot=0.0)
    a90 = _scene(0.9, rot=np.pi / 2)
    assert np.abs(a90 - a0).max() > 20


def test_rotation_changes_direction():
    a0 = _scene(0.9, rot=0.0)
    a90 = _scene(0.9, rot=float(np.pi / 2))
    assert np.abs(a0 - a90).max() > 15
