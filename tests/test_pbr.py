"""PBR material response tests (ref model: pbr_lighting.wesl GGX terms —
roughness controls specular spread, metallic kills diffuse)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _sphere_app(metallic, roughness):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    sphere = plugin.add_mesh(uv_sphere(0.9, sectors=24, stacks=12))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=96, height=96), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.02))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0.0, 0.0, 3.0)))
    app.world.spawn(DirectionalLight(illuminance=2.0),
                    *transform_bundle())  # straight on (-z)
    app.world.spawn(
        Mesh3d(mesh=sphere),
        MeshMaterial(base_color=(0.9, 0.9, 0.9, 1.0), metallic=metallic,
                     perceptual_roughness=roughness),
        *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_rough_vs_smooth_highlight():
    smooth = _sphere_app(metallic=0.0, roughness=0.1)
    rough = _sphere_app(metallic=0.0, roughness=0.9)
    # the smooth sphere has a concentrated bright highlight: its max pixel
    # beats the rough sphere's, while the rough one is flatter
    assert smooth[..., 0].max() >= rough[..., 0].max()
    bright_smooth = (smooth[..., 0] > 240).sum()
    bright_rough = (rough[..., 0] > 240).sum()
    assert bright_smooth != bright_rough or smooth[..., 0].max() > rough[..., 0].max()


def test_metallic_darkens_diffuse():
    dielectric = _sphere_app(metallic=0.0, roughness=0.6)
    metal = _sphere_app(metallic=1.0, roughness=0.6)
    # away from the highlight, the metal has no diffuse term → darker
    h, w = metal.shape[:2]
    edge = (slice(h // 2 - 2, h // 2 + 2), slice(w // 2 + 25, w // 2 + 32))
    assert metal[edge][..., 0].mean() < dielectric[edge][..., 0].mean()
