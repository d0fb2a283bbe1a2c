"""Clearcoat lobe (ref model: StandardMaterial.clearcoat +
pbr_lighting.wesl clearcoat terms — added specular lobe with Kelemen
visibility; base layer attenuated by the coat fresnel)."""

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


def _scene(clearcoat, ccr=0.1):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    sphere = plugin.add_mesh(uv_sphere(0.9, 24, 16))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.02))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(PointLight(intensity=20.0, range=30.0),
                    *transform_bundle(translation=(1.5, 1.5, 2.5)))
    app.world.spawn(
        Mesh3d(mesh=sphere),
        MeshMaterial(base_color=(0.6, 0.1, 0.1, 1.0),
                     perceptual_roughness=0.9, metallic=0.0,
                     clearcoat=clearcoat, clearcoat_roughness=ccr),
        *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app).astype(float)


def test_clearcoat_adds_tight_highlight():
    plain = _scene(0.0)
    coated = _scene(1.0)
    d = coated[..., :3].sum(-1) - plain[..., :3].sum(-1)
    # a bright extra highlight appears toward the light
    assert d.max() > 50, d.max()
    # but average energy is roughly conserved (coat attenuates base)
    assert abs(d.mean()) < 25, d.mean()


def test_clearcoat_roughness_spreads_highlight():
    tight = _scene(1.0, ccr=0.05)
    wide = _scene(1.0, ccr=0.7)
    dt = tight[..., :3].sum(-1)
    dw = wide[..., :3].sum(-1)
    # rougher coat: lower peak
    assert dt.max() > dw.max() + 20, (dt.max(), dw.max())


def test_default_material_unchanged():
    """clearcoat defaults to 0 — scenes without it must not shift."""
    a = _scene(0.0)
    b = _scene(0.0)
    assert np.abs(a - b).max() < 1e-3
