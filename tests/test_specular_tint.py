"""StandardMaterial::specular_tint (ref: bevy_pbr/src/pbr_material.rs
~:196 — a color modulating the dielectric F0; metals unaffected).
VERDICT r4 missing #6. Unlike the reference (which skips tint in its
deferred path to keep the G-buffer small), the TPU build carries it
into the deferred shade: the G-buffer grows 3 planes ONLY when some
material tints (trace-time specialization — untinted worlds compile
the 19-plane layout and the tint-free kernel)."""

import numpy as np
import pytest

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
from bevy_tpu.render.mesh import cuboid, uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(tint, metallic=0.0):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    sphere = plugin.add_mesh(uv_sphere(0.9, 24, 16))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=96, height=72), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.02))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(PointLight(intensity=30.0, range=40.0,
                               color=(1.0, 1.0, 1.0)),
                    *transform_bundle(translation=(1.5, 1.5, 2.5)))
    app.world.spawn(
        Mesh3d(mesh=sphere),
        MeshMaterial(base_color=(0.5, 0.5, 0.5, 1.0),
                     metallic=metallic, perceptual_roughness=0.15,
                     specular_tint=tint),
        *transform_bundle())
    app.update(dt=1 / 60)
    import jax
    # raw float framebuffer: the u8 image saturates in the highlight
    c = np.asarray(jax.device_get(
        app.world.state["res"]["render_target"]["color"]))
    return np.moveaxis(c, 0, -1)


def test_gbuffer_stays_19_planes_without_tint():
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    cube = plugin.add_mesh(cuboid(1, 1, 1))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=32, height=32), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret"))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(Mesh3d(mesh=cube), MeshMaterial(),
                    *transform_bundle())
    app.update(dt=1 / 60)
    g = app.world.state["res"]["render_target"]["gbuffer"]
    assert g.shape[0] == 19            # untinted worlds pay nothing


def test_tint_reddens_dielectric_highlight():
    white = _scene((1.0, 1.0, 1.0))
    red = _scene((1.0, 0.05, 0.05))
    # the specular highlight: brightest pixels of the white render
    lum = white[..., :3].sum(-1)
    thresh = np.percentile(lum, 99.5)
    hot = lum >= thresh
    assert hot.sum() > 4
    # red-tinted F0 keeps R but kills G/B in the highlight
    dg = (white[..., 1] - red[..., 1])[hot].mean()
    dr = np.abs(white[..., 0] - red[..., 0])[hot].mean()
    assert dg > 0.02, f"highlight green unchanged ({dg})"
    assert dg > dr * 2.0, (dg, dr)
    # diffuse body (median-lit pixels) barely changes
    mid = (lum > np.percentile(lum, 55)) & (lum < np.percentile(lum, 75))
    d_mid = np.abs(white - red)[..., :3][mid].mean()
    assert d_mid < dg * 0.5, (d_mid, dg)


def test_tint_does_not_touch_metals():
    white = _scene((1.0, 1.0, 1.0), metallic=1.0)
    red = _scene((1.0, 0.05, 0.05), metallic=1.0)
    diff = np.abs(white - red)[..., :3].mean()
    assert diff < 0.01, f"metal changed under tint ({diff})"
