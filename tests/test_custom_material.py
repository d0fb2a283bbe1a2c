"""Custom materials (ref model: the Material trait + shader examples —
user shading code injected at the resolve position)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def toon_material(n, mat, ok, light_vec):
    """Two-band toon shading — the custom-shader archetype."""
    lam = jnp.maximum(0.0, -(n[..., 0] * light_vec[0] +
                             n[..., 1] * light_vec[1] +
                             n[..., 2] * light_vec[2]))
    band = jnp.where(lam > 0.5, 1.0, jnp.where(lam > 0.1, 0.55, 0.18))
    rgb = mat[..., 0:3] * band[..., None]
    return jnp.concatenate([rgb, mat[..., 3:4]], -1)


def _scene(fn):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend="pallas_interpret", material_fn=fn)
    sphere = plugin.add_mesh(uv_sphere(0.9, 24, 16))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    app.world.spawn(Mesh3d(mesh=sphere),
                    MeshMaterial(base_color=(0.9, 0.4, 0.2, 1.0)),
                    *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_custom_toon_material_quantizes_shading():
    img = _scene(toon_material)
    # sphere visible
    bg = img[0, 0]
    cov = np.abs(img - bg).max(-1) > 10
    assert cov.mean() > 0.1
    # banding: few distinct red-channel levels inside the sphere
    reds = img[cov][:, 0]
    levels = np.unique(reds // 8)
    assert len(levels) <= 6, len(levels)
