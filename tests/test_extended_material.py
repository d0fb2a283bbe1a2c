"""ExtendedMaterial (ref model: bevy_pbr/src/extended_material.rs —
base StandardMaterial shading runs, then the extension modifies it)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
    extended_material,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(material_fn):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend="pallas_interpret",
                          material_fn=material_fn)
    sphere = plugin.add_mesh(uv_sphere(0.9, 24, 16))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    app.world.spawn(Mesh3d(mesh=sphere),
                    MeshMaterial(base_color=(0.3, 0.6, 0.9, 1.0)),
                    *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_identity_extension_matches_standard():
    """ExtendedMaterial with a pass-through extension reproduces the
    StandardMaterial forward shade exactly."""
    base = _scene(None)
    ext = _scene(extended_material(lambda rgba, n, mat, ok, lv: rgba))
    assert np.array_equal(base, ext)


def test_extension_modifies_base_shade():
    """A quantize extension visibly changes the result but keeps
    geometry coverage identical (same raster, different shade)."""
    def quantize(rgba, n, mat, ok, lv):
        rgb = jnp.round(rgba[..., :3] * 3.0) / 3.0
        return jnp.concatenate([rgb, rgba[..., 3:4]], -1)

    base = _scene(None)
    ext = _scene(extended_material(quantize))
    bg = base[0, 0]
    cov_b = np.abs(base - bg).max(-1) > 10
    cov_e = np.abs(ext - ext[0, 0]).max(-1) > 10
    assert cov_b.mean() > 0.1
    assert abs(cov_b.mean() - cov_e.mean()) < 0.02
    assert not np.array_equal(base, ext)
    # quantized: few distinct blue levels inside the sphere
    blues = ext[cov_e][:, 2]
    assert len(np.unique(blues // 8)) <= 6
