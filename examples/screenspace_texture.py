"""Screen-space material (reference twin:
examples/shader/shader_material_screenspace_texture.rs — sample by
frag position; the material function receives full (H, W) planes, so
screen-space patterns are an iota away)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def screenspace_stripes(n, mat, ok, light_vec):
    h, w = ok.shape
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    stripe = 0.5 + 0.5 * jnp.sin((x + y) * 0.35)
    lam = jnp.maximum(0.0, -(n[..., 0] * light_vec[0] +
                             n[..., 1] * light_vec[1] +
                             n[..., 2] * light_vec[2]))
    rgb = jnp.stack([stripe, stripe * 0.4, 1.0 - stripe], -1) * \
        (0.25 + 0.75 * lam[..., None])
    return jnp.concatenate([rgb, mat[..., 3:4]], -1)


def build_app(width=320, height=180, backend="pallas_interpret"):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend=backend,
                          material_fn=screenspace_stripes)
    sphere = plugin.add_mesh(uv_sphere(1.0, 28, 18))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    app.world.spawn(Mesh3d(mesh=sphere), MeshMaterial(),
                    *transform_bundle())
    return app


if __name__ == "__main__":
    import numpy as np

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/screenspace_texture.npy", frame_image(app))
    print("saved /tmp/screenspace_texture.npy")
