"""Custom material (reference twin: examples/shader/shader_material.rs —
a user-written fragment shader; here the shading function runs at the
visibility-buffer resolve position, the TPU-native Material trait)."""

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


def fresnel_glow(n, mat, ok, light_vec):
    """Rim-glow shader: emissive fresnel over a lambert base (the
    CustomMaterial of shader_material.rs, in jnp)."""
    lam = jnp.maximum(0.0, -(n[..., 0] * light_vec[0] +
                             n[..., 1] * light_vec[1] +
                             n[..., 2] * light_vec[2]))
    # camera looks -z: rim where the normal turns away from the view
    rim = (1.0 - jnp.abs(n[..., 2])) ** 3
    rgb = mat[..., 0:3] * (0.15 + 0.85 * lam[..., None]) + \
        jnp.stack([0.1, 0.5, 1.0])[None, None] * rim[..., None]
    return jnp.concatenate([rgb, mat[..., 3:4]], -1)


def build_app(width=320, height=180, backend="pallas_interpret"):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend=backend, material_fn=fresnel_glow)
    sphere = plugin.add_mesh(uv_sphere(0.9, 32, 20))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    app.world.spawn(Mesh3d(mesh=sphere),
                    MeshMaterial(base_color=(0.6, 0.2, 0.8, 1.0)),
                    *transform_bundle())
    return app


if __name__ == "__main__":
    import numpy as np

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/shader_material.npy", frame_image(app))
    print("saved /tmp/shader_material.npy")
