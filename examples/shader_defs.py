"""Trace-time specialization — the shader-defs pattern (reference twin:
examples/shader/shader_defs.rs — #ifdef IS_RED in WGSL; here the knob
is a Python conditional at trace time: the jitted frame contains ONLY
the selected branch, exactly like a shader def)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def make_material(is_red: bool):
    """`is_red` is the shader def: resolved BEFORE tracing, so the
    compiled kernel has no branch at all."""

    def fn(n, mat, ok, light_vec):
        lam = jnp.maximum(0.0, -(n[..., 0] * light_vec[0] +
                                 n[..., 1] * light_vec[1] +
                                 n[..., 2] * light_vec[2]))
        if is_red:                      # trace-time — compiles out
            base = jnp.stack([0.9, 0.1, 0.1])[None, None]
        else:
            base = jnp.stack([0.1, 0.3, 0.9])[None, None]
        rgb = base * (0.2 + 0.8 * lam[..., None])
        return jnp.concatenate([rgb, mat[..., 3:4]], -1)

    return fn


def build_app(width=320, height=180, backend="pallas_interpret",
              is_red=True):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend=backend,
                          material_fn=make_material(is_red))
    cube = plugin.add_mesh(cuboid(1.2, 1.2, 1.2))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1, 4)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    app.world.spawn(Mesh3d(mesh=cube), MeshMaterial(),
                    *transform_bundle(rotation=(0.0, 0.26, 0.0, 0.966)))
    return app


if __name__ == "__main__":
    import numpy as np

    from bevy_tpu.render.plugin import frame_image
    for red in (True, False):
        app = build_app(is_red=red)
        app.update(dt=1 / 60)
        img = frame_image(app)
        mid = img[90, 160]
        print(f"is_red={red}: center pixel {mid.tolist()}")
