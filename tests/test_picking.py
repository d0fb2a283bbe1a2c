"""Picking tests (ref model: bevy_picking mesh raycast backend)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from bevy_tpu import App
from bevy_tpu.picking import pick_at_pixel, pick_mesh3d, raycast, screen_ray
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def test_raycast_hits_triangle():
    v0 = jnp.asarray([[-1.0, -1.0, 0.0]])
    v1 = jnp.asarray([[1.0, -1.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    t, hit = raycast(jnp.asarray([0.0, 0.0, 5.0]),
                     jnp.asarray([0.0, 0.0, -1.0]), v0, v1, v2)
    assert bool(hit[0]) and abs(float(t[0]) - 5.0) < 1e-5
    # miss to the side
    t2, hit2 = raycast(jnp.asarray([3.0, 0.0, 5.0]),
                       jnp.asarray([0.0, 0.0, -1.0]), v0, v1, v2)
    assert not bool(hit2[0])


def _scene():
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="xla")
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=64), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0.0, 0.0, 5.0)))
    app.world.spawn(DirectionalLight(), *transform_bundle())
    near = app.world.spawn(Mesh3d(mesh=cube), MeshMaterial(),
                           *transform_bundle(translation=(0.0, 0.0, 0.0)))
    far = app.world.spawn(Mesh3d(mesh=cube), MeshMaterial(),
                          *transform_bundle(translation=(3.0, 0.0, -4.0)))
    app.update(dt=1 / 60)
    return app, plugin, near, far


def test_pick_nearest_instance():
    app, plugin, near, far = _scene()
    row, dist = pick_mesh3d(app.world, plugin,
                            jnp.asarray([0.0, 0.0, 5.0]),
                            jnp.asarray([0.0, 0.0, -1.0]))
    assert row == near.index
    assert abs(dist - 4.5) < 1e-3  # camera z=5 to cube front face z=0.5


def test_pick_at_center_pixel():
    app, plugin, near, far = _scene()
    row, dist = pick_at_pixel(app, plugin, 64, 32)
    assert row == near.index


def test_pick_miss_returns_none():
    app, plugin, near, far = _scene()
    row, dist = pick_mesh3d(app.world, plugin,
                            jnp.asarray([50.0, 0.0, 5.0]),
                            jnp.asarray([0.0, 0.0, -1.0]))
    assert row == -1 and dist == float("inf")
