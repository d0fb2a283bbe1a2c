"""3D mesh pipeline tests (ref model: bevy example-run screenshots, §4.7 —
analytic assertions on a lit cube; plus XLA↔Pallas parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_tpu import App
from bevy_tpu.render import Camera2d, RenderPlugin  # noqa: F401
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import MeshPool, cuboid, plane, uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.math.quat import quat_from_axis_angle


def _cube_app(backend="xla", w=128, h=64, cube_rot=None, cam_z=3.0,
              light_axis_angle=None):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend=backend)
    cube_id = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=w, height=h), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0.0, 0.0, cam_z)))
    rot = cube_rot if cube_rot is not None else (0.0, 0.0, 0.0, 1.0)
    app.world.spawn(
        Mesh3d(mesh=cube_id),
        MeshMaterial(base_color=(1.0, 0.1, 0.1, 1.0)),
        *transform_bundle(rotation=rot))
    # default: light shines straight at the cube (-z); tests that need a
    # tilted light pass light_axis_angle=(axis, angle)
    if light_axis_angle is None:
        light_rot = (0.0, 0.0, 0.0, 1.0)
    else:
        axis, angle = light_axis_angle
        light_rot = tuple(np.asarray(jax.device_get(
            quat_from_axis_angle(jnp.asarray(axis, jnp.float32), angle))))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=light_rot))
    return app


def test_cube_renders_center():
    app = _cube_app()
    app.update(dt=1 / 60)
    img = frame_image(app)
    h, w = img.shape[:2]
    center = img[h // 2, w // 2]
    assert center[0] > 60 and center[0] > center[2] + 20, f"cube not red: {center}"
    # background at corners: the clear color (dimmer, blue-tinted)
    corner = img[2, 2].astype(int)
    assert center.astype(int)[0] > corner[0] + 40
    assert corner[2] >= corner[0]
    # depth written at center, clear (0) at corner — reverse-z
    depth = np.asarray(jax.device_get(
        app.world.state["res"]["render_target"]["depth"]))
    assert depth[h // 2, w // 2] > 0.0
    assert depth[2, 2] == 0.0


def test_z_buffer_occlusion():
    """A green cube behind the red cube must not show through."""
    app = _cube_app()
    cube2 = app._plugins[-1].add_mesh(cuboid(3.0, 3.0, 1.0))
    app.world.spawn(
        Mesh3d(mesh=cube2),
        MeshMaterial(base_color=(0.1, 1.0, 0.1, 1.0)),
        *transform_bundle(translation=(0.0, 0.0, -2.0)))
    app.update(dt=1 / 60)
    img = frame_image(app)
    h, w = img.shape[:2]
    center = img[h // 2, w // 2]
    assert center[0] > center[1] + 20, f"occlusion broken: {center}"
    # green visible around the red cube (bigger, behind)
    ring = img[h // 2, w // 2 + 17]
    assert ring[1] > ring[0] + 20, f"behind cube not visible: {ring}"


def test_lambert_shading_top_brighter():
    """Light from above: the top face must be brighter than the side face."""
    rot = tuple(np.asarray(jax.device_get(quat_from_axis_angle(
        jnp.asarray([1.0, 0.0, 0.0]), 0.6))))  # tilt cube to see the top
    app = _cube_app(cube_rot=rot,
                    light_axis_angle=([1.0, 0.0, 0.0], -np.pi / 2))
    app.update(dt=1 / 60)
    img = frame_image(app).astype(int)
    h, w = img.shape[:2]
    col = img[:, w // 2, 0]
    bg = img[2, 2, 0]
    lit_rows = np.nonzero(col > bg + 40)[0]      # top face (lambert-lit)
    dark_rows = np.nonzero(col < bg - 4)[0]      # front face (ambient only)
    assert len(lit_rows) > 3 and len(dark_rows) > 3, (col.tolist(), bg)
    assert lit_rows.max() < dark_rows.min(), "lit top face must be above"


def test_pallas_parity_interpret():
    imgs = {}
    for backend in ("xla", "pallas_interpret"):
        app = _cube_app(backend=backend)
        app.update(dt=1 / 60)
        imgs[backend] = frame_image(app).astype(int)
    diff = np.abs(imgs["xla"] - imgs["pallas_interpret"])
    # the plane-equation kernel may flip pixels exactly ON triangle edges
    # (fp associativity of the edge test); interiors must match
    frac = (diff > 2).any(axis=-1).mean()
    assert frac < 0.005, f"{frac:.4%} of pixels differ (max {diff.max()})"


def test_mixed_meshes_pallas_groups():
    """Mixed-mesh scenes render as per-mesh uniform batches on the kernel
    path (and may be combined with deferred lighting)."""
    app = _cube_app(backend="pallas_interpret")
    sphere = app._plugins[-1].add_mesh(uv_sphere(0.6, sectors=12, stacks=6))
    app.world.spawn(Mesh3d(mesh=sphere),
                    MeshMaterial(base_color=(0.1, 1.0, 0.1, 1.0)),
                    *transform_bundle(translation=(1.5, 0.0, 0.0)))
    app.update(dt=1 / 60)
    img = frame_image(app)
    h, w = img.shape[:2]
    c = img[h // 2, w // 2]
    s = img[h // 2, w // 2 + 30]
    assert c[0] > c[1] + 20, f"cube missing: {c}"
    assert s[1] > s[0] + 20, f"sphere missing: {s}"


def test_mesh_pool_primitives():
    for mesh in (cuboid(), uv_sphere(sectors=8, stacks=4), plane()):
        assert mesh.num_triangles > 0
        assert mesh.positions.shape[0] == mesh.normals.shape[0]
        n = np.linalg.norm(mesh.normals, axis=1)
        assert np.allclose(n, 1.0, atol=1e-5)
