"""Primitive meshers (ref models: bevy_mesh primitives — closed
surfaces, outward normals, front-facing winding)."""

import numpy as np
import pytest

from bevy_tpu.render.mesh import capsule, cone, cuboid, cylinder, torus


@pytest.mark.parametrize("mesh,name", [
    (cylinder(), "cylinder"), (torus(), "torus"), (cone(), "cone"),
    (capsule(), "capsule"),
])
def test_normals_unit_and_outwardish(mesh, name):
    n = mesh.normals
    ln = np.linalg.norm(n, axis=1)
    assert np.allclose(ln, 1.0, atol=1e-4), name
    assert mesh.triangles.max() < mesh.num_vertices


@pytest.mark.parametrize("mesh,name", [
    (cylinder(), "cylinder"), (cone(), "cone"), (capsule(), "capsule"),
    (torus(), "torus"),
])
def test_winding_faces_outward(mesh, name):
    """Face normal (from winding) should agree with vertex normals."""
    p = mesh.positions[mesh.triangles]
    fn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    ln = np.linalg.norm(fn, axis=1)
    ok = ln > 1e-9
    fn = fn[ok] / ln[ok, None]
    vn = mesh.normals[mesh.triangles[:, 0]][ok]
    agree = (np.sum(fn * vn, axis=1) > 0).mean()
    assert agree > 0.95, (name, agree)


def test_capsule_watertight_extent():
    m = capsule(radius=0.5, length=1.0)
    ys = m.positions[:, 1]
    assert abs(ys.max() - 1.0) < 1e-5 and abs(ys.min() + 1.0) < 1e-5
    r = np.linalg.norm(m.positions[:, [0, 2]], axis=1)
    assert r.max() <= 0.5 + 1e-5


def test_meshes_render():
    from bevy_tpu import App
    from bevy_tpu.render import RenderPlugin
    from bevy_tpu.render.camera import Camera3d
    from bevy_tpu.render.mesh3d import (
        DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
    )
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="pallas_interpret")
    ids = [plugin.add_mesh(m) for m in
           (cylinder(), torus(), cone(), capsule())]
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=240, height=120), plugin)
    for i, mid in enumerate(ids):
        app.world.spawn(Mesh3d(mesh=mid),
                        MeshMaterial(base_color=(0.7, 0.6, 0.5, 1.0)),
                        *transform_bundle(translation=(i * 1.8 - 2.7,
                                                       0.0, 0.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0.8, 5)))
    app.update(dt=1 / 60)
    img = frame_image(app)
    bg = img[0, 0].astype(int)
    cov = np.abs(img.astype(int) - bg).max(-1) > 10
    # all four shapes visible across the strip
    for quad in range(4):
        sl = cov[:, quad * 60:(quad + 1) * 60]
        assert sl.mean() > 0.01, f"shape {quad} missing"
