"""Meshlet LOD: QEM simplification chain + screen-error level selection
(ref model: bevy_pbr/src/meshlet/from_mesh.rs cluster simplification +
the runtime projected-error LOD cut)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.meshlet import build_lod_chain, select_lod, simplify_mesh
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def test_simplify_preserves_shape():
    m = uv_sphere(1.0, 24, 16)
    simp, err = simplify_mesh(m, m.num_triangles // 4)
    assert simp.num_triangles < m.num_triangles // 2
    r = np.linalg.norm(simp.positions, axis=1)
    assert r.min() > 0.85 and r.max() < 1.05
    assert err > 0.0


def test_lod_chain_monotone():
    meshes, errors = build_lod_chain(uv_sphere(1.0, 24, 16), levels=3)
    assert len(meshes) == 3
    assert meshes[0].num_triangles > meshes[1].num_triangles > \
        meshes[2].num_triangles
    assert errors[0] == 0.0 and errors[1] < errors[2]


def test_select_lod_by_distance():
    import jax.numpy as jnp
    dist = jnp.asarray([1.0, 10.0, 200.0])
    lvl = np.asarray(select_lod(dist, [0.0, 0.05, 0.2],
                                fov=1.0, height=480, threshold_px=1.0))
    # near instance stays at LOD0, far drops to the coarsest level
    assert lvl[0] == 0 and lvl[2] == 2, lvl


def _scene(lods, threshold):
    app = App(capacity=64)
    plugin = Mesh3dPlugin(backend="pallas_interpret")
    mesh = plugin.add_mesh(uv_sphere(0.8, 24, 16), lods=lods,
                           lod_threshold_px=threshold)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=120), plugin)
    app.insert_resource(AmbientLight(brightness=0.1))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 4)))
    app.world.spawn(DirectionalLight(illuminance=1.5),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    # near + far instances
    app.world.spawn(Mesh3d(mesh=mesh), MeshMaterial(
        base_color=(0.8, 0.3, 0.2, 1.0)), *transform_bundle((0.0, 0.0, 0.0)))
    app.world.spawn(Mesh3d(mesh=mesh), MeshMaterial(
        base_color=(0.2, 0.4, 0.9, 1.0)),
        *transform_bundle((1.5, 0.5, -30.0)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(float)


def test_lod_image_close_to_full_detail():
    """At a 1px error threshold the LOD render must stay close to the
    full-detail render (the far sphere covers a handful of pixels)."""
    full = _scene(lods=3, threshold=0.0)     # err_px < 0 never: all LOD0
    lod = _scene(lods=3, threshold=1.5)
    diff = np.abs(full - lod)[..., :3]
    # images agree except tiny silhouette wiggles on the far sphere
    assert (diff.max(-1) > 40).mean() < 0.01, (diff.max(-1) > 40).mean()


def test_lod_visibly_changes_when_forced():
    """A huge error threshold forces the coarsest level everywhere —
    the near sphere's silhouette must visibly coarsen (proves the far
    path really swaps geometry)."""
    full = _scene(lods=3, threshold=0.0)
    coarse = _scene(lods=3, threshold=10000.0)
    diff = np.abs(full - coarse)[..., :3].max(-1)
    assert (diff > 40).sum() > 50, (diff > 40).sum()
