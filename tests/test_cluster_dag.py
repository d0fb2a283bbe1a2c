"""Cluster-DAG LOD (ref: bevy_pbr/src/meshlet/from_mesh.rs — group
simplification DAG + runtime mixed-level cut). Invariants + an
image-comparison of the cut render against full-res."""

import numpy as np
import pytest

from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.meshlet import build_cluster_dag, select_dag_cut


@pytest.fixture(scope="module")
def dag():
    mesh = uv_sphere(radius=1.0, sectors=48, stacks=24)
    return mesh, *build_cluster_dag(mesh, cs=12)


def test_dag_structure(dag):
    mesh, dag_mesh, info = dag
    ncl = dag_mesh.num_triangles // 12
    assert dag_mesh.num_triangles % 12 == 0
    assert info["own_err"].shape == (ncl,)
    # multiple DAG levels exist: some clusters carry nonzero own error
    assert (info["own_err"] > 0).any()
    # monotonicity: every grouped cluster's parent error exceeds its own
    grouped = info["parent_err"] < 1e37
    assert grouped.any()
    assert (info["parent_err"][grouped] > info["own_err"][grouped]).all()
    # the DAG holds more clusters than LOD0 alone but bounded ~2x
    lod0 = (info["own_err"] == 0).sum()
    assert ncl > lod0
    assert ncl <= 3.0 * lod0


def test_cut_partition_extremes(dag):
    """Near camera the cut is exactly the LOD0 set; infinitely far it
    collapses toward the DAG roots."""
    import jax.numpy as jnp

    mesh, dag_mesh, info = dag
    near = select_dag_cut(jnp.asarray([0.0, 0.0, 3.0]), info,
                          fov=np.pi / 4, height=720, threshold_px=0.0001)
    assert bool((np.asarray(near) == (info["own_err"] == 0)).all())
    far = select_dag_cut(jnp.asarray([0.0, 0.0, 3000.0]), info,
                         fov=np.pi / 4, height=720, threshold_px=1.0)
    n_far = int(np.asarray(far).sum())
    assert 0 < n_far < (info["own_err"] == 0).sum() * 0.5


def test_cut_covers_every_path_once(dag):
    """For a sweep of distances, each group's children all agree, and
    every cluster is covered by exactly one cut ancestor-or-self (no
    holes, no double-draw). Tested via the group identity: a cluster's
    (parent_err, parent_center) equals its parents' (own_err,
    own_center), so the draw predicate flips consistently."""
    import jax.numpy as jnp

    mesh, dag_mesh, info = dag
    for d in (5.0, 20.0, 80.0, 300.0, 1200.0):
        cut = np.asarray(select_dag_cut(
            jnp.asarray([0.0, 0.0, d]), info, fov=np.pi / 4, height=720,
            threshold_px=1.0))
        own_px = info["own_err"] / np.maximum(
            np.linalg.norm(info["own_center"] - [0, 0, d], axis=-1)
            - info["own_radius"], 1e-5) * (720 / (2 * np.tan(np.pi / 8)))
        par_px = info["parent_err"] / np.maximum(
            np.linalg.norm(info["parent_center"] - [0, 0, d], axis=-1)
            - info["parent_radius"], 1e-5) * (720 / (2 * np.tan(np.pi / 8)))
        assert ((own_px[cut] <= 1.0) & (par_px[cut] > 1.0)).all()
        # LOD0 leaves: drawn iff their parent test fails — so every leaf
        # region is represented by exactly one level (the leaf draws, or
        # some ancestor whose own error cleared the threshold does)
        leaves = info["own_err"] == 0
        buried = leaves & ~cut
        assert (par_px[buried] <= 1.0).all()


def test_dag_cut_image_matches_full_res():
    """A hero sphere rendered through the mesh pass with a DAG cut must
    match the full-resolution render within tolerance (the VERDICT r3
    'done' bar for cluster-DAG LOD)."""
    import jax.numpy as jnp

    from bevy_tpu import App
    from bevy_tpu.render import RenderPlugin
    from bevy_tpu.render.camera import Camera3d
    from bevy_tpu.render.mesh3d import Mesh3d, MeshMaterial, Mesh3dPlugin
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle
    from bevy_tpu.render.mesh3d import AmbientLight, DirectionalLight

    def build(use_dag, dist):
        mesh = uv_sphere(radius=1.0, sectors=48, stacks=24)
        app = App(capacity=8)
        plugin = Mesh3dPlugin(backend="pallas_interpret")
        if use_dag:
            mid = plugin.add_mesh_dag(mesh, threshold_px=2.0)
        else:
            mid = plugin.add_mesh(mesh)
        app.add_plugins(TimePlugin(), TransformPlugin(),
                        RenderPlugin(width=192, height=108), plugin)
        app.world.spawn(Camera3d(), *transform_bundle(
            translation=(0.0, 0.0, dist)))
        app.world.spawn(DirectionalLight(illuminance=1.0),
                        *transform_bundle())
        app.world.spawn(AmbientLight(brightness=0.35), *transform_bundle())
        app.world.spawn(Mesh3d(mesh=mid), MeshMaterial(
            base_color=(0.8, 0.3, 0.2, 1.0)), *transform_bundle())
        app.update(dt=1 / 60)
        return np.asarray(frame_image(app)).astype(np.int32)

    full = build(False, 6.0)
    cut = build(True, 6.0)
    # the sphere must actually render
    bg = full[0, 0]
    cov = (np.abs(full - bg).max(-1) > 10).mean()
    assert cov > 0.02
    covc = (np.abs(cut - bg).max(-1) > 10).mean()
    assert covc > 0.02
    # tolerance: simplified silhouettes differ on a small pixel fraction
    diff = (np.abs(full - cut).max(-1) > 24).mean()
    assert diff < 0.02, f"DAG cut diverges from full-res: {diff:.3%}"
