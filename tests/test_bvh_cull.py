"""Cluster BVH culling (ref model: bevy meshlet cull_bvh.wesl + the
offline BVH build of from_mesh.rs — here a level-synchronous vector
sweep, ops/bvh.py)."""

import numpy as np

import jax.numpy as jnp

from bevy_tpu.ops.bvh import (
    build_cluster_bvh, bvh_cull, cluster_local_aabbs,
)
from bevy_tpu.render.camera import perspective_infinite_reverse


def _grid_clusters(n=6, spacing=4.0):
    """n^3 unit boxes on a grid, one 'cluster' AABB each."""
    centers = np.stack(np.meshgrid(*[np.arange(n)] * 3,
                                   indexing="ij"), -1).reshape(-1, 3)
    centers = (centers - (n - 1) / 2) * spacing
    return np.stack([centers - 0.5, centers + 0.5], 1).astype(np.float32)


def _mvp(cam_z=40.0):
    proj = np.asarray(perspective_infinite_reverse(0.785, 16 / 9, 0.1))
    view = np.eye(4, dtype=np.float32)
    view[2, 3] = -cam_z          # camera at +z looking -z
    return jnp.asarray(proj @ view)


def _exact_outside(aabbs, mvp):
    corners = []
    for i in range(8):
        p = np.where([[i & 1, (i >> 1) & 1, (i >> 2) & 1]],
                     aabbs[:, 1], aabbs[:, 0])
        corners.append(p)
    c = np.stack(corners, 1)                     # (N, 8, 3)
    ch = np.concatenate([c, np.ones(c.shape[:2] + (1,), c.dtype)], -1)
    clip = np.einsum("ij,nkj->nki", np.asarray(mvp), ch)
    x, y, z, w = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    return ((x < -w).all(1) | (x > w).all(1) | (y < -w).all(1) |
            (y > w).all(1) | (z > w).all(1))


def test_bvh_is_conservative_superset_and_prunes():
    aabbs = _grid_clusters()
    levels, order = build_cluster_bvh(aabbs)
    mvp = _mvp(cam_z=10.0)       # camera INSIDE the grid: half behind
    vis = np.asarray(bvh_cull(levels, order, mvp, aabbs.shape[0]))
    exact_vis = ~_exact_outside(aabbs, mvp)
    # conservative: everything exactly-visible must survive the BVH
    assert not (exact_vis & ~vis).any()
    # effective: the behind-the-camera half must be (mostly) pruned
    assert vis.sum() < 0.75 * len(vis), (int(vis.sum()), len(vis))
    assert (~vis).sum() >= (~exact_vis).sum() * 0.5


def test_bvh_all_visible_when_contained():
    aabbs = _grid_clusters(n=4, spacing=2.0)
    levels, order = build_cluster_bvh(aabbs)
    vis = np.asarray(bvh_cull(levels, order, _mvp(cam_z=60.0),
                              aabbs.shape[0]))
    assert vis.all()


def test_bvh_batched_instances():
    aabbs = _grid_clusters(n=3, spacing=3.0)
    levels, order = build_cluster_bvh(aabbs)
    mvps = jnp.stack([_mvp(40.0), _mvp(-40.0)])   # front / fully behind
    vis = np.asarray(bvh_cull(levels, order, mvps, aabbs.shape[0]))
    assert vis.shape == (2, aabbs.shape[0])
    assert vis[0].all()
    assert not vis[1].any()


def test_cluster_local_aabbs_shape():
    pos = np.random.default_rng(0).normal(size=(30, 3)).astype(np.float32)
    tris = np.arange(30, dtype=np.int32).reshape(10, 3)
    boxes = cluster_local_aabbs(pos, tris, cs=4)
    assert boxes.shape == (3, 2, 3)
    assert (boxes[:, 1] >= boxes[:, 0]).all()


def test_bvh_integration_image_identical():
    """Mesh3dPlugin(bvh_cull=True) must render the exact same image:
    the BVH verdicts are a conservative superset, so no visible cluster
    may be lost (a big sphere, camera close so part is offscreen)."""
    from bevy_tpu import App
    from bevy_tpu.render import RenderPlugin
    from bevy_tpu.render.camera import Camera3d
    from bevy_tpu.render.mesh import uv_sphere
    from bevy_tpu.render.mesh3d import (
        AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
    )
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    def render(flag):
        app = App(capacity=16)
        plugin = Mesh3dPlugin(backend="pallas_interpret", bvh_cull=flag)
        mesh = plugin.add_mesh(uv_sphere(2.0, 48, 32))   # ~3k tris
        app.add_plugins(TimePlugin(), TransformPlugin(),
                        RenderPlugin(width=128, height=96), plugin)
        app.insert_resource(AmbientLight(brightness=0.3))
        app.world.spawn(Camera3d(),
                        *transform_bundle(translation=(0.0, 0.0, 2.6)))
        app.world.spawn(DirectionalLight(illuminance=1.0),
                        *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
        app.world.spawn(Mesh3d(mesh=mesh),
                        MeshMaterial(base_color=(0.8, 0.5, 0.3, 1.0)),
                        *transform_bundle())
        app.update(dt=1 / 60)
        return np.asarray(frame_image(app))

    base = render(False)
    culled = render(True)
    assert (base == culled).all(), np.abs(
        base.astype(int) - culled.astype(int)).max()
    # and the sphere is actually rendered (it fills the close-up frame,
    # so check shading variance, not background coverage)
    assert base[..., :3].std() > 8.0, base[..., :3].std()
