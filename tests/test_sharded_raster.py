"""Multi-chip cluster raster (ref model: scaling the GPU-driven raster
past one device — §2.8 mapping). Runs on the 8-virtual-device CPU mesh;
must be image-identical to the single-device splat path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bevy_tpu.ops.raster3d_splat import (
    build_windows, compact_cluster_tris, composite_windows, eval_windows,
)
from bevy_tpu.ops.raster3d_visbuf import (
    cluster_screen_aabbs, pack_flat_shade, pack_planes_h, resolve_flat,
)

CS = 12
W, H = 128, 64


def _scene(n_tris=4 * CS * 6, seed=0):
    """Random small front-facing triangles across clip space."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.8, 0.8, (n_tris, 1, 2))
    jitter = rng.uniform(0.02, 0.12, (n_tris, 3, 2))
    sign = np.stack([np.zeros((n_tris, 2)),
                     np.asarray([[0.1, 0.0]] * n_tris),
                     np.asarray([[0.0, 0.1]] * n_tris)], 1)
    xy = centers + sign + jitter * 0.3
    z = rng.uniform(0.2, 0.9, (n_tris, 1, 1)).repeat(3, 1)
    w = np.ones((n_tris, 3, 1))
    cc = np.concatenate([xy, z, w], -1).astype(np.float32)
    # force CCW-in-screen (y-down) winding by swapping when needed
    e1 = cc[:, 1, :2] - cc[:, 0, :2]
    e2 = cc[:, 2, :2] - cc[:, 0, :2]
    flip = (e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]) < 0
    cc[flip] = cc[flip][:, [0, 2, 1]]
    cn = np.tile(np.asarray([0.0, 0.0, 1.0], np.float32),
                 (n_tris, 3, 1))
    mat = np.concatenate([
        rng.uniform(0.2, 1.0, (n_tris, 3)),          # rgb
        np.ones((n_tris, 1)),                        # a
        np.zeros((n_tris, 3)),                       # emissive
        np.zeros((n_tris, 2))], 1).astype(np.float32)
    ok = np.ones(n_tris, bool)
    light = np.zeros(16, np.float32)
    light[6:9] = 1.0                                 # ambient-only shade
    return (jnp.asarray(cc), jnp.asarray(cn), jnp.asarray(ok),
            jnp.asarray(mat), jnp.asarray(light))


def _single_device(cc, cn, ok, mat, light):
    n_cl = cc.shape[0] // CS
    aabb, cl_valid, _ = cluster_screen_aabbs(
        cc, jnp.ones((n_cl,), bool), ok, CS, W, H)
    zrec, _, valid = pack_planes_h(cc, cn, ok, W, H, build_srec=False)
    frec = pack_flat_shade(cn, mat, light, valid)
    zrec_c, _ = compact_cluster_tris(zrec, CS)
    wins = build_windows(aabb, cl_valid, win_h=16, width=W, height=H,
                         budget=2048)
    assert int(wins["overflow"]) == 0
    windows = eval_windows(zrec_c, CS, wins["owner"], wins["meta"],
                           wins["wvalid"], win_h=16)
    depth = jnp.zeros((H, W), jnp.float32)
    winner = jnp.full((H, W), -1.0, jnp.float32)
    depth, winner = composite_windows(depth, winner, windows,
                                      wins["owner"], wins["meta"],
                                      wins["wvalid"], win_h=16, cs=CS,
                                      interpret=True)
    color = resolve_flat(winner.astype(jnp.int32), frec,
                         jnp.zeros((4, H, W), jnp.float32))
    return np.asarray(color), np.asarray(depth)


def test_sharded_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from bevy_tpu.parallel import make_mesh
    from bevy_tpu.parallel.raster import sharded_flat_raster

    cc, cn, ok, mat, light = _scene()
    ref_color, ref_depth = _single_device(cc, cn, ok, mat, light)

    mesh = make_mesh(8)
    color, depth = sharded_flat_raster(
        mesh, cc, cn, ok, mat, light, width=W, height=H,
        cluster_size=CS, win_h=16, visible_budget=8 * 8,
        window_budget=2048, interpret=True)
    color = np.asarray(jax.device_get(color))
    depth = np.asarray(jax.device_get(depth))

    assert depth.shape == (H, W)
    # color must be BIT-identical — every pixel resolves the same
    # global record row, proving the id partitioning + merge. Depth may
    # wiggle by ulps: the sharded program fuses the plane eval
    # differently and the ID-field truncation amplifies 1-ulp deltas.
    assert np.array_equal(color, ref_color)
    assert np.allclose(depth, ref_depth, atol=5e-5)
    # scene actually covered something
    assert (depth > 0).mean() > 0.05
