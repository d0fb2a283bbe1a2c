"""Cluster BVH culling (reference twin: bevy meshlet's BVH-driven cull,
`bevy_pbr/src/meshlet/cull_bvh.wesl` + the BVH build of
`from_mesh.rs` — re-thought for TPU: instead of a work-queue traversal
(divergent, data-dependent — hostile to XLA), the tree is culled
LEVEL-SYNCHRONOUSLY: every level is one vectorized conservative
frustum test over that level's node AABBs, masked by its parent level.
Work is dense per level, but the per-node test is 8 corners instead of
the 3*cs corners a per-cluster test costs, and interior-node results
gate whole subtrees of the leaf mask.

Build is host-side at mesh-registration time (static per mesh, like
the reference's offline BVH): clusters are Morton-ordered by AABB
center so consecutive leaves are spatially coherent, then packed
bottom-up with fanout-F contiguous children (node i's children are
[i*F, i*F+F) in the next level — no child index tables)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _morton3(x, y, z, bits=10):
    """Interleave 3x bits-bit integers into a Morton code."""
    out = np.zeros_like(x, dtype=np.uint64)
    for i in range(bits):
        out |= ((x >> i) & 1).astype(np.uint64) << np.uint64(3 * i)
        out |= ((y >> i) & 1).astype(np.uint64) << np.uint64(3 * i + 1)
        out |= ((z >> i) & 1).astype(np.uint64) << np.uint64(3 * i + 2)
    return out


def cluster_local_aabbs(positions, triangles, cs: int):
    """(NCL, 2, 3) local-space min/max per cluster of `cs` consecutive
    triangles (the padding tail repeats the last vertex — degenerate,
    harmless)."""
    tris = np.asarray(triangles, np.int64)
    tc = tris.shape[0]
    ncl = (tc + cs - 1) // cs
    pad = ncl * cs - tc
    if pad:
        tris = np.concatenate([tris, np.repeat(tris[-1:], pad, 0)], 0)
    pts = np.asarray(positions, np.float32)[tris]      # (NCL*cs, 3, 3)
    pts = pts.reshape(ncl, cs * 3, 3)
    return np.stack([pts.min(1), pts.max(1)], 1)


def build_cluster_bvh(local_aabbs, fanout: int = 8):
    """Build the level array pyramid over cluster AABBs.

    Returns (levels, order): `levels` is a list, root first, of
    (n_level, 2, 3) float32 min/max arrays; `order` (NCL,) int32 is the
    Morton permutation mapping leaf position -> original cluster id
    (leaves are level[-1][:NCL]; positions past NCL are inverted-empty
    boxes that fail every test)."""
    aabbs = np.asarray(local_aabbs, np.float32)
    ncl = aabbs.shape[0]
    center = (aabbs[:, 0] + aabbs[:, 1]) * 0.5
    lo = center.min(0)
    span = np.maximum(center.max(0) - lo, 1e-9)
    q = np.clip(((center - lo) / span * 1023).astype(np.int64), 0, 1023)
    order = np.argsort(_morton3(q[:, 0], q[:, 1], q[:, 2]),
                       kind="stable").astype(np.int32)
    leaves = aabbs[order]
    levels = [leaves]
    while levels[0].shape[0] > 1:
        cur = levels[0]
        n = cur.shape[0]
        pad = (-n) % fanout
        if pad:
            # inverted boxes (max < min) mark padding; bvh_cull tests
            # validity explicitly (infinities would NaN the corner math)
            empty = np.stack([np.full((pad, 3), 1.0, np.float32),
                              np.full((pad, 3), -1.0, np.float32)], 1)
            cur = np.concatenate([cur, empty], 0)
        grp = cur.reshape(-1, fanout, 2, 3)
        parents = np.stack([grp[:, :, 0].min(1), grp[:, :, 1].max(1)], 1)
        levels.insert(0, parents)
    return [jnp.asarray(lv) for lv in levels], jnp.asarray(order)


def _corners(aabb):
    """(N, 2, 3) min/max -> (N, 8, 3) box corners."""
    lo, hi = aabb[:, 0], aabb[:, 1]
    picks = jnp.asarray([[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1]
                         for i in range(8)], jnp.float32)   # (8, 3)
    return lo[:, None, :] + picks[None] * (hi - lo)[:, None, :]


def _outside(aabb, mvp):
    """Conservative clip-space test: True when ALL 8 corners are outside
    one frustum plane (the same any-w-sign-safe test the per-cluster
    cull uses — valid through the projective transform). mvp may carry
    a leading instance batch: (4,4) or (B,4,4)."""
    c = _corners(aabb)                                # (N, 8, 3)
    ch = jnp.concatenate([c, jnp.ones(c.shape[:2] + (1,), c.dtype)], -1)
    if mvp.ndim == 2:
        clip = jnp.einsum("ij,nkj->nki", mvp, ch)     # (N, 8, 4)
    else:
        clip = jnp.einsum("bij,nkj->bnki", mvp, ch)   # (B, N, 8, 4)
    x, y, z, w = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    return (jnp.all(x < -w, -1) | jnp.all(x > w, -1) |
            jnp.all(y < -w, -1) | jnp.all(y > w, -1) |
            jnp.all(z > w, -1))


def bvh_cull(levels, order, mvp, ncl: int, fanout: int = 8):
    """Level-synchronous BVH frustum cull. Returns cluster visibility in
    ORIGINAL cluster order (True = possibly visible — a conservative
    superset of the exact per-cluster test): (NCL,) for mvp (4,4),
    (B, NCL) for batched instance mvps (B,4,4)."""
    batched = mvp.ndim == 3
    mask = None
    for lv in levels:
        valid_box = jnp.all(lv[:, 1] >= lv[:, 0], -1)
        vis = ~_outside(lv, mvp) & valid_box
        if mask is not None:
            par = jnp.repeat(mask, fanout, axis=-1)
            vis = vis & par[..., :vis.shape[-1]]
        mask = vis
    leaf_vis = mask[..., :ncl]
    # scatter leaf verdicts back to original cluster ids
    if batched:
        out = jnp.zeros((mvp.shape[0], ncl), bool)
        return out.at[:, order].set(leaf_vis)
    return jnp.zeros((ncl,), bool).at[order].set(leaf_vis)
