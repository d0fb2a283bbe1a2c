"""Meshlet LOD: quadric-error mesh simplification + screen-error LOD
selection (reference twin: `bevy_pbr/src/meshlet/from_mesh.rs` — cluster
group simplification via meshoptimizer's QEM simplifier — and the
per-frame screen-space-error LOD cut selection of `cull_bvh.wesl` /
`lod.rs`).

TPU-first shape: the reference builds a cluster DAG and picks a cut
per-cluster on the GPU. Here the expensive simplification runs ONCE
host-side at pool build (numpy QEM edge collapse, below), producing a
small chain of progressively simplified whole meshes with tracked
geometric error; per-frame, a vectorized per-INSTANCE screen-error test
selects the level (instances are this engine's granularity — the
cluster windows below instance level already stream fixed-size cluster
records, so sub-mesh LOD buys nothing until meshes far exceed window
capacity). Selection math matches the reference: project the level's
geometric error at the instance's distance and take the coarsest level
whose error stays under a pixel threshold (ref: meshlet lod cut
condition, `from_mesh.rs` simplify loop + runtime projected error)."""

from __future__ import annotations

import heapq

import numpy as np


def _vertex_quadrics(pos, tris):
    """Per-vertex 4x4 error quadrics: sum of plane quadrics of incident
    triangles (Garland-Heckbert)."""
    v0 = pos[tris[:, 0]]
    v1 = pos[tris[:, 1]]
    v2 = pos[tris[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    area = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(area, 1e-12)
    d = -np.sum(n * v0, axis=1, keepdims=True)
    plane = np.concatenate([n, d], 1)                     # (T, 4)
    # area-weighted plane quadric K = w * p p^T
    k = plane[:, :, None] * plane[:, None, :] * \
        np.maximum(area, 1e-12)[:, :, None]               # (T, 4, 4)
    q = np.zeros((pos.shape[0], 4, 4), np.float64)
    for c in range(3):
        np.add.at(q, tris[:, c], k)
    return q


def _collapse_cost(q, p):
    """Quadric error of placing the merged vertex at p (homogeneous)."""
    ph = np.array([p[0], p[1], p[2], 1.0])
    return float(ph @ q @ ph)


def simplify_mesh(mesh, target_tris, lock_boundary=True):
    """QEM edge-collapse simplification to ~target_tris triangles.

    Returns (Mesh, max_error) where max_error is the largest per-collapse
    quadric displacement (world units) — the level's geometric error used
    by the runtime screen-error LOD test. Attributes (normal, uv) carry
    from the kept endpoint; midpoint placement; boundary edges optionally
    locked (open meshes keep their silhouette). Ref:
    meshlet/from_mesh.rs simplification loop (meshoptimizer
    simplify + simplify_scale)."""
    from bevy_tpu.render.mesh import Mesh

    pos = np.asarray(mesh.positions, np.float64).copy()
    nrm = np.asarray(mesh.normals, np.float64).copy()
    uv = np.asarray(mesh.uvs, np.float64).copy()
    tris = np.asarray(mesh.triangles, np.int64).copy()
    nv = pos.shape[0]

    # weld coincident vertices for connectivity (faceted meshes ship
    # duplicated corners); collapses act on weld classes, attributes stay
    # per original vertex of the surviving class representative
    key = np.round(pos * 1e6).astype(np.int64)
    _, weld, inv = np.unique(key, axis=0, return_index=True,
                             return_inverse=True)
    cls = inv                                 # vertex -> weld class
    rep = np.full(np.max(inv) + 1, -1, np.int64)
    for i in range(nv):
        if rep[cls[i]] < 0:
            rep[cls[i]] = i

    ctris = cls[tris]                          # class-space triangles
    live_tri = (ctris[:, 0] != ctris[:, 1]) & \
               (ctris[:, 1] != ctris[:, 2]) & (ctris[:, 0] != ctris[:, 2])
    cpos = np.zeros((rep.shape[0], 3), np.float64)
    cpos[cls] = pos
    q = _vertex_quadrics(cpos, ctris[live_tri])

    # boundary detection in class space: edges with exactly one face
    if lock_boundary:
        e = np.concatenate([ctris[live_tri][:, [0, 1]],
                            ctris[live_tri][:, [1, 2]],
                            ctris[live_tri][:, [2, 0]]])
        e = np.sort(e, axis=1)
        eu, cnt = np.unique(e, axis=0, return_counts=True)
        locked = np.zeros(rep.shape[0], bool)
        locked[eu[cnt == 1].ravel()] = True
    else:
        locked = np.zeros(rep.shape[0], bool)

    parent = np.arange(rep.shape[0])

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    # candidate edges (class space) with QEM costs
    def edge_heap():
        t = ctris[live_tri]
        e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
        e = np.unique(np.sort(e, axis=1), axis=0)
        h = []
        for a, b in e:
            if locked[a] or locked[b]:
                continue
            mid = (cpos[a] + cpos[b]) * 0.5
            h.append((_collapse_cost(q[a] + q[b], mid), int(a), int(b)))
        heapq.heapify(h)
        return h

    heap = edge_heap()
    n_live = int(live_tri.sum())
    max_err = 0.0
    stale_rounds = 0
    while n_live > target_tris and heap:
        cost, a, b = heapq.heappop(heap)
        ra, rb = find(a), find(b)
        if ra == rb or locked[ra] or locked[rb]:
            continue
        # lazy-deletion staleness check: cost must match current quadrics
        mid = (cpos[ra] + cpos[rb]) * 0.5
        cur = _collapse_cost(q[ra] + q[rb], mid)
        if cur > cost * 1.5 + 1e-12:
            heapq.heappush(heap, (cur, ra, rb))
            stale_rounds += 1
            if stale_rounds > len(heap) * 2 + 64:
                break
            continue
        stale_rounds = 0
        # collapse b -> a at midpoint
        parent[rb] = ra
        q[ra] = q[ra] + q[rb]
        disp = np.linalg.norm(cpos[ra] - mid)
        max_err = max(max_err, float(disp),
                      float(np.sqrt(max(cur, 0.0))))
        cpos[ra] = mid
        # remap + drop degenerate triangles
        hit = (ctris == rb).any(1) | (ctris == ra).any(1)
        ctris[ctris == rb] = ra
        deg = (ctris[:, 0] == ctris[:, 1]) | (ctris[:, 1] == ctris[:, 2]) \
            | (ctris[:, 0] == ctris[:, 2])
        newly = live_tri & deg
        n_live -= int(newly.sum())
        live_tri = live_tri & ~deg
        # push refreshed edges around the merged vertex
        t = ctris[live_tri & hit]
        around = t[(t == ra).any(1)]
        for tri in around:
            for i in range(3):
                x, y = int(tri[i]), int(tri[(i + 1) % 3])
                if x == ra or y == ra:
                    rx, ry = find(x), find(y)
                    if rx != ry and not (locked[rx] or locked[ry]):
                        m2 = (cpos[rx] + cpos[ry]) * 0.5
                        heapq.heappush(
                            heap,
                            (_collapse_cost(q[rx] + q[ry], m2), rx, ry))

    # rebuild a compact vertex-level mesh: per surviving class, one
    # representative original vertex carries the attributes
    final_cls = np.array([find(c) for c in range(rep.shape[0])])
    out_tris = final_cls[ctris[live_tri]]
    used = np.unique(out_tris)
    remap = np.full(rep.shape[0], -1, np.int64)
    remap[used] = np.arange(used.shape[0])
    new_pos = cpos[used]
    new_nrm = nrm[rep[np.minimum(used, rep.shape[0] - 1)]]
    new_uv = uv[rep[np.minimum(used, rep.shape[0] - 1)]]
    # renormalize carried normals
    nl = np.linalg.norm(new_nrm, axis=1, keepdims=True)
    new_nrm = new_nrm / np.maximum(nl, 1e-12)
    out = Mesh(new_pos.astype(np.float32), new_nrm.astype(np.float32),
               new_uv.astype(np.float32),
               remap[out_tris].astype(np.int32))
    return out, max_err


def build_lod_chain(mesh, levels=3, ratio=0.35):
    """LOD0 = input; each further level targets `ratio` x the previous
    triangle count via QEM collapse. Returns (meshes, errors) with
    errors[0] == 0 and errors monotone nondecreasing (a level's error is
    at least its parent's — ref: the DAG error monotonicity requirement
    of meshlet from_mesh.rs)."""
    meshes = [mesh]
    errors = [0.0]
    cur = mesh
    for _ in range(levels - 1):
        tgt = max(8, int(cur.num_triangles * ratio))
        if cur.num_triangles <= 16:
            break
        simp, err = simplify_mesh(cur, tgt)
        if simp.num_triangles >= cur.num_triangles:
            break
        meshes.append(simp)
        errors.append(max(err, errors[-1] * 1.0001))
        cur = simp
    return meshes, errors


def select_lod(dist, errors_world, fov, height, threshold_px=1.0):
    """Vectorized per-instance LOD pick: the COARSEST level whose
    projected error stays under threshold_px (ref: the meshlet runtime
    cut test — projected group error < 1px). dist (N,) camera distance;
    errors_world: python list of per-level world-space errors. Returns
    (N,) int32 level indices. Projection: err_px =
    err_world / dist * (height / (2 tan(fov/2)))."""
    import jax.numpy as jnp

    scale = height / (2.0 * jnp.tan(fov * 0.5))
    lvl = jnp.zeros(dist.shape, jnp.int32)
    for li in range(1, len(errors_world)):
        err_px = errors_world[li] / jnp.maximum(dist, 1e-6) * scale
        lvl = jnp.where(err_px < threshold_px, li, lvl)
    return lvl
