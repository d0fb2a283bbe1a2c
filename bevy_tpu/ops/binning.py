"""Tile binning primitives (reference twin: the GPU-driven binning in
`bevy_render/src/batching/gpu_preprocessing.rs` and the phase sort of
`render_phase/mod.rs` — re-expressed as sort/scan ops, the TPU-native way
to build variable-length per-tile work lists under static shapes).

The core trick: variable-length run expansion via exclusive-cumsum +
searchsorted (static capacity, overflow counted not crashed), then one sort
by (tile, draw-order) key, then per-tile segments via searchsorted. All ops
are XLA-friendly (no dynamic shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_runs(counts, capacity: int):
    """Expand N variable-length runs into a flat list of (owner, rank) pairs.

    counts: (N,) int32 — length of each run (0 allowed).
    capacity: static output length P.
    Returns (owner, rank, valid, total):
      owner (P,) int32 — which run each slot belongs to (clipped when invalid)
      rank  (P,) int32 — position inside the run
      valid (P,) bool  — slot < total pairs
      total ()   int32 — sum(counts) (may exceed capacity ⇒ overflow)
    """
    counts = jnp.asarray(counts, jnp.int32)
    n = counts.shape[0]
    ends = jnp.cumsum(counts)
    starts = ends - counts
    pos = jnp.arange(capacity, dtype=jnp.int32)
    # owner via scatter + cummax instead of searchsorted: mark each run's
    # start slot with its index, then forward-fill — one N-element scatter
    # and one capacity-length scan, both bandwidth-bound (searchsorted costs
    # log(N) gather rounds per slot, which dominates at >100k pairs on TPU)
    mark_at = jnp.where(counts > 0, starts, capacity)
    mark = jnp.full(capacity, -1, jnp.int32).at[mark_at].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    owner = jax.lax.cummax(mark)
    owner_c = jnp.clip(owner, 0, n - 1)
    rank = pos - starts[owner_c]
    total = ends[-1] if n > 0 else jnp.asarray(0, jnp.int32)
    valid = pos < jnp.minimum(total, capacity)
    return owner_c, rank, valid, total


def tile_segments(tile_ids, valid, num_tiles: int):
    """Sort pair slots by tile and return per-tile [start, end) segments.

    tile_ids: (P,) int32 per-pair tile index, assumed already composed with a
      draw-order minor key by the caller if in-tile order matters.
    Returns (perm, starts, ends): perm (P,) gather order; starts/ends
      (num_tiles,) segment bounds into the permuted arrays.
    """
    key = jnp.where(valid, tile_ids, jnp.asarray(num_tiles, jnp.int32))
    perm = jnp.argsort(key, stable=True)
    sorted_tiles = key[perm]
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tiles, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tiles, tids, side="right").astype(jnp.int32)
    return perm, starts, ends


def draw_order_ranks(sort_key, active):
    """Stable draw-order rank per instance (ref: PhaseSort,
    `render_phase/mod.rs` sorted phases — back-to-front ⇒ ascending key).
    Inactive instances rank last."""
    key = jnp.where(active, sort_key, jnp.inf)
    order = jnp.argsort(key, stable=True)
    ranks = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=jnp.int32))
    return ranks
