"""Multi-chip scaling (the layer SURVEY.md §2.8 maps to jax collectives:
the reference is single-process shared-memory; its scaling dimension —
entity count / scene complexity — becomes array sharding over a device
mesh here, with XLA inserting ICI collectives).

Sharding plan:
  * `entity` axis: every component column, alive/generation, tick arrays
    shard their leading (capacity) dimension — the SP-like axis.
  * framebuffer: rows shard over the same devices (raster tiles are
    row-major, so row sharding = tile sharding with no halo: each sprite
    pair lands on the device owning its tile rows after the pair sort's
    all-to-all, which XLA emits from the argsort + gathers).
  * resources / messages / ticks: replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENTITY_AXIS = "entity"


def make_mesh(n_devices: int | None = None, axis: str = ENTITY_AXIS,
              devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"mesh wants {n} devices, platform has {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def world_shardings(state, mesh: Mesh, fb_resources=("render_target",)):
    """A sharding pytree matching a world state pytree: entity-axis arrays
    sharded, framebuffers row-sharded, everything else replicated."""
    axis = mesh.axis_names[0]
    row = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    n = mesh.devices.size

    def shard_leading(tree):
        return jax.tree.map(
            lambda a: row if (hasattr(a, "ndim") and a.ndim >= 1
                              and a.shape[0] % n == 0) else rep, tree)

    sh = {k: jax.tree.map(lambda a: rep, v) for k, v in state.items()}
    sh["ent"] = shard_leading(state["ent"])
    sh["comp"] = shard_leading(state["comp"])
    for name in fb_resources:
        if name in state["res"]:
            sh["res"][name] = jax.tree.map(
                lambda a: row if (hasattr(a, "ndim") and a.ndim >= 2
                                  and a.shape[0] % n == 0) else rep,
                state["res"][name])
    return sh


def shard_world(world, mesh: Mesh):
    """Lay the world's state out over the mesh (device_put with the plan
    above). Subsequent jitted steps keep the layout; XLA inserts the
    cross-shard collectives."""
    sh = world_shardings(world.state, mesh)
    world.state = jax.device_put(world.state, sh)
    return sh
