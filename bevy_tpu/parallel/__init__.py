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


# ---- collective accounting (shared by the sharded-HLO + multi-host
# tests and the BASELINE.md comm-volume annexes) ----

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8}
_COLLECTIVES = ("all-to-all", "all-gather", "all-reduce",
                "collective-permute", "reduce-scatter")


def collective_inventory(hlo_text: str):
    """Parse compiled HLO → {op: [(result_bytes, replica_groups), ...]}.
    replica_groups is a list of device-id groups (empty when the op
    carries none). The reference has no distributed axis at all
    (SURVEY.md §2.8) — this accounting layer is the TPU build's
    'communication backend' observability."""
    import re

    out = {}
    pat = re.compile(
        r"=\s*(?:\(([^)]*)\)|(\w+)\[([\d,]*)\][^ ]*)\s*(%?)("
        + "|".join(_COLLECTIVES) + r")(-start)?\(")
    grp_pat = re.compile(r"replica_groups=\{(\{[^=]*?\})\}")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if not m or m.group(4):              # %-prefixed = operand ref
            continue
        op = m.group(5)
        if m.group(1) is not None:           # tuple result
            parts = list(re.finditer(r"(\w+)\[([\d,]*)\]", m.group(1)))
            if m.group(6):
                # async '-start' form: the tuple aliases the operand
                # buffer(s) ahead of the output — counting them doubles
                # the reported comm volume. Count the LAST element only
                # (the result shape of the eventual '-done').
                parts = parts[-1:]
            size = 0
            for part in parts:
                n = 1
                for x in part.group(2).split(","):
                    if x:
                        n *= int(x)
                size += n * _DTYPE_BYTES.get(part.group(1), 4)
        else:
            n = 1
            for x in m.group(3).split(","):
                if x:
                    n *= int(x)
            size = n * _DTYPE_BYTES.get(m.group(2), 4)
        gm = grp_pat.search(line)
        groups = []
        if gm:
            for g in re.finditer(r"\{([\d,\s]*)\}", gm.group(1)):
                ids = [int(x) for x in g.group(1).replace(" ", "").split(",")
                       if x]
                if ids:
                    groups.append(ids)
        out.setdefault(op, []).append((size, groups))
    return out


def cross_host_ops(inventory, devices_per_host: int):
    """Count collective op instances whose replica groups span more than
    one host (device ids are host-major), i.e. the ops that ride DCN in
    a multi-host deployment."""
    n = 0
    for insts in inventory.values():
        for _, groups in insts:
            if any(len({d // devices_per_host for d in g}) > 1
                   for g in groups):
                n += 1
    return n
