"""Transforms & hierarchy propagation (reference twin: bevy_transform —
Transform/GlobalTransform components `src/components/`; parallel propagation
`src/systems.rs:42-744`; hierarchy `bevy_ecs/src/hierarchy.rs:107,152`).

The reference propagates parent→child transforms with a work-stealing tree
walk. On TPU the same computation is a **level-synchronous composition**:
depth buckets are masked vector ops, one gather+quat-compose pass per level
(ARCHITECTURE/SURVEY §2.8 item 3). Depth is maintained host-side at
(re)parent time; `TransformPlugin(max_depth=D)` sets the static unroll bound.
"""

import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import PostUpdate
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.entity import Entity, NULL_ENTITY
from bevy_tpu.ecs.query import Query, Read
from bevy_tpu.ecs.system import system
from bevy_tpu.math.affine import TRS, trs_compose


@component
class Transform:
    """Local-space TRS (ref: Transform component)."""
    translation = field(3)
    rotation = field(4, default=(0.0, 0.0, 0.0, 1.0))
    scale = field(3, default=(1.0, 1.0, 1.0))


@component
class GlobalTransform:
    """World-space TRS, written by propagation (ref: GlobalTransform)."""
    translation = field(3)
    rotation = field(4, default=(0.0, 0.0, 0.0, 1.0))
    scale = field(3, default=(1.0, 1.0, 1.0))


@component
class ChildOf:
    """Child→parent link (ref: ChildOf, hierarchy.rs:107). `depth` is the
    level bucket for propagation, maintained by `set_parent`."""
    parent = field((), jnp.int32, default=NULL_ENTITY, entity_ref=True)
    depth = field((), jnp.int32, default=0)


def transform_bundle(translation=(0.0, 0.0, 0.0), rotation=(0.0, 0.0, 0.0, 1.0),
                     scale=(1.0, 1.0, 1.0)):
    """Transform + GlobalTransform pair (ref: required components auto-insert
    GlobalTransform when Transform is added, component/mod.rs:103)."""
    return [
        Transform(translation=translation, rotation=rotation, scale=scale),
        GlobalTransform(translation=translation, rotation=rotation, scale=scale),
    ]


def set_parent(world, child, parent):
    """Host-tier reparenting; recomputes the depth bucket (ref:
    ChildOf insertion + Children bookkeeping)."""
    child_row = child.index if isinstance(child, Entity) else int(child)
    parent_row = parent.index if isinstance(parent, Entity) else int(parent)
    depth = 1
    if world.has(parent_row, ChildOf):
        depth = int(world.get(parent_row, ChildOf).depth) + 1
    world.insert(child_row, ChildOf(parent=parent_row, depth=depth))


def children_of(world, parent) -> list:
    """Derived inverse relationship (ref: Children, hierarchy.rs:152)."""
    parent_row = parent.index if isinstance(parent, Entity) else int(parent)
    rows = world.query_rows(ChildOf)
    if len(rows) == 0:
        return []
    parents = np.asarray(world.column(ChildOf, "parent"))[rows]
    return [int(r) for r, p in zip(rows, parents) if p == parent_row]


def despawn_recursive(world, entity):
    """Despawn an entity and all descendants (ref: despawn with Children
    cleanup)."""
    for c in children_of(world, entity):
        despawn_recursive(world, c)
    world.despawn(entity)


def make_propagate_system(max_depth: int = 8, world=None):
    """`world` (the owning App's) enables a TRACE-TIME fast path: flat
    worlds (no ChildOf rows yet) skip the per-level gather composition
    entirely — the dominant sim cost at 100k+ entities. The 0→nonzero
    ChildOf transition bumps structure_version, retracing into the full
    path (ref: the dirty-tree early-outs of `mark_dirty_trees`,
    bevy_transform/src/systems.rs:103)."""

    @system(name="propagate_transforms")
    def propagate_transforms(q=Query(Read(Transform), GlobalTransform),
                             rel=Query(Read(ChildOf))):
        lt, lr, ls = q.transform.translation, q.transform.rotation, q.transform.scale
        flat = world is not None and world.component_rows(ChildOf) == 0
        if flat:
            m = q.mask[:, None]
            q.global_transform.translation = jnp.where(m, lt, q.global_transform.translation)
            q.global_transform.rotation = jnp.where(m, lr, q.global_transform.rotation)
            q.global_transform.scale = jnp.where(m, ls, q.global_transform.scale)
            return
        child_mask = rel.mask
        parent = rel.child_of.parent
        depth = rel.child_of.depth
        safe_parent = jnp.clip(parent, 0, parent.shape[0] - 1)

        # roots copy local → global (ref: sync_simple_transforms)
        root = q.mask & ~child_mask
        gt = jnp.where(root[:, None], lt, q.global_transform.translation)
        gr = jnp.where(root[:, None], lr, q.global_transform.rotation)
        gs = jnp.where(root[:, None], ls, q.global_transform.scale)
        # level-synchronous composition (ref: propagate_parent_transforms)
        for d in range(1, max_depth + 1):
            m = (q.mask & child_mask & (depth == d))[:, None]
            parent_trs = TRS(translation=gt[safe_parent],
                             rotation=gr[safe_parent],
                             scale=gs[safe_parent])
            local_trs = TRS(translation=lt, rotation=lr, scale=ls)
            comp = trs_compose(parent_trs, local_trs)
            gt = jnp.where(m, comp["translation"], gt)
            gr = jnp.where(m, comp["rotation"], gr)
            gs = jnp.where(m, comp["scale"], gs)
        q.global_transform.translation = gt
        q.global_transform.rotation = gr
        q.global_transform.scale = gs

    return propagate_transforms


class TransformPlugin(Plugin):
    """ref: TransformPlugin — registers propagation in PostUpdate."""

    def __init__(self, max_depth: int = 8):
        self.max_depth = max_depth

    def build(self, app):
        app.world.register_component(Transform)
        app.world.register_component(GlobalTransform)
        app.world.register_component(ChildOf)
        app.add_systems(PostUpdate,
                        make_propagate_system(self.max_depth, app.world))
