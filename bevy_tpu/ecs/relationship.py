"""Generic relationships (reference twin: bevy_ecs relationship/ —
the Relationship/RelationshipTarget pair, `relationship/mod.rs`: ChildOf
generalized to arbitrary entity-to-entity links with maintained reverse
lookups and despawn policies).

TPU design: a relationship is a component with one `target` entity-ref
row (+ the target's generation, so stale rows never match a recycled
entity). The reference materializes the reverse side (`Children`-style
Vecs); in SoA storage the reverse lookup IS a vectorized compare over the
relation column — nothing to maintain. Cleanup when targets despawn is an
ordinary device system over masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from bevy_tpu.ecs.commands import Commands
from bevy_tpu.ecs.component import component as _component, field
from bevy_tpu.ecs.query import Query, Read
from bevy_tpu.ecs.system import system


def relationship(name: str):
    """Declare a relationship component (ref: #[derive(Relationship)]).
    Returns a component class with `target` (entity row) and `target_gen`
    fields; construct per entity via `rel_to(Rel, entity)`."""
    cls = type(name, (), {
        "target": field((), jnp.int32, default=-1, entity_ref=True),
        "target_gen": field((), jnp.int32, default=-1),
    })
    return _component(cls)


def rel_to(rel_cls, entity):
    """A relationship instance pointing at `entity` (ref: ChildOf(entity)).
    Accepts an Entity (stamps its generation — stale targets never match a
    recycled row) or a raw row index (generation unchecked)."""
    if hasattr(entity, "index"):
        return rel_cls(target=int(entity.index),
                       target_gen=int(entity.generation))
    return rel_cls(target=int(entity), target_gen=-1)


def related_mask(state, rel_cls, entity):
    """Device-side reverse lookup (ref: RelationshipTarget iteration):
    bool (capacity,) mask of live rows whose relation points at `entity`.
    Usable inside systems (traced) or on the host."""
    spec = rel_cls.__component_spec__
    store = state["comp"][spec.name]
    row = entity.index if hasattr(entity, "index") else entity
    m = state["ent"]["alive"] & store["has"] & (store["f"]["target"] == row)
    if hasattr(entity, "generation"):
        gen_ok = (store["f"]["target_gen"] < 0) | \
            (store["f"]["target_gen"] == state["ent"]["generation"][row])
        m = m & gen_ok
    return m


def make_relationship_cleanup_system(rel_cls, policy: str = "remove"):
    """System removing dangling relations (ref: the on_despawn relationship
    hooks — ChildOf's despawn_related policy). `policy`: "remove" drops the
    relation component from orphans; "despawn" despawns them (recursive
    across frames — each frame clears one generation of orphans, the
    reference's recursive despawn unrolled over time)."""
    spec = rel_cls.__component_spec__

    @system(name=f"cleanup_{spec.name}_{policy}")
    def cleanup(q=Query(Read(rel_cls)), cmd=Commands()):
        rel = getattr(q, spec.name)
        tgt = jnp.clip(rel.target, 0, q.mask.shape[0] - 1)
        alive = q._state["ent"]["alive"][tgt]
        gen_ok = (rel.target_gen < 0) | \
            (rel.target_gen == q._state["ent"]["generation"][tgt])
        dangling = q.mask & ((rel.target < 0) | ~alive | ~gen_ok)
        if policy == "despawn":
            cmd.despawn(dangling)
        else:
            cmd.remove(dangling, rel_cls)

    return cleanup
