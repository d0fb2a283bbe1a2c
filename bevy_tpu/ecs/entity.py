"""Entity handles (reference twin: bevy_ecs entity/mod.rs:424 — index +
generation). Host-side value type; inside device state entities are int32
row indices into the global pools plus a generation column for liveness
checks (despawn bumps generation, ref `Entities::free`)."""

from typing import NamedTuple

NULL_ENTITY = -1


class Entity(NamedTuple):
    index: int
    generation: int = 0

    @staticmethod
    def null():
        return Entity(NULL_ENTITY, 0)

    def is_null(self):
        return self.index == NULL_ENTITY

    def __repr__(self):
        return f"{self.index}v{self.generation}"
