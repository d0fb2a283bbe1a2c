"""Change detection (reference twin: examples/ecs/change_detection.rs —
react only to entities whose component was written this frame, via the
`Changed`/`Added` query filters backed by change ticks).

Semantics note (matches the reference): a mutable write marks the row
changed whether or not the value differs — `Changed` tracks *mutation*,
not value inequality. Here only `Bumped` entities are in the writer's
query mask, so only they are stamped."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import Added, App, Changed, Query, ResMut, Update, With
from bevy_tpu.ecs.component import component, field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@component
class Score:
    value = field((), jnp.float32)


@component
class Bumped:
    """Marker: this entity's Score is written every frame."""


@resource
class ChangeLog:
    changed_seen = field((), jnp.int32)   # rows matched by Changed(Score)
    added_seen = field((), jnp.int32)     # rows matched by Added(Score)


def build_app():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(ChangeLog())
    app.world.spawn(Score(value=0.0), Bumped())
    app.world.spawn(Score(value=10.0), Bumped())
    app.world.spawn(Score(value=20.0))      # never written after spawn

    @system
    def bump(q=Query(Score, With(Bumped))):
        q.score.value = q.score.value + 1.0

    @system
    def react(q=Query(Score, Changed(Score)),
              qa=Query(Score, Added(Score)), log=ResMut(ChangeLog)):
        log.changed_seen = log.changed_seen + q.count()
        log.added_seen = log.added_seen + qa.count()

    app.add_systems(Update, [bump, react], chain=True)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(5):
        app.update(dt=1 / 60)
    log = app.world.resource(ChangeLog)
    # 2 bumped rows x 5 frames; the third entity only counts as Added on
    # the first frame after spawn
    print("changed rows seen:", int(log.changed_seen),
          "added rows seen:", int(log.added_seen))
