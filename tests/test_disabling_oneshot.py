"""Entity disabling + one-shot systems (ref models: bevy_ecs
entity_disabling.rs DefaultQueryFilters; system_registry.rs
World::run_system)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs import With
from bevy_tpu.ecs.query import Query, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.ecs.world import Disabled


@component
class Health:
    hp = field((), jnp.float32, default=10.0)


def _app():
    app = App(capacity=8)
    app.world.register_component(Disabled)
    app.insert_resource("acc", {"n": jnp.zeros((), jnp.int32)})

    @system(name="count_alive")
    def count_alive(q=Query(Health), r=ResMut("acc")):
        r.n = jnp.sum(q.mask.astype(jnp.int32))

    app.add_systems(Update, count_alive)
    return app


def test_disabled_skipped_by_default():
    app = _app()
    app.world.spawn(Health())
    e = app.world.spawn(Health())
    app.update(dt=1 / 60)
    assert int(app.world.resource("acc").n) == 2
    app.world.insert(e, Disabled())
    app.update(dt=1 / 60)
    assert int(app.world.resource("acc").n) == 1
    app.world.remove(e, Disabled)
    app.update(dt=1 / 60)
    assert int(app.world.resource("acc").n) == 2


def test_query_mentioning_disabled_sees_them():
    app = _app()
    e = app.world.spawn(Health())
    app.world.insert(e, Disabled())
    app.insert_resource("dis", {"n": jnp.zeros((), jnp.int32)})

    @system(name="count_disabled")
    def count_disabled(q=Query(Health, With(Disabled)), r=ResMut("dis")):
        r.n = jnp.sum(q.mask.astype(jnp.int32))

    app.add_systems(Update, count_disabled)
    app.update(dt=1 / 60)
    assert int(app.world.resource("dis").n) == 1


def test_one_shot_system_runs_on_demand():
    app = _app()
    app.world.spawn(Health(hp=5.0))
    app.world.spawn(Health(hp=7.0))
    app.update(dt=1 / 60)

    @system(name="heal_all")
    def heal_all(q=Query(Health)):
        q.health.hp = jnp.where(q.mask, q.health.hp + 1.0, q.health.hp)

    sid = app.register_system(heal_all)
    before = float(app.world.get(0, Health).hp)
    app.run_system(sid)
    app.run_system(heal_all)            # also accepts the system itself
    after = float(app.world.get(0, Health).hp)
    assert after == before + 2.0


def test_dynamic_component_definition():
    """ref: examples/ecs/dynamic.rs — runtime-defined component layout."""
    from bevy_tpu.ecs.component import define_component, field as f

    Tag = define_component("rt_tag", {"value": f((), jnp.int32)})
    app = App(capacity=4)
    e = app.world.spawn(Tag(value=42))
    app.update(dt=1 / 60)
    assert int(app.world.get(e, Tag).value) == 42


def test_single_param_reads_and_writes():
    """ref: the Single<T> system param."""
    from bevy_tpu.ecs.query import Single

    app = App(capacity=8)
    app.world.spawn(Health(hp=3.0))

    @system(name="boost")
    def boost(s=Single(Health)):
        s.health.hp = s.health.hp * 2.0

    app.add_systems(Update, boost)
    app.update(dt=1 / 60)
    assert float(app.world.get(0, Health).hp) == 6.0


def test_single_no_match_is_noop():
    from bevy_tpu.ecs.query import Single

    @component
    class Rare:
        v = field((), jnp.float32)

    app = App(capacity=8)
    app.world.register_component(Rare)
    e = app.world.spawn(Health(hp=1.0))

    @system(name="maybe")
    def maybe(s=Single(Rare), q=Query(Health)):
        q.health.hp = jnp.where(q.mask & s.exists,
                                q.health.hp + s.rare.v, q.health.hp)

    app.add_systems(Update, maybe)
    app.update(dt=1 / 60)
    assert float(app.world.get(e, Health).hp) == 1.0
