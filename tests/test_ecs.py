"""ECS core tests (ref twin: bevy_ecs in-crate tests + the canonical
how_to_test_systems.rs pattern: build world, add systems, update, assert)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_tpu.ecs import (
    component, field, resource, World, system, Query, Read, Res, ResMut,
    Commands, Local, message, MessageReader, MessageWriter,
)
from bevy_tpu.ecs.schedule import Schedule


@component
class Pos:
    value = field(2)


@component
class Vel:
    value = field(2)


@component
class Marker:
    pass


@resource
class Gravity:
    accel = field(2, default=(0.0, -9.8))


def test_spawn_and_get():
    w = World(capacity=16)
    e = w.spawn(Pos(value=(1.0, 2.0)), Vel(value=(0.5, 0.0)))
    assert w.is_alive(e)
    assert w.has(e, Pos)
    np.testing.assert_allclose(w.get(e, Pos).value, [1.0, 2.0])
    assert w.entity_count(Pos, Vel) == 1


def test_spawn_batch_and_mask():
    w = World(capacity=64)
    rows = w.spawn_batch([Pos(value=np.zeros((10, 2), np.float32)), Vel()], 10)
    assert len(rows) == 10
    assert w.entity_count(Pos) == 10
    w.spawn(Pos(value=(5.0, 5.0)))
    assert w.entity_count(Pos) == 11
    assert w.entity_count(Vel) == 10


def test_despawn_reuses_rows_with_generation_bump():
    w = World(capacity=16)
    e = w.spawn(Pos())
    gen0 = e.generation
    w.despawn(e)
    assert not w.is_alive(e)
    e2 = w.spawn(Pos())
    assert e2.index == e.index
    assert e2.generation == gen0 + 1


def test_capacity_growth():
    w = World(capacity=4)
    w.spawn_batch([Pos()], 20)
    assert w.capacity >= 20
    assert w.entity_count(Pos) == 20


def test_system_moves_entities():
    w = World(capacity=16)
    w.spawn(Pos(value=(0.0, 0.0)), Vel(value=(1.0, 0.0)))
    w.spawn(Pos(value=(10.0, 10.0)), Vel(value=(0.0, 2.0)))
    w.spawn(Pos(value=(-5.0, 0.0)))  # no Vel: must not move

    @system
    def integrate(q=Query(Pos, Read(Vel))):
        q.pos.value = q.pos.value + q.vel.value

    sched = Schedule("test")
    sched.add_systems(integrate)
    sched.init_systems(w)
    w.state = jax.jit(lambda s: sched.run_traced(s, w))(w.state)

    np.testing.assert_allclose(w.get(0, Pos).value, [1.0, 0.0])
    np.testing.assert_allclose(w.get(1, Pos).value, [10.0, 12.0])
    np.testing.assert_allclose(w.get(2, Pos).value, [-5.0, 0.0])


def test_resource_access():
    w = World(capacity=16)
    w.insert_resource(Gravity())
    w.spawn(Vel(value=(0.0, 0.0)))

    @system
    def apply_gravity(q=Query(Vel), g=Res(Gravity)):
        q.vel.value = q.vel.value + g.accel * 0.1

    sched = Schedule("test")
    sched.add_systems(apply_gravity)
    sched.init_systems(w)
    w.state = sched.run_traced(w.state, w)
    np.testing.assert_allclose(w.get(0, Vel).value, [0.0, -0.98], atol=1e-6)


def test_resmut_staging():
    w = World(capacity=4)
    w.insert_resource(Gravity())

    @system
    def flip(g=ResMut(Gravity)):
        g.accel = -g.accel

    sched = Schedule("t")
    sched.add_systems(flip)
    sched.init_systems(w)
    w.state = sched.run_traced(w.state, w)
    np.testing.assert_allclose(w.resource(Gravity).accel, [0.0, 9.8])


def test_changed_filter():
    w = World(capacity=16)
    w.spawn(Pos(value=(1.0, 1.0)), Vel(value=(1.0, 1.0)))
    w.spawn(Pos(value=(2.0, 2.0)))

    hits = []

    @resource
    class Counter:
        n = field((), jnp.int32)

    @system
    def move_some(q=Query(Pos, with_=[Vel])):
        q.pos.value = q.pos.value + 1.0

    @system
    def count_changed(q=Query(Read(Pos), changed=[Pos]), c=ResMut(Counter)):
        c.n = c.n + q.count()

    w.insert_resource(Counter())
    sched = Schedule("t")
    sched.add_systems(move_some)
    sched.add_systems(count_changed, after=move_some)
    sched.init_systems(w)
    # first run: both spawned this tick → spawn counts as changed for both,
    # but count_changed's last_run starts at 0 so sees both spawn-changed rows
    w.state = sched.run_traced(w.state, w)
    first = int(w.resource(Counter).n)
    assert first == 2
    # second run: only the moved entity is changed since count's last run
    w.state = sched.run_traced(w.state, w)
    assert int(w.resource(Counter).n) == first + 1


def test_commands_despawn_in_jit():
    w = World(capacity=16)
    w.spawn(Pos(value=(0.0, 0.0)))
    w.spawn(Pos(value=(100.0, 0.0)))

    @system
    def cull_far(q=Query(Read(Pos)), cmd=Commands()):
        far = jnp.abs(q.pos.value[:, 0]) > 50.0
        cmd.despawn(q.mask & far)

    sched = Schedule("t")
    sched.add_systems(cull_far)
    sched.init_systems(w)
    w.state = jax.jit(lambda s: sched.run_traced(s, w))(w.state)
    assert w.entity_count(Pos) == 1


def test_commands_spawn_in_jit():
    w = World(capacity=32)
    w.spawn(Pos(value=(1.0, 1.0)))

    @system
    def spawner(cmd=Commands(spawn_comps=[Pos, Vel], budget=4)):
        cmd.spawn(Pos(value=jnp.ones((4, 2)) * 7.0), Vel(), count=3, budget=4)

    sched = Schedule("t")
    sched.add_systems(spawner)
    sched.init_systems(w)
    w.state = jax.jit(lambda s: sched.run_traced(s, w))(w.state)
    assert w.entity_count(Pos) == 4
    assert w.entity_count(Vel) == 3


def test_messages_roundtrip():
    @message
    class Ping:
        data = field((), jnp.float32)

    w = World(capacity=8)
    w.add_message(Ping, capacity=8)

    @system
    def sender(wr=MessageWriter(Ping, budget=2)):
        wr.send(count=2, data=jnp.array([1.5, 2.5]))

    @resource
    class Sum:
        total = field((), jnp.float32)

    w.insert_resource(Sum())

    @system
    def receiver(rd=MessageReader(Ping), s=ResMut(Sum)):
        fields, mask = rd.read()
        s.total = s.total + jnp.sum(jnp.where(mask, fields["data"], 0.0))

    sched = Schedule("t")
    sched.add_systems(sender)
    sched.add_systems(receiver, after=sender)
    sched.init_systems(w)
    w.state = sched.run_traced(w.state, w)
    assert float(w.resource(Sum).total) == pytest.approx(4.0)


def test_local_state():
    w = World(capacity=4)

    @system
    def counting(local=Local(jnp.asarray(0, jnp.int32))):
        local.value = local.value + 1

    sched = Schedule("t")
    sched.add_systems(counting)
    sched.init_systems(w)
    for _ in range(3):
        w.state = sched.run_traced(w.state, w)
    assert int(w.state["sys"][counting.id]["local"]["local"]) == 3


def test_schedule_ordering_and_ambiguity():
    w = World(capacity=4)
    w.spawn(Pos())
    log = []

    @system
    def a(q=Query(Pos)):
        log.append("a")
        q.pos.value = q.pos.value + 1.0

    @system
    def b(q=Query(Pos)):
        log.append("b")
        q.pos.value = q.pos.value * 2.0

    sched = Schedule("t")
    sched.add_systems(b)           # inserted first
    sched.add_systems(a, before=b)  # but must run before b
    order = [e.system.name for e in sched.build_order()]
    assert order == ["a", "b"]
    # no explicit order → conflicting writes to Pos are ambiguous
    sched2 = Schedule("t2")
    sched2.add_systems(a)
    sched2.add_systems(b)
    sched2.build_order()
    assert len(sched2.ambiguities) == 1


def test_cycle_detection():
    @system
    def s1(q=Query(Pos)):
        pass

    @system
    def s2(q=Query(Pos)):
        pass

    sched = Schedule("t")
    sched.add_systems(s1, after=s2)
    sched.add_systems(s2, after=s1)
    with pytest.raises(RuntimeError, match="cycle"):
        sched.build_order()


def test_marker_component_filtering():
    w = World(capacity=16)
    w.spawn(Pos(value=(1.0, 0.0)), Marker())
    w.spawn(Pos(value=(2.0, 0.0)))

    @system
    def boost(q=Query(Pos, with_=[Marker])):
        q.pos.value = q.pos.value * 10.0

    sched = Schedule("t")
    sched.add_systems(boost)
    sched.init_systems(w)
    w.state = sched.run_traced(w.state, w)
    np.testing.assert_allclose(w.get(0, Pos).value, [10.0, 0.0])
    np.testing.assert_allclose(w.get(1, Pos).value, [2.0, 0.0])


def test_clone_entity():
    w = World(capacity=16)
    e = w.spawn(Pos(value=(3.0, 4.0)), Vel(value=(1.0, 0.0)))
    c = w.clone_entity(e)
    assert c.index != e.index
    got = w.get(c, Pos)
    assert got.value.tolist() == [3.0, 4.0]
    assert w.has(c, Vel)
    # clone minus a component
    c2 = w.clone_entity(e, without=[Vel])
    assert w.has(c2, Pos) and not w.has(c2, Vel)
    # clones are independent rows
    w.despawn(e)
    assert w.is_alive(c) and w.is_alive(c2)


def test_query_builder():
    from bevy_tpu import QueryBuilder

    w = World(capacity=16)
    w.spawn(Pos(value=(1.0, 0.0)), Vel(value=(0.5, 0.0)))
    w.spawn(Pos(value=(2.0, 0.0)))

    q = QueryBuilder().data(Pos).ref_(Vel).build()

    @system
    def integrate(q=q):
        q.pos.value = q.pos.value + q.vel.value

    sched = Schedule("t")
    sched.add_systems(integrate)
    sched.init_systems(w)
    w.state = jax.jit(lambda s: sched.run_traced(s, w))(w.state)
    xs = np.asarray(jax.device_get(w.column(Pos, "value")))[:, 0]
    rows = w.query_rows(Pos)
    assert 1.5 in xs[rows] and 2.0 in xs[rows]


def test_clone_despawned_raises():
    w = World(capacity=16)
    e = w.spawn(Pos(value=(1.0, 1.0)))
    w.despawn(e)
    with pytest.raises(ValueError):
        w.clone_entity(e)


def test_required_components():
    from bevy_tpu import component, field

    @component
    class Shield:
        hp = field((), jnp.float32, default=10.0)

    @component(requires=[Shield])
    class Armor:
        thickness = field((), jnp.float32, default=2.0)

    @component(requires=[Armor])   # transitive: Knight -> Armor -> Shield
    class Knight:
        pass

    w = World(capacity=16)
    e = w.spawn(Knight())
    assert w.has(e, Armor) and w.has(e, Shield)
    assert float(w.get(e, Shield).hp) == 10.0
    # explicit value wins over the required default
    e2 = w.spawn(Knight(), Shield(hp=99.0))
    assert float(w.get(e2, Shield).hp) == 99.0
    # insert on an entity that already has the requirement: value preserved
    e3 = w.spawn(Shield(hp=55.0))
    w.insert(e3, Armor())
    assert float(w.get(e3, Shield).hp) == 55.0


def test_required_components_device_spawn():
    from bevy_tpu import component, field

    @component
    class Engine:
        power = field((), jnp.float32, default=3.0)

    @component(requires=[Engine])
    class Ship:
        pass

    w = World(capacity=16)
    w.register_component(Ship)

    @system
    def launcher(cmd=Commands(spawn_comps=[Ship], budget=2)):
        cmd.spawn(Ship(), count=2)

    sched = Schedule("t")
    sched.add_systems(launcher)
    sched.init_systems(w)
    w.state = jax.jit(lambda s: sched.run_traced(s, w))(w.state)
    w.mark_device_dirty()
    assert w.entity_count(Ship) == 2
    assert w.entity_count(Engine) == 2
    rows = w.query_rows(Engine)
    pw = np.asarray(jax.device_get(w.column(Engine, "power")))[rows]
    assert (pw == 3.0).all()


def test_same_class_name_across_modules_gets_distinct_storage():
    """Two DIFFERENT classes sharing a snake name must not alias onto one
    storage pool (ref: full type paths disambiguate in bevy_reflect)."""
    import types

    from bevy_tpu.ecs.component import component as comp_dec, field as f
    from bevy_tpu.ecs.world import World

    m1 = types.ModuleType("fake_mod_a")
    m2 = types.ModuleType("fake_mod_b")

    class Health:
        value = f((), jnp.float32, default=1.0)
    Health.__module__ = m1.__name__
    H1 = comp_dec(Health)

    class Health:  # noqa: F811 — deliberate same-name redefinition
        hp = f((), jnp.float32, default=2.0)
    Health.__module__ = m2.__name__
    H2 = comp_dec(Health)

    from bevy_tpu.ecs.component import get_spec
    assert get_spec(H1).name != get_spec(H2).name

    w = World(capacity=4)
    e1 = w.spawn(H1(value=42.0))
    e2 = w.spawn(H2(hp=7.0))
    assert float(w.get(e1, H1).value) == 42.0
    assert float(w.get(e2, H2).hp) == 7.0
