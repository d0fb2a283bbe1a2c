"""Observer tests (ref model: bevy_ecs observer/ tests — same-frame
immediacy vs buffered messages)."""

import jax.numpy as jnp

from bevy_tpu import App, Query, Res, ResMut, Update, component, field, resource
from bevy_tpu.ecs.observer import On, Trigger, event
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@event
class Damaged:
    amount = field((), jnp.float32)


@resource
class Tally:
    total = field((), jnp.float32)
    frames_seen = field((), jnp.int32)


def _app():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(Tally())

    @system
    def attack(t=Trigger(Damaged, budget=4)):
        t.trigger(count=2, amount=5.0)

    @system
    def on_damaged(ev=On(Damaged), tally=ResMut(Tally)):
        fields, mask = ev.read()
        tally.total = tally.total + jnp.sum(
            jnp.where(mask, fields["amount"], 0.0))
        tally.frames_seen = tally.frames_seen + (ev.count() > 0)

    app.add_systems(Update, attack)
    app.add_observer(Damaged, on_damaged)
    return app


def test_observer_sees_events_same_frame():
    app = _app()
    app.update(dt=1 / 60)
    tally = app.world.resource(Tally)
    assert float(tally.total) == 10.0          # 2 events × 5.0, SAME frame
    assert int(tally.frames_seen) == 1


def test_buffer_clears_between_frames():
    app = _app()
    for _ in range(3):
        app.update(dt=1 / 60)
    tally = app.world.resource(Tally)
    assert float(tally.total) == 30.0          # no event carry-over
    assert int(tally.frames_seen) == 3


# ---------------------------------------------------------------------------
# lifecycle observers (ref model: OnAdd/OnInsert/OnRemove observers,
# bevy_ecs/src/lifecycle.rs)

@component
class Enemy:
    hp = field((), jnp.float32, default=3.0)


@resource
class LifeTally:
    added = field((), jnp.int32)
    removed = field((), jnp.int32)


def test_lifecycle_onadd_device_spawn_same_frame():
    from bevy_tpu import Commands, LifecycleMask, OnAdd

    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(LifeTally())
    app.world.register_component(Enemy)

    @system
    def spawner(res=Res("time"), cmd=Commands(spawn_comps=[Enemy], budget=2)):
        cmd.spawn(Enemy(hp=5.0), count=2)

    @system
    def on_enemy_added(life=LifecycleMask(OnAdd(Enemy)), t=ResMut(LifeTally)):
        t.added = t.added + life.count()

    app.add_systems(Update, spawner)
    app.add_observer(OnAdd(Enemy), on_enemy_added)

    app.update(dt=1 / 60)
    assert int(app.world.resource(LifeTally).added) == 2  # same frame
    app.update(dt=1 / 60)
    assert int(app.world.resource(LifeTally).added) == 4  # no double-count


def test_lifecycle_onremove_despawn_and_host_spawn():
    from bevy_tpu import Commands, LifecycleMask, OnAdd, OnRemove

    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(LifeTally())
    app.world.register_component(Enemy)

    @system
    def reaper(q=Query(Enemy), cmd=Commands()):
        cmd.despawn(q.mask & (q.enemy.hp <= 0.0))

    @system
    def on_removed(life=LifecycleMask(OnRemove(Enemy)), t=ResMut(LifeTally)):
        t.removed = t.removed + life.count()

    @system
    def on_added(life=LifecycleMask(OnAdd(Enemy)), t=ResMut(LifeTally)):
        t.added = t.added + life.count()

    app.add_systems(Update, reaper)
    app.add_observer(OnRemove(Enemy), on_removed)
    app.add_observer(OnAdd(Enemy), on_added)

    # host-tier spawns land between frames -> seen at next frame start
    app.world.spawn(Enemy(hp=0.0))
    app.world.spawn(Enemy(hp=9.0))
    app.update(dt=1 / 60)
    t = app.world.resource(LifeTally)
    assert int(t.added) == 2
    assert int(t.removed) == 1     # hp<=0 reaped, observed same frame
    app.update(dt=1 / 60)
    t = app.world.resource(LifeTally)
    assert int(t.added) == 2       # no re-fire
    assert int(t.removed) == 1


def test_lifecycle_no_retroactive_fire():
    from bevy_tpu import LifecycleMask, OnAdd

    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(LifeTally())
    app.world.spawn(Enemy(hp=1.0))   # exists BEFORE the observer registers
    app.update(dt=1 / 60)

    @system
    def on_added(life=LifecycleMask(OnAdd(Enemy)), t=ResMut(LifeTally)):
        t.added = t.added + life.count()

    app.add_observer(OnAdd(Enemy), on_added)
    app.update(dt=1 / 60)
    assert int(app.world.resource(LifeTally).added) == 0
    app.world.spawn(Enemy(hp=2.0))   # new spawns after registration DO fire
    app.update(dt=1 / 60)
    assert int(app.world.resource(LifeTally).added) == 1


# -- event bubbling (ref: observer Traversal + bevy_picking bubbled
#    Pointer events: a child-targeted event is handleable on ancestors)

@event
class Poked:
    row = field((), jnp.int32)


@resource
class BubbleLog:
    hits = field(16, jnp.float32)     # per-entity handle counts


def test_bubble_mask_walks_childof_chain():
    from bevy_tpu.transform import TransformPlugin, set_parent, \
        transform_bundle

    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin())
    app.insert_resource(BubbleLog())
    gp = app.world.spawn(*transform_bundle())     # grandparent
    pa = app.world.spawn(*transform_bundle())     # parent
    ch = app.world.spawn(*transform_bundle())     # child (event target)
    other = app.world.spawn(*transform_bundle())  # unrelated
    set_parent(app.world, pa, gp)
    set_parent(app.world, ch, pa)
    target = ch.index

    @system
    def poke(t=Trigger(Poked, budget=2)):
        t.trigger(count=1, row=jnp.asarray(target, jnp.int32))

    @system
    def on_poked(ev=On(Poked, bubble=True), log=ResMut(BubbleLog)):
        log.hits = log.hits + ev.bubble_mask().astype(jnp.float32)

    app.add_systems(Update, poke)
    app.add_observer(Poked, on_poked)
    app.update(dt=1 / 60)
    hits = app.world.resource(BubbleLog).hits
    assert float(hits[ch.index]) == 1.0       # the target itself
    assert float(hits[pa.index]) == 1.0       # its parent
    assert float(hits[gp.index]) == 1.0       # and grandparent
    assert float(hits[other.index]) == 0.0    # but not strangers
