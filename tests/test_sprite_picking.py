"""Sprite picking backend (ref models: bevy_picking pointer events +
the sprite picking backend of bevy_sprite_render)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.observer import On
from bevy_tpu.ecs.query import ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin, MouseButton
from bevy_tpu.picking import (
    PointerClick, PointerOut, PointerOver, SpritePickingPlugin,
)
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.sprite import Sprite
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle

W, H = 160, 120


def _app():
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=W, height=H), SpritePlugin(),
                    SpritePickingPlugin(W, H))
    app.world.spawn(Camera2d(), *transform_bundle())
    app.insert_resource("log", {"over": jnp.zeros((), jnp.int32),
                                "out": jnp.zeros((), jnp.int32),
                                "click": jnp.zeros((), jnp.int32),
                                "last": jnp.full((), -1, jnp.int32)})

    @system(name="tally")
    def tally(r=ResMut("log"), ov=On(PointerOver), ou=On(PointerOut),
              cl=On(PointerClick)):
        fo, mo = ov.read()
        r.over = r.over + jnp.sum(mo.astype(jnp.int32))
        r.last = jnp.where(jnp.any(mo), fo["row"][jnp.argmax(mo)], r.last)
        _, mu = ou.read()
        r.out = r.out + jnp.sum(mu.astype(jnp.int32))
        _, mc = cl.read()
        r.click = r.click + jnp.sum(mc.astype(jnp.int32))

    app.add_systems(Update, tally)
    return app


def test_hover_click_out_sequence():
    app = _app()
    s = app.world.spawn(Sprite(size=(40, 30), color=(1, 0, 0, 1)),
                        *transform_bundle(translation=(20.0, 10.0, 5.0)))
    app.update(dt=1 / 60)
    # move over the sprite (screen px: world (20,10) → (100, 50))
    app.input.move_to(100.0, 50.0)
    app.update(dt=1 / 60)
    log = app.world.resource("log")
    assert int(log.over) == 1 and int(log.last) == s.index
    # click it
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    assert int(app.world.resource("log").click) == 1
    app.input.release_mouse(MouseButton.Left)
    # move away
    app.input.move_to(5.0, 5.0)
    app.update(dt=1 / 60)
    log = app.world.resource("log")
    assert int(log.out) == 1
    assert int(log.over) == 1          # no extra over


def test_topmost_sprite_wins():
    app = _app()
    app.world.spawn(Sprite(size=(60, 60), color=(0, 1, 0, 1)),
                    *transform_bundle(translation=(0.0, 0.0, 1.0)))
    top = app.world.spawn(Sprite(size=(20, 20), color=(0, 0, 1, 1)),
                          *transform_bundle(translation=(0.0, 0.0, 9.0)))
    app.update(dt=1 / 60)
    app.input.move_to(W / 2, H / 2)
    app.update(dt=1 / 60)
    assert int(app.world.resource("log").last) == top.index


def test_click_bubbles_to_parent_observer():
    """ref: bevy_picking bubbled Pointer<Click> — a handler observing the
    PARENT entity reacts to a click on the child sprite."""
    from bevy_tpu.transform import set_parent

    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=W, height=H), SpritePlugin(),
                    SpritePickingPlugin(W, H))
    app.world.spawn(Camera2d(), *transform_bundle())
    parent = app.world.spawn(*transform_bundle())
    child = app.world.spawn(Sprite(size=(40, 30), color=(1, 0, 0, 1)),
                            *transform_bundle(translation=(20.0, 10.0, 5.0)))
    set_parent(app.world, child, parent)
    prow = parent.index
    app.insert_resource("blog", {"parent_hit": jnp.zeros((), jnp.int32)})

    @system(name="parent_handler")
    def parent_handler(r=ResMut("blog"), cl=On(PointerClick, bubble=True)):
        r.parent_hit = r.parent_hit + \
            cl.bubble_mask()[prow].astype(jnp.int32)

    app.add_systems(Update, parent_handler)
    app.update(dt=1 / 60)
    # child sits at world (20,10): its translation is overwritten by
    # transform propagation (parent at origin) → still (20,10)
    app.input.move_to(100.0, 50.0)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    assert int(app.world.resource("blog").parent_hit) == 1


def test_drag_family_sequence():
    """Press → move past threshold → DragStart + per-frame Drag deltas →
    release over another sprite → DragEnd + DragDrop (ref:
    bevy_picking/src/events.rs drag family)."""
    from bevy_tpu.picking import (
        PointerDrag, PointerDragDrop, PointerDragEnd, PointerDragStart,
        PointerPressed, PointerReleased,
    )

    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=W, height=H), SpritePlugin(),
                    SpritePickingPlugin(W, H))
    app.world.spawn(Camera2d(), *transform_bundle())
    src = app.world.spawn(Sprite(size=(20, 20), color=(1, 0, 0, 1)),
                          *transform_bundle(translation=(-30.0, 0.0, 5.0)))
    dst = app.world.spawn(Sprite(size=(20, 20), color=(0, 1, 0, 1)),
                          *transform_bundle(translation=(30.0, 0.0, 5.0)))
    app.insert_resource("dlog", {
        "press": jnp.zeros((), jnp.int32),
        "start": jnp.zeros((), jnp.int32),
        "drags": jnp.zeros((), jnp.int32),
        "dx_sum": jnp.zeros((), jnp.float32),
        "end": jnp.zeros((), jnp.int32),
        "drop_target": jnp.full((), -1, jnp.int32),
        "dropped": jnp.full((), -1, jnp.int32),
        "release": jnp.zeros((), jnp.int32)})

    @system(name="dtally")
    def dtally(r=ResMut("dlog"), pr=On(PointerPressed),
               st=On(PointerDragStart), dr=On(PointerDrag),
               en=On(PointerDragEnd), dp=On(PointerDragDrop),
               rl=On(PointerReleased)):
        _, mp = pr.read()
        r.press = r.press + jnp.sum(mp.astype(jnp.int32))
        _, ms = st.read()
        r.start = r.start + jnp.sum(ms.astype(jnp.int32))
        fd, md = dr.read()
        r.drags = r.drags + jnp.sum(md.astype(jnp.int32))
        r.dx_sum = r.dx_sum + jnp.sum(jnp.where(md, fd["dx"], 0.0))
        _, me = en.read()
        r.end = r.end + jnp.sum(me.astype(jnp.int32))
        fp, mq = dp.read()
        any_drop = jnp.any(mq)
        k = jnp.argmax(mq)
        r.drop_target = jnp.where(any_drop, fp["row"][k], r.drop_target)
        r.dropped = jnp.where(any_drop, fp["dropped"][k], r.dropped)
        _, mr = rl.read()
        r.release = r.release + jnp.sum(mr.astype(jnp.int32))

    app.add_systems(Update, dtally)
    app.update(dt=1 / 60)
    # src world (-30,0) → screen (50,60); dst world (30,0) → (110,60)
    app.input.move_to(50.0, 60.0)
    app.update(dt=1 / 60)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    log = app.world.resource("dlog")
    assert int(log.press) == 1 and int(log.start) == 0
    # drag right in two steps of +30 px
    app.input.move_to(80.0, 60.0)
    app.update(dt=1 / 60)
    app.input.move_to(110.0, 60.0)
    app.update(dt=1 / 60)
    log = app.world.resource("dlog")
    assert int(log.start) == 1
    assert int(log.drags) == 2
    assert abs(float(log.dx_sum) - 60.0) < 1e-4
    # release over dst
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    log = app.world.resource("dlog")
    assert int(log.end) == 1 and int(log.release) == 1
    assert int(log.drop_target) == dst.index
    assert int(log.dropped) == src.index


def test_click_without_move_never_drags():
    from bevy_tpu.picking import PointerDrag, PointerDragStart

    app = _app()
    app.world.spawn(Sprite(size=(40, 30), color=(1, 0, 0, 1)),
                    *transform_bundle(translation=(20.0, 10.0, 5.0)))
    app.insert_resource("dlog2", {"start": jnp.zeros((), jnp.int32),
                                  "drags": jnp.zeros((), jnp.int32)})

    @system(name="dtally2")
    def dtally2(r=ResMut("dlog2"), st=On(PointerDragStart),
                dr=On(PointerDrag)):
        _, ms = st.read()
        r.start = r.start + jnp.sum(ms.astype(jnp.int32))
        _, md = dr.read()
        r.drags = r.drags + jnp.sum(md.astype(jnp.int32))

    app.add_systems(Update, dtally2)
    app.update(dt=1 / 60)
    app.input.move_to(100.0, 50.0)
    app.update(dt=1 / 60)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    log = app.world.resource("dlog2")
    assert int(log.start) == 0 and int(log.drags) == 0
