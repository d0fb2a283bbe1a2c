"""Drag-and-drop sprites (reference twin: examples/picking/sprite_picking.rs
+ the Pointer<DragStart/Drag/DragEnd/DragDrop> family of
bevy_picking/src/events.rs — observers move the dragged sprite by the
per-frame drag delta and recolor the drop target)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Update
from bevy_tpu.ecs.observer import On
from bevy_tpu.ecs.query import Query, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin
from bevy_tpu.picking import (
    PointerDrag, PointerDragDrop, SpritePickingPlugin,
)
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.sprite import Sprite
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle

W, H = 320, 200


def build_app(width=W, height=H):
    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(), SpritePickingPlugin(width, height))
    app.world.spawn(Camera2d(), *transform_bundle())
    for i, col in enumerate([(1.0, 0.3, 0.2, 1.0), (0.2, 0.8, 0.3, 1.0),
                             (0.3, 0.4, 1.0, 1.0)]):
        app.world.spawn(
            Sprite(size=(36, 36), color=col),
            *transform_bundle(translation=(-80.0 + 80.0 * i, 0.0, float(i))))

    @system(name="drag_move")
    def drag_move(q=Query(Transform), dr=On(PointerDrag),
                  dp=On(PointerDragDrop)):
        # move the dragged sprite by the screen-pixel delta (2D camera at
        # scale 1: +x right, +y up = -dy screen)
        f, m = dr.read()
        any_drag = jnp.any(m)
        k = jnp.argmax(m)
        row = jnp.where(any_drag, f["row"][k], 0)
        dx = jnp.where(any_drag, f["dx"][k], 0.0)
        dy = jnp.where(any_drag, -f["dy"][k], 0.0)
        t = q.transform.translation
        moved = t.at[row, 0].add(dx).at[row, 1].add(dy)
        q.transform.translation = jnp.where(any_drag, moved, t)

    @system(name="drop_flash")
    def drop_flash(q=Query(Sprite), dp=On(PointerDragDrop)):
        # brighten whatever a sprite was dropped onto
        f, m = dp.read()
        any_drop = jnp.any(m)
        k = jnp.argmax(m)
        tgt = jnp.where(any_drop, f["row"][k], 0)
        c = q.sprite.color
        lit = c.at[tgt, :3].set(jnp.minimum(c[tgt, :3] + 0.4, 1.0))
        q.sprite.color = jnp.where(any_drop, lit, c)

    app.add_systems(Update, drag_move, drop_flash)
    return app


if __name__ == "__main__":
    from bevy_tpu.input import MouseButton
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    app.update(dt=1 / 60)
    # scripted drag: pick up the red square and drop it on the green one
    app.input.move_to(80.0, 100.0)          # over sprite 0 (world -80,0)
    app.update(dt=1 / 60)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    for x in range(80, 161, 16):
        app.input.move_to(float(x), 100.0)
        app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    import numpy as np
    np.save("/tmp/drag_and_drop_frame.npy", frame_image(app))
    print("dropped red onto green; frame saved to /tmp/drag_and_drop_frame.npy")
