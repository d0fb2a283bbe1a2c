"""BSN scene composition (reference twin: the bsn! template patching of
bevy_scene — examples/scene/scene.rs recast: a base enemy template,
variant patches layered over it, nested children, and a JSON document
round-trip)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App
from bevy_tpu.ecs.component import component, field
from bevy_tpu.scene_template import Template
from bevy_tpu.transform import ChildOf, Transform, TransformPlugin
from bevy_tpu.time import TimePlugin


@component
class Stats:
    hp = field((), jnp.float32, default=10.0)
    speed = field((), jnp.float32, default=2.0)
    damage = field((), jnp.float32, default=1.0)


def build_templates():
    # base enemy with a weapon child (ref: bsn! { Enemy { .. } [ Weapon ] })
    weapon = Template(Stats(damage=3.0), name="weapon")
    enemy = Template(Stats(hp=10.0, speed=2.0), Transform(),
                     children=[weapon], name="enemy")
    # variants = field-level patches over the base; untouched fields keep
    elite = enemy.patch(Stats(hp=40.0), name="elite")
    boss = elite.patch(Stats(speed=1.0, damage=9.0), name="boss")
    return enemy, elite, boss


def demo():
    app = App(capacity=64)
    app.add_plugins(TimePlugin(), TransformPlugin())
    enemy, elite, boss = build_templates()

    rows = {}
    for tpl in (enemy, elite, boss):
        rows[tpl.name] = tpl.spawn(app.world).index
    app.update(dt=1 / 60)

    for name, row in rows.items():
        s = app.world.get(row, Stats)
        kids = [r for r in range(app.world.capacity)
                if app.world.has(r, ChildOf) and
                int(app.world.get(r, ChildOf).parent) == row]
        print(f"{name:6s} hp={float(s.hp):5.1f} speed={float(s.speed):3.1f} "
              f"children={len(kids)}")

    # document round-trip (ref: scene asset serialization)
    doc = boss.to_dict()
    again = Template.from_dict(doc)
    b2 = again.spawn(app.world)
    app.update(dt=1 / 60)
    s = app.world.get(b2.index, Stats)
    print(f"roundtrip boss hp={float(s.hp)} damage={float(s.damage)}")
    return float(s.hp), float(s.damage)


if __name__ == "__main__":
    demo()
