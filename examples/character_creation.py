"""Character creation (reference twin:
examples/usage/character_creation.rs — cycle parts/classes by swapping
components on one entity)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@component
class Warrior:
    might = field((), default=8.0)


@component
class Mage:
    wit = field((), default=9.0)


@component
class Rogue:
    guile = field((), default=7.0)


CLASSES = [Warrior, Mage, Rogue]


def build_app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin())
    hero = app.world.spawn(Warrior())
    app._hero = hero
    app._class_idx = 0
    return app


def cycle_class(app):
    """Swap the class component (ref: the A/B/C key handlers)."""
    old = CLASSES[app._class_idx]
    app._class_idx = (app._class_idx + 1) % len(CLASSES)
    new = CLASSES[app._class_idx]
    app.world.remove(app._hero, old)
    app.world.insert(app._hero, new())
    return new.__name__


def main():
    app = build_app()
    app.update(dt=1 / 60)
    seq = []
    for _ in range(4):
        seq.append(cycle_class(app))
        app.update(dt=1 / 60)
    has = [c.__name__ for c in CLASSES
           if app.world.entity_count(c) > 0]
    print("cycled through:", " -> ".join(seq), "| current:", has)


if __name__ == "__main__":
    main()
