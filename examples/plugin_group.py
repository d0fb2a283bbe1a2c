"""Plugin groups (reference twin: examples/app/plugin_group.rs — bundle
several plugins into one ordered group, the DefaultPlugins pattern)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, ResMut, Update
from bevy_tpu.app.plugin import Plugin, PluginGroup
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@resource
class Beats:
    count = field((), jnp.int32)


class HeartbeatPlugin(Plugin):
    def build(self, app):
        app.insert_resource(Beats())

        @system
        def beat(b=ResMut(Beats)):
            b.count = b.count + 1

        app.add_systems(Update, beat)


class HelloPlugin(Plugin):
    def build(self, app):
        print("hello from HelloPlugin.build()")


class MyPlugins(PluginGroup):
    """The group: ordered, like DefaultPlugins.build()."""

    def plugins(self):
        return [TimePlugin(), HelloPlugin(), HeartbeatPlugin()]


def build_app():
    app = App(capacity=4)
    app.add_plugins(MyPlugins())
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(5):
        app.update(dt=1 / 60)
    print("beats:", int(app.world.resource(Beats).count))
