"""many_components stress test (reference twin:
examples/stress_tests/many_components.rs — many distinct component
types across many entities stresses registration + scheduling)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time as pytime

import numpy as np

from bevy_tpu import App, Query, Update
from bevy_tpu.ecs.component import define_component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


def build_app(n_types=40, per_type=64):
    app = App(capacity=n_types * per_type + 64)
    app.add_plugins(TimePlugin())
    comps = [define_component(f"stress_c{i}", {"v": field(())})
             for i in range(n_types)]
    for c in comps:
        vals = np.arange(per_type, dtype=np.float32)
        app.world.spawn_batch([c(v=vals)], per_type)

    systems = []
    for i, c in enumerate(comps[:12]):       # a dozen systems over them
        def make(comp, k):
            @system(name=f"bump{k}")
            def bump(q=Query(comp)):
                col = getattr(q, comp.__component_spec__.attr)
                col.v = col.v * 1.0001
            return bump
        systems.append(make(c, i))
    app.add_systems(Update, systems)
    return app


def main():
    app = build_app()
    app.update(dt=1 / 60)
    t0 = pytime.perf_counter()
    for _ in range(20):
        app.update(dt=1 / 60)
    print(f"many_components: {(pytime.perf_counter() - t0) / 20 * 1000:.2f} "
          "ms/frame (40 types, 12 systems)")


if __name__ == "__main__":
    main()
