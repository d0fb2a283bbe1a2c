"""Loading screen (reference twin: examples/games/loading_screen.rs — a
Loading state polls asset readiness and flips to Ready only when every
tracked handle (and its dependencies) finished loading)."""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Res, Update
from bevy_tpu.asset import AssetPlugin, LoadState
from bevy_tpu.ecs.system import system
from bevy_tpu.state import NextState, add_state, in_state
from bevy_tpu.time import TimePlugin


class Phase:
    LOADING = 0
    READY = 1


def build_app(root=None):
    if root is None:
        root = Path(tempfile.mkdtemp(prefix="bevy_tpu_loading_"))
        for i in range(4):
            (root / f"piece{i}.json").write_text(json.dumps({"id": i}))
    app = App(capacity=4)
    app.add_plugins(TimePlugin(), AssetPlugin(root=str(root)))
    add_state(app, "phase", Phase.LOADING, [Phase.LOADING, Phase.READY])
    handles = [app.assets.load(f"piece{i}.json") for i in range(4)]
    app._handles = handles

    @system(host=True)
    def poll(ns=NextState("phase")):
        done = all(app.assets.load_state(h) == LoadState.LOADED
                   for h in handles)
        ns.set(jnp.asarray(Phase.READY if done else Phase.LOADING))

    app.add_systems(Update, poll, run_if=in_state("phase", Phase.LOADING))
    return app


if __name__ == "__main__":
    app = build_app()
    frames = 0
    while int(app.world.resource("state_phase").current) != Phase.READY \
            and frames < 200:
        app.update(dt=1 / 60)
        frames += 1
    print(f"loaded after {frames} frames; assets:",
          [app.assets.get(h)["id"] for h in app._handles])
