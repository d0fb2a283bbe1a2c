"""Scenes, templates and the asset processor (reference twins:
examples/scene/scene.rs — world save/load round-trip; BSN templates;
bevy_asset's processor pipeline)."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, component, field
from bevy_tpu.asset import AssetServer
from bevy_tpu.asset_processor import AssetProcessor
from bevy_tpu.scene import Scene
from bevy_tpu.scene_template import Template
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin


@component
class Health:
    hp = field((), default=10.0)
    armor = field((), default=1.0)


def main():
    app = App(capacity=64)
    app.add_plugins(TimePlugin(), TransformPlugin())
    app.world.register_component(Health)

    # -- templates with BSN-style field patches
    grunt = Template(Health(hp=10.0, armor=2.0), Transform(), name="grunt")
    boss = grunt.patch(Health(hp=200.0), name="boss")   # armor inherited
    squad = Template(Transform(), children=[grunt, grunt, boss])
    squad.spawn(app.world)
    app.update(dt=1 / 60)

    # -- world snapshot round-trip (ref: DynamicScene/DynamicWorld)
    snap = Scene.from_world(app.world)
    app2 = App(capacity=64)
    app2.add_plugins(TimePlugin(), TransformPlugin())
    app2.world.register_component(Health)
    mapping = snap.spawn(app2.world)
    app2.update(dt=1 / 60)
    print(f"scene round-trip: {len(mapping)} entities restored")

    # -- BSN documents: inherit + patch layering + asset-path refs
    # (ref: bevy_scene scene_patch.rs / resolved_scene.rs)
    import json

    from bevy_tpu.scene_template import register_bsn_loader

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        (root / "grunt.bsn.json").write_text(json.dumps({
            "components": {"health": {"hp": 10.0, "armor": 2.0},
                           "transform": {}}}))
        (root / "elite.bsn.json").write_text(json.dumps({
            "inherit": "grunt.bsn.json",              # nested template ref
            "patches": [
                {"components": {"health": {"hp": 40.0}}},     # layer 1
                {"components": {"health": {"armor": 9.0}}},   # layer 2
            ]}))
        server = AssetServer(root=str(root))
        register_bsn_loader(server)
        elite = server.load_sync("elite.bsn.json")
        e = elite.spawn(app.world, ctx={"assets": server})
        app.update(dt=1 / 60)
        h = app.world.get(e.index, Health)
        print(f"bsn layered elite: hp={float(h.hp)} armor={float(h.armor)}")

    # -- asset processor: hash-gated offline processing
    with tempfile.TemporaryDirectory() as tmp:
        src = Path(tmp) / "assets"
        out = Path(tmp) / "processed"
        src.mkdir()
        (src / "config.json").write_text('{"difficulty": 2}')
        proc = AssetProcessor(src, out)
        proc.register(".json", lambda data, p: data.upper())
        s1 = proc.process_all()
        s2 = proc.process_all()
        server = AssetServer(root=src, processed=out)
        print(f"processor: {s1['processed']} processed, "
              f"{s2['skipped']} skipped on re-run; "
              f"gated read ok={server.load_sync('config.json') is not None}")


if __name__ == "__main__":
    main()
