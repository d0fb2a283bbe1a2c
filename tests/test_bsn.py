"""BSN scene-system depth (ref: bevy_scene — `bsn!` template composition,
patch layering `src/scene_patch.rs`, asset-path auto-resolution
`src/resolved_scene.rs`): inheritance via documents, patch-over-patch,
serialization round-trip, and AssetServer-resolved template/glb refs."""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from bevy_tpu import App
from bevy_tpu.asset import AssetServer
from bevy_tpu.ecs.component import component, field
from bevy_tpu.scene_template import AssetRef, Template
from bevy_tpu.transform import ChildOf, Transform, TransformPlugin


@component
class BsnStats:
    hp = field((), default=10.0)
    speed = field((), default=1.0)
    armor = field((), default=0.0)


def _app(capacity=64):
    app = App(capacity=capacity)
    app.add_plugins(TransformPlugin())
    app.world.register_component(BsnStats)
    return app


def test_patch_layering_two_over_base():
    """Two patches layered over a base: later layers win field-by-field,
    untouched fields survive (ref: ScenePatch stacking)."""
    base = Template(BsnStats(hp=10.0, speed=2.0, armor=5.0), Transform())
    p1 = Template(BsnStats(hp=50.0))            # layer 1: hp only
    p2 = Template(BsnStats(speed=9.0))          # layer 2: speed only
    final = base.apply(p1, p2)
    app = _app()
    e = final.spawn(app.world)
    app.update(dt=1 / 60)
    s = app.world.get(e.index, BsnStats)
    assert float(s.hp) == 50.0        # from p1
    assert float(s.speed) == 9.0      # from p2
    assert float(s.armor) == 5.0      # from base


def test_document_inherit_and_patches():
    doc = {
        "inherit": {
            "components": {"BsnStats": {"hp": 10.0, "armor": 4.0}},
            "children": [{"components": {"BsnStats": {"hp": 1.0}}}],
        },
        "patches": [
            {"components": {"BsnStats": {"hp": 99.0}}},
            {"components": {"BsnStats": {"speed": 3.0}}},
        ],
    }
    tpl = Template.from_dict(doc)
    app = _app()
    e = tpl.spawn(app.world)
    app.update(dt=1 / 60)
    s = app.world.get(e.index, BsnStats)
    assert float(s.hp) == 99.0
    assert float(s.armor) == 4.0
    assert float(s.speed) == 3.0
    # base children survive patch layers that don't touch children
    kids = [r for r in range(app.world.capacity)
            if app.world.has(r, ChildOf) and
            int(app.world.get(r, ChildOf).parent) == e.index]
    assert len(kids) == 1


def test_roundtrip_to_dict_from_dict():
    base = Template(BsnStats(hp=7.0), Transform(),
                    children=[Template(BsnStats(hp=1.0)),
                              AssetRef("sub.bsn.json")],
                    name="root")
    doc = base.to_dict()
    txt = json.dumps(doc)        # must be JSON-serializable
    tpl2 = Template.from_dict(json.loads(txt),
                              resolver=lambda p: Template(BsnStats(hp=2.0)))
    assert tpl2.name == "root"
    assert float(tpl2.components["bsn_stats"].values["hp"]) == 7.0
    assert len(tpl2.children) == 2
    assert isinstance(tpl2.children[1], AssetRef)


def test_asset_resolved_inherit_chain(tmp_path):
    """derived.bsn.json inherits base.bsn.json through the AssetServer
    (nested template reference resolution)."""
    (tmp_path / "base.bsn.json").write_text(json.dumps({
        "components": {"BsnStats": {"hp": 10.0, "armor": 8.0}}}))
    (tmp_path / "derived.bsn.json").write_text(json.dumps({
        "inherit": "base.bsn.json",
        "patches": [{"components": {"BsnStats": {"hp": 77.0}}}]}))
    server = AssetServer(root=str(tmp_path))
    from bevy_tpu.scene_template import register_bsn_loader
    register_bsn_loader(server)
    tpl = server.load_sync("derived.bsn.json")
    assert isinstance(tpl, Template)
    app = _app()
    e = tpl.spawn(app.world, ctx={"assets": server})
    app.update(dt=1 / 60)
    s = app.world.get(e.index, BsnStats)
    assert float(s.hp) == 77.0
    assert float(s.armor) == 8.0


def test_glb_child_auto_loads(tmp_path):
    """A template child referencing a .glb auto-loads through the
    AssetServer and spawns Mesh3d nodes parented under the template
    node (ref: bsn asset-path auto-resolution of scene handles)."""
    from load_gltf import generate_glb

    from bevy_tpu.render import RenderPlugin
    from bevy_tpu.render.mesh3d import Mesh3d, Mesh3dPlugin
    from bevy_tpu.render.texture import AtlasBuilder
    from bevy_tpu.time import TimePlugin

    glb = tmp_path / "scene.glb"
    generate_glb(glb)
    (tmp_path / "level.bsn.json").write_text(json.dumps({
        "components": {"Transform": {}},
        "children": [{"ref": "scene.glb"}]}))

    server = AssetServer(root=str(tmp_path))
    from bevy_tpu.scene_template import register_bsn_loader
    register_bsn_loader(server)

    app = App(capacity=32)
    atlas = AtlasBuilder(64, 64)
    plugin = Mesh3dPlugin(atlas=atlas, backend="xla")
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=64, height=64), plugin)
    tpl = server.load_sync("level.bsn.json")
    root = tpl.spawn(app.world, ctx={"assets": server,
                                     "mesh3d_plugin": plugin,
                                     "atlas": atlas})
    mesh_rows = [r for r in range(app.world.capacity)
                 if app.world.has(r, Mesh3d)]
    assert len(mesh_rows) >= 2     # the two glb nodes
    for r in mesh_rows:
        assert app.world.has(r, ChildOf)
        assert int(app.world.get(r, ChildOf).parent) == root.index
