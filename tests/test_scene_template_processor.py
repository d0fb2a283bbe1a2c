"""Scene templates (ref model: BSN patching semantics) and the asset
processor (ref model: bevy_asset processor — hash-gated reprocessing,
processor-gated reads)."""

import json

import numpy as np

from bevy_tpu import App
from bevy_tpu.asset import AssetServer
from bevy_tpu.asset_processor import AssetProcessor
from bevy_tpu.ecs.component import component, field
from bevy_tpu.scene_template import Template
from bevy_tpu.transform import ChildOf, Transform, TransformPlugin


@component
class TplHealth:
    hp = field((), default=10.0)
    armor = field((), default=1.0)


def _app():
    app = App(capacity=32)
    app.add_plugins(TransformPlugin())
    app.world.register_component(TplHealth)
    return app


def test_template_patch_field_level():
    app = _app()
    base = Template(TplHealth(hp=10.0, armor=3.0), Transform())
    boss = base.patch(TplHealth(hp=100.0))     # armor must survive
    e = boss.spawn(app.world)
    app.update(dt=1 / 60)
    row = e.index if hasattr(e, "index") else e
    h = app.world.get(row, TplHealth)
    assert float(h.hp) == 100.0
    assert float(h.armor) == 3.0


def test_template_children_hierarchy():
    app = _app()
    child = Template(Transform(translation=(1.0, 0.0, 0.0)))
    squad = Template(Transform(), children=[child, child])
    root = squad.spawn(app.world)
    app.update(dt=1 / 60)
    rows = app.world.query_rows(ChildOf)
    parents = np.asarray(app.world.column(ChildOf, "parent"))[rows]
    rroot = root.index if hasattr(root, "index") else root
    assert (parents == rroot).sum() == 2


def test_template_patch_children_override():
    a = Template(Transform())
    squad = Template(Transform(), children=[a, a, a])
    duo = squad.patch(children=[a])
    assert len(squad.children) == 3 and len(duo.children) == 1


def test_processor_hash_gating(tmp_path):
    src = tmp_path / "assets"
    out = tmp_path / "processed"
    src.mkdir()
    (src / "data.txt").write_text("hello")

    calls = []

    def upper(data, path):
        calls.append(path.name)
        return data.upper()

    proc = AssetProcessor(src, out)
    proc.register(".txt", upper, name="upper", version=1)
    s1 = proc.process_all()
    assert s1["processed"] == 1
    assert (out / "data.txt").read_text() == "HELLO"
    # unchanged → skipped, processor not called again
    s2 = proc.process_all()
    assert s2["skipped"] == 1 and len(calls) == 1
    # source change → reprocessed
    (src / "data.txt").write_text("world")
    s3 = proc.process_all()
    assert s3["processed"] == 1 and len(calls) == 2
    assert (out / "data.txt").read_text() == "WORLD"
    meta = json.loads((out / "data.txt.meta.json").read_text())
    assert meta["processor"] == "upper"
    # source removal → artifact pruned
    (src / "data.txt").unlink()
    s4 = proc.process_all()
    assert s4["removed"] >= 1
    assert not (out / "data.txt").exists()


def test_processor_gated_reads(tmp_path):
    src = tmp_path / "assets"
    out = tmp_path / "processed"
    src.mkdir()
    (src / "cfg.json").write_text(json.dumps({"speed": 1}))

    def double(data, path):
        d = json.loads(data)
        return json.dumps({k: v * 2 for k, v in d.items()}).encode()

    proc = AssetProcessor(src, out)
    proc.register(".json", double)
    proc.process_all()
    server = AssetServer(root=src, processed=out)
    asset = server.load_sync("cfg.json")
    assert asset["speed"] == 2          # read the processed artifact
    raw = AssetServer(root=src)
    assert raw.load_sync("cfg.json")["speed"] == 1
