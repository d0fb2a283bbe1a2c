"""Scene templates with patching (reference twin: bevy_scene's BSN —
the `bsn!` macro + field-level `Template` patches, `src/lib.rs:1-40`,
`scene_patch.rs`, `resolved_scene.rs`; and bevy_ecs `template.rs`).

A `Template` is a reusable entity description: component values +
children. `patch()` derives a variant overriding individual FIELDS of
individual components (the BSN patch semantic: later patches win
field-by-field, not component-by-component). `spawn()` instantiates
into a world, wiring ChildOf/Children for nested templates.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from bevy_tpu.ecs.component import ComponentInstance, get_spec


class AssetRef:
    """Deferred asset-path reference inside a template (ref: BSN's
    asset-path auto-resolution — `bsn!` turns `"path.ext"` tokens into
    handles resolved while the scene resolves,
    bevy_scene/src/resolved_scene.rs).

    As a CHILD entry: spawning the template loads the asset through the
    AssetServer and spawns its scene under the node (Template assets
    spawn recursively; GltfDocuments spawn through the Mesh3dPlugin in
    the spawn ctx). As a FIELD value (string form "asset:path#label"):
    the loaded (labeled) value replaces the field at spawn."""

    __slots__ = ("path",)

    def __init__(self, path: str):
        self.path = path

    def __repr__(self):
        return f"AssetRef({self.path!r})"


def _to_instance(comp) -> ComponentInstance:
    if isinstance(comp, ComponentInstance):
        return ComponentInstance(comp.spec, dict(comp.values))
    # a bare component class → defaults
    return ComponentInstance(get_spec(comp), {})


class Template:
    """ref: the resolved BSN scene node. Build with component values
    (instances or classes); derive with `.patch(...)`; nest with
    `children=[...]`.

    >>> enemy = Template(Sprite(size=(8, 8)), Health(hp=10))
    >>> boss = enemy.patch(Health(hp=100))          # other fields keep
    >>> squad = Template(Transform(), children=[enemy, enemy])
    """

    def __init__(self, *components, children: Optional[List["Template"]] = None,
                 name: Optional[str] = None):
        self.components: Dict[str, ComponentInstance] = {}
        for c in components:
            inst = _to_instance(c)
            self.components[inst.spec.name] = inst
        self.children: List[Template] = list(children or [])
        self.name = name

    def patch(self, *components, children: Optional[List["Template"]] = None,
              name: Optional[str] = None) -> "Template":
        """Field-level override: for each given component, only the
        EXPLICITLY set fields replace the base's (ref: BSN patch
        semantics — `Template` field patching, bevy_ecs/src/template.rs)."""
        out = Template(name=name or self.name)
        for key, inst in self.components.items():
            out.components[key] = ComponentInstance(inst.spec,
                                                    dict(inst.values))
        for c in components:
            inst = _to_instance(c)
            key = inst.spec.name
            if key in out.components:
                merged = dict(out.components[key].values)
                merged.update(inst.values)
                out.components[key] = ComponentInstance(inst.spec, merged)
            else:
                out.components[key] = inst
        out.children = [c for c in (children if children is not None
                                    else self.children)]
        return out

    def apply(self, *patches: "Template") -> "Template":
        """Layer whole-template patches over this base (ref: BSN patch
        composition — `ScenePatch` stacks, bevy_scene/src/scene_patch.rs).
        Each patch's components merge field-level (later layers win);
        a patch with children REPLACES the child list (BSN semantics:
        children are a field of the node)."""
        out = self
        for p in patches:
            out = out.patch(*p.components.values(),
                            children=p.children if p.children else None,
                            name=p.name)
        return out

    def spawn(self, world, parent: Optional[int] = None, ctx=None):
        """Instantiate into `world`; returns the root Entity. Children
        spawn recursively with ChildOf links (ref: SpawnScene +
        Spawn/SpawnRelated bundles). `ctx` (optional dict) provides
        asset resolution: {"assets": AssetServer, "mesh3d_plugin": …,
        "atlas": …} — defaults to the app-attached server
        (`world._app.assets`) when present."""
        from bevy_tpu.transform import set_parent

        comps = []
        for i in self.components.values():
            vals = {k: (_resolve_field(v, world, ctx)
                        if _is_asset_field(v) else v)
                    for k, v in i.values.items()}
            comps.append(ComponentInstance(i.spec, vals))
        e = world.spawn(*comps)
        row = e.index if hasattr(e, "index") else e
        if parent is not None:
            set_parent(world, row, parent)
        for child in self.children:
            if isinstance(child, AssetRef):
                _spawn_asset_child(child, world, row, ctx)
            else:
                child.spawn(world, parent=row, ctx=ctx)
        return e

    # ---- serialization (ref: BSN text form / scene_patch round-trip) ----

    def to_dict(self) -> dict:
        comps = {}
        for key, inst in self.components.items():
            comps[key] = {f: _encode_value(v)
                          for f, v in inst.values.items()}
        doc = {"components": comps}
        if self.name:
            doc["name"] = self.name
        if self.children:
            doc["children"] = [
                {"ref": c.path} if isinstance(c, AssetRef) else c.to_dict()
                for c in self.children]
        return doc

    @classmethod
    def from_dict(cls, doc: dict, resolver=None) -> "Template":
        """Build from a document. Supports `inherit` (a template doc,
        Template, or — via `resolver(path) -> Template` — an asset path)
        plus ordered `patches` layered over it (ref: scene_patch.rs
        patch-over-patch composition).

        {"inherit": "base.bsn.json",
         "patches": [{"components": {...}}, ...],
         "components": {...}, "children": [...], "name": "..."}
        """
        base = doc.get("inherit")
        if base is not None:
            if isinstance(base, Template):
                tpl = base
            elif isinstance(base, dict):
                tpl = cls.from_dict(base, resolver)
            else:
                if resolver is None:
                    raise ValueError(
                        f"template inherits {base!r} but no resolver given")
                tpl = resolver(str(base))
        else:
            tpl = cls()
        layers = list(doc.get("patches", ()))
        own = {k: doc[k] for k in ("components", "children", "name")
               if k in doc}
        if own:
            layers.append(own)
        for layer in layers:
            comps = [_decode_instance(n, f)
                     for n, f in layer.get("components", {}).items()]
            children = None
            if "children" in layer:
                children = [_decode_child(c, resolver)
                            for c in layer["children"]]
            tpl = tpl.patch(*comps, children=children,
                            name=layer.get("name"))
        return tpl


def _encode_value(v):
    import numpy as np
    if isinstance(v, AssetRef):
        return f"asset:{v.path}"
    if isinstance(v, (int, float, bool, str)) or v is None:
        return v
    return np.asarray(v).tolist()


def _decode_instance(name: str, fields: dict) -> ComponentInstance:
    from bevy_tpu.ecs.component import _REGISTRY
    spec = None
    for cls, s in _REGISTRY.items():
        if s.name == name or cls.__name__ == name:
            spec = s
            break
    if spec is None:
        raise KeyError(f"unknown component '{name}' in template")
    return ComponentInstance(spec, dict(fields))


def _decode_child(c, resolver):
    if isinstance(c, dict) and set(c) <= {"ref"}:
        return AssetRef(c["ref"])
    return Template.from_dict(c, resolver)


def _is_asset_field(v):
    return isinstance(v, AssetRef) or \
        (isinstance(v, str) and v.startswith("asset:"))


def _server_of(world, ctx):
    if ctx and "assets" in ctx:
        return ctx["assets"]
    app = getattr(world, "_app", None)
    server = getattr(app, "assets", None)
    if server is None:
        raise RuntimeError(
            "template references assets but no AssetServer is available "
            "(pass ctx={'assets': server} or add AssetPlugin)")
    return server


def _resolve_field(v, world, ctx):
    """Field-level asset value: load `asset:path#label`, return the
    (labeled) loaded value (ref: handle fields in resolved BSN;
    `#label` sub-asset addressing is the AssetServer's)."""
    path = v.path if isinstance(v, AssetRef) else v[len("asset:"):]
    return _server_of(world, ctx).load_sync(path)


def _spawn_asset_child(ref: AssetRef, world, parent_row, ctx):
    """Child-level asset reference: spawn the loaded asset's scene under
    the parent (Template → recursive spawn; GltfDocument → Mesh3d nodes
    via the ctx plugin; world snapshots → load_world + reparent)."""
    from bevy_tpu.transform import set_parent

    server = _server_of(world, ctx)
    val = server.load_sync(ref.path)
    if isinstance(val, Template):
        val.spawn(world, parent=parent_row, ctx=ctx)
        return
    from bevy_tpu.gltf import GltfDocument
    if isinstance(val, GltfDocument):
        plugin = (ctx or {}).get("mesh3d_plugin")
        if plugin is None:
            raise RuntimeError(
                f"template child {ref.path!r} is a glTF document — pass "
                "ctx={'mesh3d_plugin': plugin, 'atlas': atlas} to spawn it")
        rows = val.spawn(world, plugin, atlas=(ctx or {}).get("atlas"))
        for r in rows or ():
            rr = r.index if hasattr(r, "index") else r
            set_parent(world, rr, parent_row)
        return
    if isinstance(val, dict) and "entities" in val:
        from bevy_tpu.scene import load_world
        mapping = load_world(world, val)
        for ent in mapping.values():
            set_parent(world, ent.index, parent_row)
        return
    raise TypeError(
        f"template child {ref.path!r} loaded as {type(val).__name__}, "
        "which is not spawnable")


def load_bsn(server, path: str) -> Template:
    """Load a `.bsn.json` template through the AssetServer, resolving
    `inherit`/`ref` paths through the SAME server (nested template
    references — ref: bsn asset-path auto-resolution)."""
    return server.load_sync(path)


def _load_bsn_bytes(data: bytes, server) -> Template:
    import json
    doc = json.loads(data.decode("utf-8"))

    def resolver(p):
        # nested template refs parse IN-THREAD (a pool-blocking
        # load_sync inside a pooled load could exhaust the worker pool
        # on deep inherit chains); non-template assets go through the
        # normal pooled path at spawn time instead.
        if str(p).endswith(".bsn.json"):
            local, _ = server._read_source(p)
            return _load_bsn_bytes(local.read_bytes(), server)
        return server.load_sync(p)

    return Template.from_dict(doc, resolver=resolver)


def register_bsn_loader(server):
    """Register the `.bsn.json` loader on an AssetServer (done by
    AssetPlugin). Plain `.json` keeps its raw-dict loader."""
    import json
    prev = server.loaders.get(".json")

    def load(path):
        if str(path).endswith(".bsn.json"):
            return _load_bsn_bytes(path.read_bytes(), server)
        if prev is not None:
            return prev(path)
        return json.loads(path.read_text())

    server.register_loader(".json", load)
    return load
