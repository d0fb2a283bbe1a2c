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

    def spawn(self, world, parent: Optional[int] = None):
        """Instantiate into `world`; returns the root Entity. Children
        spawn recursively with ChildOf links (ref: SpawnScene +
        Spawn/SpawnRelated bundles)."""
        from bevy_tpu.transform import set_parent

        comps = [ComponentInstance(i.spec, dict(i.values))
                 for i in self.components.values()]
        e = world.spawn(*comps)
        row = e.index if hasattr(e, "index") else e
        if parent is not None:
            set_parent(world, row, parent)
        for child in self.children:
            child.spawn(world, parent=row)
        return e
