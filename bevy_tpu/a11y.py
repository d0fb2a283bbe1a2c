"""Accessibility (reference twin: bevy_a11y — AccessKit integration,
`src/lib.rs:12-35` `AccessibilityNode` component + the tree the winit
backend pushes to the OS; bevy_ui/src/accessibility.rs syncs widget
state into it).

TPU form: the UI tree is host-side structure (layout never runs on
device), so the accessibility tree is a pure host walk. `set_access`
annotates nodes with role/label; `access_tree` exports the current
tree — roles, labels, layout rects, focus, and live widget state
(checked / slider value read back from device columns) — as plain
dicts, the shape a platform bridge (AccessKit, ARIA) consumes.
"""

from __future__ import annotations

ROLE_BUTTON = "button"
ROLE_CHECKBOX = "checkbox"
ROLE_RADIO = "radio"
ROLE_SLIDER = "slider"
ROLE_SCROLL = "scroll-area"
ROLE_TEXT_INPUT = "text-input"
ROLE_NODE = "generic"


def set_access(ui, row: int, role: str | None = None,
               label: str | None = None, description: str | None = None):
    """Annotate a UI node (ref: AccessibilityNode component)."""
    store = getattr(ui, "_access", None)
    if store is None:
        store = ui._access = {}
    entry = store.setdefault(row, {})
    if role is not None:
        entry["role"] = role
    if label is not None:
        entry["label"] = label
    if description is not None:
        entry["description"] = description


def _infer_role(app, ui, row):
    from bevy_tpu.ui import Checked, ScrollPosition, SliderValue, TextInputSlot

    world = app.world
    if world.has(row, Checked):
        group = int(world.get(row, Checked).group)
        return ROLE_RADIO if group >= 0 else ROLE_CHECKBOX
    if world.has(row, SliderValue):
        return ROLE_SLIDER
    if world.has(row, ScrollPosition):
        return ROLE_SCROLL
    if any(ti.get("row") == row for ti in getattr(ui, "_text_inputs", [])):
        return ROLE_TEXT_INPUT
    if row in getattr(ui, "focusables", []):
        return ROLE_BUTTON
    return ROLE_NODE


def _node_dict(app, ui, node):
    from bevy_tpu.ui import Checked, SliderValue

    row = node.row
    meta = getattr(ui, "_access", {}).get(row, {})
    role = meta.get("role") or _infer_role(app, ui, row)
    out = {"row": row, "role": role}
    if "label" in meta:
        out["label"] = meta["label"]
    if "description" in meta:
        out["description"] = meta["description"]
    rect = ui._rects.get(row)
    if rect is not None:
        out["rect"] = [float(v) for v in rect]
    if ui.focused_row == row:
        out["focused"] = True
    world = app.world
    if role in (ROLE_CHECKBOX, ROLE_RADIO) and world.has(row, Checked):
        out["checked"] = bool(int(world.get(row, Checked).value))
    if role == ROLE_SLIDER and world.has(row, SliderValue):
        out["value"] = float(world.get(row, SliderValue).value)
    if role == ROLE_TEXT_INPUT:
        for ti in getattr(ui, "_text_inputs", []):
            if ti.get("row") == row:
                out["value"] = ti["value"]
    kids = [_node_dict(app, ui, c) for c in node.children]
    if kids:
        out["children"] = kids
    return out


def access_tree(app):
    """Export the full accessibility tree (list of root nodes)."""
    ui = getattr(app, "ui", None)
    if ui is None:
        return []
    return [_node_dict(app, ui, root) for root in ui.roots]
