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


# --- AccessKit protocol (ref: accesskit 0.24's TreeUpdate/Node/Action
#     serde shapes + the winit adapter push/pull loop) -----------------

_AK_ROLES = {
    ROLE_BUTTON: "button",
    ROLE_CHECKBOX: "checkBox",
    ROLE_RADIO: "radioButton",
    ROLE_SLIDER: "slider",
    ROLE_SCROLL: "scrollView",
    ROLE_TEXT_INPUT: "textInput",
    ROLE_NODE: "genericContainer",
}
_WINDOW_ID = 0


def _ak_node(app, ui, node, nodes):
    d = _node_dict(app, ui, node)
    nid = int(d["row"]) + 1                  # 0 is the window root
    ak = {"role": _AK_ROLES.get(d["role"], "genericContainer")}
    if "label" in d:
        ak["name"] = d["label"]
    if "description" in d:
        ak["description"] = d["description"]
    if "rect" in d:
        x, y, w, h = d["rect"]
        ak["bounds"] = {"x0": x, "y0": y, "x1": x + w, "y1": y + h}
    acts = ["focus"]
    if d["role"] in (ROLE_BUTTON, ROLE_CHECKBOX, ROLE_RADIO):
        acts.append("click")
    if d["role"] in (ROLE_SLIDER, ROLE_TEXT_INPUT):
        acts.append("setValue")
    ak["actions"] = acts
    if "checked" in d:
        ak["checked"] = "true" if d["checked"] else "false"
    if d["role"] == ROLE_SLIDER and "value" in d:
        ak["numericValue"] = d["value"]
        ak["minNumericValue"] = 0.0
        ak["maxNumericValue"] = 1.0
    if d["role"] == ROLE_TEXT_INPUT and "value" in d:
        ak["value"] = d["value"]
    kid_ids = []
    for c in node.children:
        kid_ids.append(_ak_node(app, ui, c, nodes))
    if kid_ids:
        ak["children"] = kid_ids
    nodes.append([nid, ak])
    return nid


def accesskit_update(app):
    """Full AccessKit TreeUpdate (ref: accesskit::TreeUpdate — the
    payload the winit adapter pushes to the OS a11y bus): nodes as
    [id, Node] pairs, a window root, and the focus id."""
    ui = getattr(app, "ui", None)
    nodes: list = []
    roots = []
    if ui is not None:
        for root in ui.roots:
            roots.append(_ak_node(app, ui, root, nodes))
    win = {"role": "window", "children": roots,
           "name": getattr(app, "title", "bevy_tpu app")}
    nodes.append([_WINDOW_ID, win])
    focus = _WINDOW_ID
    if ui is not None and ui.focused_row is not None:
        focus = int(ui.focused_row) + 1
    return {"nodes": nodes, "tree": {"root": _WINDOW_ID}, "focus": focus}


def perform_action(app, node_id: int, action: str, data=None):
    """Inbound AccessKit ActionRequest (ref: accesskit::ActionRequest —
    screen readers drive the UI through these): focus / click /
    setValue routed to the same host handlers user input uses."""
    ui = getattr(app, "ui", None)
    if ui is None or node_id == _WINDOW_ID:
        return False
    row = int(node_id) - 1
    if action == "focus":
        ui.focused_row = row
        for ti in getattr(ui, "_text_inputs", []):
            if ti.get("row") == row:
                ui.focus = ti["id"]
        return True
    if action == "click":
        cb = getattr(ui, "on_activate", {}).get(row)
        if cb is not None:
            cb(row)
            return True
        from bevy_tpu.ui import Checked
        cur = app.world.get(row, Checked)
        if cur is not None:
            app.world.insert(row, Checked(
                value=1 - int(cur.value), group=int(cur.group)))
            return True
        return False
    if action == "setValue":
        from bevy_tpu.ui import SliderValue
        if app.world.has(row, SliderValue):
            app.world.set_field(row, SliderValue, "value", float(data))
            return True
        for ti in getattr(ui, "_text_inputs", []):
            if ti.get("row") == row:
                ti["edit"].select_all()
                ti["edit"].insert(str(data))
                ti["value"] = ti["edit"].value
                return True
    return False
