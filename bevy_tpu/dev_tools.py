"""Dev tools (reference twin: bevy_dev_tools — FPS overlay
`src/fps_overlay.rs` and the CI testing harness `src/ci_testing/`:
frame-indexed actions driven from config).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from bevy_tpu.app.main_schedule import Update
from bevy_tpu.app.plugin import Plugin


class FpsOverlayPlugin(Plugin):
    """ref: FpsOverlayPlugin — a digit counter in the corner updated in-jit
    from the host fps measurement (entering as a frame-input channel).
    Requires RenderPlugin + SpritePlugin + FrameTimeDiagnosticsPlugin."""

    def __init__(self, digits: int = 4, size: float = 12.0):
        self.digits = digits
        self.size = size

    def build(self, app):
        from bevy_tpu.diagnostic import FrameTimeDiagnosticsPlugin
        from bevy_tpu.render.plugin import RenderPlugin
        from bevy_tpu.render.sprite import Sprite  # noqa: F401
        from bevy_tpu.render.text import (
            FontAtlas, make_digit_system, spawn_digit_counter,
        )
        from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas

        rp = next((p for p in app._plugins if isinstance(p, RenderPlugin)), None)
        if rp is None:
            raise RuntimeError("FpsOverlayPlugin requires RenderPlugin")

        # glyphs pack into the shared atlas: rebuild it including any
        # existing pixels (fresh builder if none)
        builder = getattr(app, "_atlas_builder", None)
        if builder is None:
            builder = AtlasBuilder(512, 256)
            app._atlas_builder = builder
        font = FontAtlas(builder)
        app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
        app.font = font

        def fps_value():
            store = getattr(app, "diagnostics", None)
            d = store.get(FrameTimeDiagnosticsPlugin.FPS) if store else None
            v = d.smoothed if d and d.smoothed else 0.0
            return np.float32(v)

        app.register_frame_input("fps", np.float32(0.0), fps_value)
        app.add_systems(Update, make_digit_system(font, "frame_input", "fps"))
        x = -rp.width / 2 + 8
        y = rp.height / 2 - 8
        spawn_digit_counter(app.world, font, self.digits, pos=(x, y),
                            z=100.0, color=(0.2, 1.0, 0.3, 1.0),
                            size=self.size)


class CiTestingPlugin(Plugin):
    """ref: CiTestingPlugin (ci_testing/mod.rs) — frame-indexed actions from
    a config dict or JSON file: [{"frame": N, "action": "screenshot",
    "path": ...} | {"frame": M, "action": "exit"} | {"frame": K,
    "action": "custom", "fn": callable}]."""

    def __init__(self, config=None, config_path=None):
        if config_path:
            config = json.loads(Path(config_path).read_text())
        self.actions = sorted(config or [], key=lambda a: a["frame"])

    def build(self, app):
        actions = list(self.actions)
        counter = {"n": 0}

        def tick(app_):
            counter["n"] += 1
            for a in [a for a in actions if a["frame"] == counter["n"]]:
                kind = a["action"]
                if kind == "screenshot":
                    from PIL import Image

                    from bevy_tpu.render.plugin import frame_image
                    Image.fromarray(frame_image(app_)).save(
                        a.get("path", f"screenshot-{counter['n']}.png"))
                elif kind == "exit":
                    app_._ci_exit = True
                elif kind == "custom":
                    a["fn"](app_)

        app.add_frame_hook(tick)
        app._ci_exit = False

# ----------------------------------------------------------------------
# Schedule introspection (ref: bevy_dev_tools — the schedule graph dump
# the reference exposes via bevy_mod_debugdump / Schedule::graph()).


def dump_schedule(app, label: str, dot: bool = False) -> str:
    """Human-readable (or graphviz `dot=True`) dump of one schedule:
    final execution order, system sets, host/run_if markers, explicit
    ordering edges, and detected ambiguities."""
    sched = app.schedules.get(label)
    if sched is None:
        return f"schedule '{label}': <empty>"
    order = sched.build_order()
    idx = {id(e): i for i, e in enumerate(order)}
    if dot:
        lines = [f'digraph "{label}" {{', "  rankdir=LR;"]
        for i, e in enumerate(order):
            shape = "box" if not e.system.host else "ellipse"
            extra = ' style=dashed' if e.run_if is not None else ""
            lines.append(f'  n{i} [label="{e.system.name}" '
                         f'shape={shape}{extra}];')
        for e in order:
            for t in e.after:
                for j in sched._resolve(t):
                    src = idx.get(id(sched.entries[j]))
                    if src is not None:
                        lines.append(f"  n{src} -> n{idx[id(e)]};")
            for t in e.before:
                for j in sched._resolve(t):
                    dst = idx.get(id(sched.entries[j]))
                    if dst is not None:
                        lines.append(f"  n{idx[id(e)]} -> n{dst};")
        lines.append("}")
        return "\n".join(lines)
    lines = [f"schedule '{label}' ({len(order)} systems):"]
    for i, e in enumerate(order):
        tags = []
        if e.system.host:
            tags.append("host")
        if e.run_if is not None:
            tags.append(f"run_if={e.run_if.name}")
        if e.sets:
            tags.append("sets=" + ",".join(str(s) for s in e.sets))
        suffix = ("  [" + " ".join(tags) + "]") if tags else ""
        lines.append(f"  {i:3d}. {e.system.name}{suffix}")
    if sched.ambiguities:
        lines.append(f"  ambiguities ({len(sched.ambiguities)}):")
        for a, b, conflict in sched.ambiguities:
            lines.append(f"    {a} <-> {b} on {sorted(conflict)}")
    return "\n".join(lines)


def dump_schedules(app) -> str:
    """Dump every non-empty schedule in the app, in label order."""
    parts = [dump_schedule(app, label)
             for label in app.schedules
             if app.schedules[label].entries]
    return "\n\n".join(parts)


class FrameTimeGraphPlugin(Plugin):
    """ref: bevy_dev_tools src/frame_time_graph/ — a live bar graph of
    recent frame times. Host feeds a ring of the last N dt samples
    through a frame-input channel; an in-jit system draws the curve with
    gizmos (green at/below target, toward red above)."""

    def __init__(self, samples: int = 64, width: float = 128.0,
                 height: float = 36.0, target_ms: float = 16.7,
                 corner=(8.0, 8.0)):
        self.samples = samples
        self.width = width
        self.height = height
        self.target_ms = target_ms
        self.corner = corner

    def build(self, app):
        import jax.numpy as jnp

        from bevy_tpu.ecs.query import Res
        from bevy_tpu.ecs.system import system
        from bevy_tpu.render.gizmos import Gizmos
        from bevy_tpu.render.plugin import RenderPlugin

        rp = next(p for p in app._plugins if isinstance(p, RenderPlugin))
        n = self.samples
        gw, gh, target = self.width, self.height, self.target_ms
        x0 = -rp.out_width / 2 + self.corner[0]
        y0 = rp.out_height / 2 - self.corner[1] - gh

        ring = {"buf": np.zeros(n, np.float32), "i": 0}

        def feed():
            dt = getattr(app, "last_dt", 1 / 60) or 1 / 60
            ring["buf"][ring["i"] % n] = dt * 1000.0
            ring["i"] += 1
            i = ring["i"] % n
            return np.concatenate([ring["buf"][i:], ring["buf"][:i]])

        app.register_frame_input("frame_times_ms", np.zeros(n, np.float32),
                                 feed)

        @system(name="frame_time_graph")
        def frame_time_graph(fin=Res("frame_input"),
                             g=Gizmos(budget=4 * n)):
            ms = fin.frame_times_ms
            ceil = jnp.maximum(jnp.max(ms), target * 2.0)
            ys = y0 + jnp.clip(ms / ceil, 0.0, 1.0) * gh
            xs = x0 + jnp.arange(n, dtype=jnp.float32) * (gw / (n - 1))
            pts = jnp.stack([xs, ys], 1)
            hot = jnp.clip(jnp.mean(ms) / target - 1.0, 0.0, 1.0)
            col = (0.3 + 0.7 * hot, 1.0 - 0.8 * hot, 0.2, 0.9)
            g.linestrip_2d(pts, col, 1.0)
            ty = y0 + jnp.clip(target / ceil, 0.0, 1.0) * gh
            g.line_2d(jnp.stack([jnp.asarray(x0), ty]),
                      jnp.stack([jnp.asarray(x0 + gw), ty]),
                      (1.0, 1.0, 1.0, 0.4), 1.0)

        app.add_systems(Update, frame_time_graph)
