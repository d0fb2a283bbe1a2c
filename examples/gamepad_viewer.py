"""Gamepad viewer (reference twin: examples/tools/gamepad_viewer.rs —
visualize live gamepad state; headless: inject device state and dump
the resolved button/axis view each frame)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

from bevy_tpu import App
from bevy_tpu.input import InputPlugin
from bevy_tpu.time import TimePlugin

SOUTH, EAST, WEST, NORTH = 0, 1, 2, 3
AX_LX, AX_LY = 0, 1


def build_app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin(), InputPlugin())
    return app


def main():
    app = build_app()
    # a host gamepad driver would write these between frames
    app.input.set_gamepad_button(SOUTH, True)
    app.input.set_axis(AX_LX, 0.7)
    app.input.set_axis(AX_LY, 0.6)
    app.update(dt=1 / 60)
    st = app.world.state["res"]["gamepad"] \
        if "gamepad" in app.world.state["res"] else \
        app.world.state["res"].get("input")
    # dump the viewer panel: pressed buttons + stick vector
    buttons = np.asarray(app.input.gamepad_buttons[:8])
    axes = np.asarray(app.input.gamepad_axes[:2])
    names = ["south", "east", "west", "north",
             "l1", "r1", "select", "start"]
    pressed = [n for n, b in zip(names, buttons) if b]
    print(f"pressed: {pressed}  left stick: ({axes[0]:.1f}, "
          f"{axes[1]:.1f})")
    app.input.rumble(strength=0.8, duration=0.2)
    print("rumble queued:", app.input.pending_rumble)


if __name__ == "__main__":
    main()
