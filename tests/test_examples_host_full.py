"""Render-heavy host examples — FULL tier (these compile 3D frames;
the smoke tier is the bounded host-logic core, see conftest.py)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

HEAVY_HOST = ["alter_mesh", "alter_sprite", "debug_frustum_culling",
              "transform_hierarchy", "window_settings"]


@pytest.mark.parametrize("name", HEAVY_HOST)
def test_heavy_host_example_main(name, capsys):
    import importlib

    mod = importlib.import_module(name)
    mod.main()
    assert capsys.readouterr().out.strip()


def test_alien_cake_addict_plays():
    """The complete 3D game: scripted cake-chasing must score (ref:
    examples/showcase/alien_cake_addict.rs)."""
    import importlib

    mod = importlib.import_module("alien_cake_addict")
    app = mod.build_app(width=128, height=80)
    g = app._game
    from bevy_tpu.input import KeyCode
    for f in range(200):
        for k in (KeyCode.ArrowUp, KeyCode.ArrowDown,
                  KeyCode.ArrowLeft, KeyCode.ArrowRight):
            app.input.release(k)
        if g["cake"] is not None:
            if g["cake_i"] > g["i"]:
                app.input.press(KeyCode.ArrowRight)
            elif g["cake_i"] < g["i"]:
                app.input.press(KeyCode.ArrowLeft)
            elif g["cake_j"] > g["j"]:
                app.input.press(KeyCode.ArrowDown)
            elif g["cake_j"] < g["j"]:
                app.input.press(KeyCode.ArrowUp)
        app.update(dt=1 / 60)
    assert g["score"] > 0, "never ate a cake"
