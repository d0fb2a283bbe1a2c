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
