"""ECS/app-category example smoke runs (ref model: the reference CI's
example-run job). These examples are host-logic + tiny jits, so they
live in the smoke tier; render-heavy examples stay in
test_examples_smoke.py (full tier)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


APP_EXAMPLES = [
    "change_detection", "iter_combinations", "generic_system",
    "system_piping", "states", "sub_states", "timers",
    "keyboard_modifiers", "eased_motion", "headless", "hello_world",
    "plugin_group", "dynamic_components", "system_stepping",
    "custom_diagnostic", "parenting", "logs", "async_compute",
    "loading_screen", "virtual_time",
]

HOST_EXAMPLES = ["serialization", "function_reflection", "soundtrack",
                 "pitch", "custom_asset", "bounding_2d",
                 "viewport_to_world", "reflection",
                 # round-5: app/ecs/audio/asset/movement additions
                 "fallible_systems", "entity_disabling", "custom_loop",
                 "return_after_run", "embedded_asset",
                 "spatial_audio_2d", "spatial_audio_3d",
                 "play_sound_effect", "decodable", "smooth_follow",
                 "physics_in_fixed_timestep", "gpu_readback",
                 "cooldown", "character_creation", "low_power",
                 "gamepad_viewer", "animated_transform",
                 "many_components"]


@pytest.mark.parametrize("name", APP_EXAMPLES)
def test_ecs_example_updates(name):
    import importlib

    mod = importlib.import_module(name)
    app = mod.build_app()
    for _ in range(3):
        app.update(dt=1 / 60)


@pytest.mark.parametrize("name", HOST_EXAMPLES)
def test_host_example_main(name, capsys):
    import importlib

    mod = importlib.import_module(name)
    mod.main()
    assert capsys.readouterr().out.strip()
