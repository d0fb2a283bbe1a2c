"""Accessibility tree + auto exposure (ref models: bevy_a11y AccessKit
tree; bevy_post_process auto_exposure metering/adaptation)."""

import numpy as np


def _ui_app():
    from bevy_tpu import App
    from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
    from bevy_tpu.input import InputPlugin
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle
    from bevy_tpu.ui import Style, UiPlugin

    app = App(capacity=128)
    ui = UiPlugin(width=320, height=240)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=320, height=240), SpritePlugin(), ui)
    app.world.spawn(Camera2d(), *transform_bundle())
    root = ui.spawn_node(app.world, Style(width=320, height=240))
    return app, ui, root


def test_access_tree_roles_and_state():
    from bevy_tpu.a11y import access_tree, set_access
    from bevy_tpu.ui import Style

    app, ui, root = _ui_app()
    b = ui.button(app.world, Style(width=80, height=30), parent=root)
    c = ui.checkbox(app.world, Style(width=20, height=20), parent=root,
                    checked=True)
    s = ui.slider(app.world, Style(width=100, height=16), parent=root,
                  value=0.25)
    set_access(ui, b, label="Play")
    set_access(ui, root, role="dialog", label="Main menu")
    app.update(dt=1 / 60)

    tree = access_tree(app)
    assert len(tree) == 1
    rootd = tree[0]
    assert rootd["role"] == "dialog" and rootd["label"] == "Main menu"
    by_row = {n["row"]: n for n in rootd["children"]}
    assert by_row[b]["role"] == "button" and by_row[b]["label"] == "Play"
    assert by_row[c]["role"] == "checkbox" and by_row[c]["checked"] is True
    assert by_row[s]["role"] == "slider"
    assert abs(by_row[s]["value"] - 0.25) < 1e-5
    assert "rect" in by_row[b] and len(by_row[b]["rect"]) == 4


def test_auto_exposure_brightens_dark_scene():
    from bevy_tpu import App
    from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
    from bevy_tpu.render.post import AutoExposurePlugin
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.render.sprite import Sprite
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    def build(auto):
        app = App(capacity=16)
        plugins = [TimePlugin(), TransformPlugin(),
                   RenderPlugin(width=64, height=64), SpritePlugin()]
        if auto:
            plugins.append(AutoExposurePlugin())
        app.add_plugins(*plugins)
        from bevy_tpu.render.plugin import ClearColor
        app.insert_resource(ClearColor(color=(0.02, 0.02, 0.02, 1.0)))
        app.world.spawn(Camera2d(), *transform_bundle())
        app.world.spawn(Sprite(size=(40, 40), color=(0.06, 0.05, 0.04, 1)),
                        *transform_bundle())
        return app

    base = build(False)
    base.update(dt=1 / 60)
    dark = frame_image(base).astype(float)

    app = build(True)
    for _ in range(40):                       # let adaptation converge
        app.update(dt=1 / 10)
    bright = frame_image(app).astype(float)
    assert bright[32, 32, :3].mean() > dark[32, 32, :3].mean() + 30


def test_auto_exposure_adapts_gradually():
    import jax.numpy as jnp

    from bevy_tpu import App
    from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
    from bevy_tpu.render.post import AutoExposurePlugin
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=32, height=32),
                    SpritePlugin(), AutoExposurePlugin())
    from bevy_tpu.render.plugin import ClearColor
    app.insert_resource(ClearColor(color=(0.01, 0.01, 0.01, 1.0)))
    app.world.spawn(Camera2d(), *transform_bundle())
    app.update(dt=1 / 60)
    ev1 = float(app.world.resource("auto_exposure_state").ev)
    app.update(dt=1 / 60)
    ev2 = float(app.world.resource("auto_exposure_state").ev)
    # first frame snaps to metered EV; later frames stay near it
    assert ev1 > 1.0                       # dark scene wants positive EV
    assert abs(ev2 - ev1) < 1.5
