"""Text + dev-tools tests (ref models: bevy_text glyph atlas, bevy_dev_tools
fps overlay / CI harness)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, ResMut, Update, field, resource
from bevy_tpu.dev_tools import CiTestingPlugin, FpsOverlayPlugin
from bevy_tpu.diagnostic import FrameTimeDiagnosticsPlugin
from bevy_tpu.ecs.system import system
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.text import (
    FontAtlas, make_digit_system, spawn_digit_counter, spawn_text,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _base_app(w=256, h=96):
    app = App(capacity=256)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=w, height=h), SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    return app


def test_static_text_renders():
    app = _base_app()
    builder = AtlasBuilder(512, 256)
    font = FontAtlas(builder)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    spawn_text(app.world, font, "HELLO", pos=(-60.0, 10.0),
               color=(1.0, 0.2, 0.2, 1.0), size=16.0)
    app.update(dt=1 / 60)
    img = frame_image(app)
    red = (img[..., 0].astype(int) - img[..., 2].astype(int)) > 40
    assert red.sum() > 60, f"text not visible ({red.sum()} px)"


@resource
class Score:
    value = field((), jnp.float32)


def test_digit_counter_updates_in_jit():
    app = _base_app()
    builder = AtlasBuilder(512, 256)
    font = FontAtlas(builder)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.insert_resource(Score(value=0.0))

    @system
    def bump(s=ResMut(Score)):
        s.value = s.value + 7.0

    app.add_systems(Update, [bump, make_digit_system(font, "score", "value")])
    spawn_digit_counter(app.world, font, 3, pos=(-20.0, 20.0), size=14.0)
    app.update(dt=1 / 60)
    img1 = frame_image(app)
    for _ in range(9):
        app.update(dt=1 / 60)
    img2 = frame_image(app)
    assert (img1 != img2).any(), "digits frozen"
    bg = img2[2, 2, 0]
    assert (img2[..., 0] != bg).sum() > 20, "digits not visible"


def test_fps_overlay_and_ci_harness(tmp_path):
    shot = tmp_path / "frame7.png"
    app = _base_app()
    app.add_plugins(FrameTimeDiagnosticsPlugin(), FpsOverlayPlugin(),
                    CiTestingPlugin(config=[
                        {"frame": 7, "action": "screenshot", "path": str(shot)},
                        {"frame": 9, "action": "exit"},
                    ]))
    app.run(max_frames=100, dt=1 / 60)
    assert shot.exists(), "CI screenshot action did not fire"
    assert app.frame == 9, f"CI exit did not stop the loop (frame={app.frame})"
    img = np.asarray(frame_image(app))
    green = (img[..., 1].astype(int) - img[..., 0].astype(int)) > 40
    assert green.sum() > 10, "fps digits not visible"


def test_text_wrapping_and_justify():
    from bevy_tpu.render.text import wrap_lines

    assert wrap_lines("the quick brown fox", 10) == ["the quick", "brown fox"]
    assert wrap_lines("hi", 10) == ["hi"]
    assert wrap_lines("abcdefghij xy", 4) == ["abcd", "efgh", "ij", "xy"]
    assert wrap_lines("a\nb", 10) == ["a", "b"]

    import numpy as np
    import jax
    from bevy_tpu import App, World
    from bevy_tpu.render.text import FontAtlas, spawn_text
    from bevy_tpu.render.texture import AtlasBuilder
    from bevy_tpu.transform import Transform

    w = World(capacity=256)
    font = FontAtlas(AtlasBuilder(512, 256))
    rows = spawn_text(w, font, "the quick brown fox", pos=(0.0, 0.0),
                      size=8.0, max_width=80.0, justify="right")
    t = np.asarray(jax.device_get(w.column(Transform, "translation")))
    xs = sorted(t[r.index][0] for r in rows)
    ys = sorted({round(float(t[r.index][1]), 2) for r in rows})
    assert len(ys) == 2                      # wrapped to two lines
    # right-justified: the last glyph of each line ends at x = 80
    assert max(xs) == 80.0 - 4.0             # center of last 8px glyph
