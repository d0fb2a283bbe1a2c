"""RenderPlugin (reference twin: bevy_render RenderPlugin lib.rs:132 —
creates the RenderApp sub-world, phase sets lib.rs:158-212, render_system
renderer/mod.rs:84).

TPU design: no sub-app / render thread — extract and render trace into the
SAME jit as the sim (the reference's pipelined-rendering overlap is
recovered by XLA's async dispatch; the extract barrier becomes a pure
functional read of world columns). The framebuffer is an HBM-resident
resource; `frame_image()` is the single host readback point (the
swapchain-present position, renderer/mod.rs:100-135).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.color import image_to_srgb_u8
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.query import Res, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.render.texture import TextureAtlas


class RenderTarget:
    RESOURCE = "render_target"


@resource
class ClearColor:
    """ref: ClearColor resource (bevy_render/src/view/mod.rs); linear RGBA."""
    color = field(4, default=(0.098, 0.098, 0.133, 1.0))  # bevy's default dark grey-blue


# Render-schedule system sets, mirroring RenderSystems (lib.rs:158-212)
# and the Core3d pass order (Prepass → MainPass → PostProcess).
CLEAR_SET = "render:clear"
QUEUE_SET = "render:queue"   # extract+queue per pipeline (sprites, meshes…)
PASS_SET = "render:pass"     # 3D geometry passes (forward or G-buffer)
SHADE_SET = "render:shade"   # deferred lighting resolve
OVERLAY_SET = "render:overlay"  # transparent 2D / UI composition
POST_SET = "render:post"     # tonemap / post-process


@system(name="clear_render_target")
def clear_render_target(target=ResMut(RenderTarget.RESOURCE),
                        clear=Res(ClearColor)):
    # color is channel-planar (4, H, W) — the native TPU tile layout;
    # depth is reverse-z (clear 0, GREATER test), matching bevy/wgpu
    target.color = jnp.broadcast_to(clear.color[:, None, None],
                                    target.color.shape)
    target.depth = jnp.zeros_like(target.depth)


class RenderPlugin(Plugin):
    """width/height are static (they size the framebuffer arrays and the
    raster tile grid — the one retrace trigger for resolution change)."""

    def __init__(self, width: int = 1280, height: int = 720, ssaa: int = 1):
        # ssaa=N renders every pass at N x N subsamples per output pixel
        # and box-resolves in frame_image (ref: Msaa — the TPU form is
        # ordered-grid supersampling: same arrays, bigger grid, zero
        # kernel changes). 3D cameras reframe automatically (fov);
        # 2D cameras should set Camera2d(scale=1/N).
        self.ssaa = int(ssaa)
        self.width = width * self.ssaa
        self.height = height * self.ssaa
        self.out_width = width
        self.out_height = height

    def build(self, app):
        h, w = self.height, self.width
        app.init_resource(ClearColor())
        app.insert_resource(RenderTarget.RESOURCE, {
            "color": jnp.zeros((4, h, w), jnp.float32),
            "depth": jnp.zeros((h, w), jnp.float32),
            "size": jnp.asarray([w, h], jnp.float32),
            "ssaa": jnp.asarray(self.ssaa, jnp.int32),
        })
        if TextureAtlas.RESOURCE not in app.world.state["res"]:
            app.insert_resource(TextureAtlas.RESOURCE,
                                {"data": jnp.ones((1, 1, 4), jnp.float32)})
        sched = app.schedule(Render)
        sched.configure_set(CLEAR_SET)
        sched.configure_set(QUEUE_SET, after=CLEAR_SET)
        sched.configure_set(PASS_SET, after=[CLEAR_SET, QUEUE_SET])
        sched.configure_set(SHADE_SET, after=[CLEAR_SET, PASS_SET])
        sched.configure_set(OVERLAY_SET, after=[CLEAR_SET, PASS_SET, SHADE_SET])
        sched.configure_set(POST_SET, after=[CLEAR_SET, OVERLAY_SET])
        app.add_systems(Render, clear_render_target, in_set=CLEAR_SET)


def frame_image(app) -> np.ndarray:
    """Host readback of the framebuffer as sRGB u8 (H, W, 4) — the
    present/screenshot position (ref: screenshot.rs:83)."""
    store = app.world.state["res"][RenderTarget.RESOURCE]
    fb = store["color"]
    s = int(store.get("ssaa", 1))
    if s > 1:                      # box-filter resolve (linear space)
        _, h, w = fb.shape
        fb = fb.reshape(4, h // s, s, w // s, s).mean((2, 4))
    return np.asarray(jax.device_get(image_to_srgb_u8(fb.transpose(1, 2, 0))))
