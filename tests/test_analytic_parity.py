"""Analytic reference parity (VERDICT r2 #10): closed-form scenes where
the EXPECTED image is computed, not recorded — catching sRGB-encode,
blend-space, raster-fill-rule, and projection drift that self-generated
goldens cannot (they would drift along with the bug).

Ref model: the screenshot-diff CI of the reference
(.github/workflows/example-run.yml:49-160) — replaced here by
mathematical expectations since actual bevy renders cannot be produced
in this environment (tests/goldens/reference/README.md)."""

import numpy as np
import pytest

from bevy_tpu import App
from bevy_tpu.color import srgba
from bevy_tpu.render import (Camera2d, ClearColor, RenderPlugin, Sprite,
                             SpritePlugin)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle

W, H = 128, 64


def _linear_to_srgb_u8(img):
    """The exact swapchain encode (bevy_tpu.color.linear_to_srgb twin,
    recomputed independently in numpy)."""
    x = np.clip(img, 0.0, 1.0)
    lo = x * 12.92
    hi = 1.055 * np.power(np.maximum(x, 1e-12), 1.0 / 2.4) - 0.055
    rgb = np.where(x <= 0.0031308, lo, hi)
    return np.round(rgb * 255.0).astype(np.uint8)


def _app2d(clear, backend="xla"):
    app = App(capacity=256)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=W, height=H),
                    SpritePlugin(backend=backend))
    app.insert_resource(ClearColor(color=tuple(np.asarray(clear))))
    app.world.spawn(Camera2d(), *transform_bundle())
    return app


def test_clear_color_srgb_encode_exact():
    """Background pixels must be the clear color through the analytic
    sRGB encode — catches encode-curve or double-encode drift."""
    clear_srgb = (0.25, 0.5, 0.75)
    clear_lin = np.asarray(srgba(*clear_srgb))[:3]
    app = _app2d(np.asarray(srgba(*clear_srgb)))
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    expect = _linear_to_srgb_u8(clear_lin[None, None, :])
    assert np.all(np.abs(img[..., :3].astype(int) - expect.astype(int)) <= 1)
    # and the encode must invert to the sRGB value the user asked for
    assert np.all(np.abs(img[0, 0, :3] / 255.0 - np.asarray(clear_srgb))
                  < 0.01)


def test_checkerboard_sprite_grid_raster_rules():
    """8x4 checkerboard of 16px solid sprites at exact pixel positions:
    the full expected image is computed in numpy. Catches raster
    fill-rule (pixel-center coverage) and placement drift."""
    red = np.asarray([0.8, 0.1, 0.1, 1.0], np.float32)
    blue = np.asarray([0.1, 0.2, 0.9, 1.0], np.float32)
    clear = np.asarray([0.0, 0.0, 0.0, 1.0], np.float32)
    app = _app2d(clear)
    cell = 16
    for gy in range(H // cell):
        for gx in range(W // cell):
            color = red if (gx + gy) % 2 == 0 else blue
            # world coords: screen_x = W/2 + wx, screen_y = H/2 - wy
            cx = (gx + 0.5) * cell - W / 2
            cy = H / 2 - (gy + 0.5) * cell
            app.world.spawn(
                Sprite(size=(cell, cell), color=tuple(color),
                       tex=-1),
                *transform_bundle(translation=(cx, cy, 0.0)))
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))

    expect_lin = np.zeros((H, W, 3), np.float32)
    for gy in range(H // cell):
        for gx in range(W // cell):
            color = red if (gx + gy) % 2 == 0 else blue
            expect_lin[gy * cell:(gy + 1) * cell,
                       gx * cell:(gx + 1) * cell] = color[:3]
    expect = _linear_to_srgb_u8(expect_lin)
    diff = np.abs(img[..., :3].astype(int) - expect.astype(int))
    assert diff.max() <= 1, f"max channel delta {diff.max()}"


def test_alpha_blend_happens_in_linear_space():
    """A 50%-alpha white sprite over mid-gray: the blend must happen in
    LINEAR space, then encode — blending after encode (a classic
    pipeline bug) yields a visibly different value this test rejects."""
    gray_lin = np.asarray([0.2, 0.2, 0.2, 1.0], np.float32)
    app = _app2d(gray_lin)
    app.world.spawn(Sprite(size=(32, 32), color=(1.0, 1.0, 1.0, 0.5),
                           tex=-1),
                    *transform_bundle(translation=(0.0, 0.0, 0.0)))
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    blended_lin = 0.5 * 1.0 + 0.5 * 0.2          # linear-space over
    expect = int(_linear_to_srgb_u8(np.asarray([[blended_lin]]))[0, 0])
    got = int(img[H // 2, W // 2, 0])
    assert abs(got - expect) <= 1
    # the wrong-space result would be ~0.5*encode(1)+0.5*encode(0.2)
    wrong = int(0.5 * 255 + 0.5 * float(
        _linear_to_srgb_u8(np.asarray([[0.2]]))[0, 0]))
    assert abs(got - wrong) > 6


def test_perspective_cube_silhouette_analytic():
    """Unit cube at known pose under the default perspective camera:
    the front-face silhouette's pixel bbox must match the projection
    math within 1.5 px per edge (catches projection/viewport drift),
    and the face must shade uniformly (flat path correctness)."""
    from bevy_tpu.render.camera import Camera3d
    from bevy_tpu.render.mesh import cuboid
    from bevy_tpu.render.mesh3d import (DirectionalLight, Mesh3d,
                                        Mesh3dPlugin, MeshMaterial)

    w3, h3 = 128, 128
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="xla")
    cube_id = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=w3, height=h3), plugin)
    app.world.spawn(Mesh3d(mesh=cube_id),
                    MeshMaterial(base_color=(0.7, 0.2, 0.2, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, 0.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle())
    d = 3.0
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, d)))
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))

    # projection: front face at z_view = -(d - 0.5); half-extent 0.5
    # screen half-size = 0.5 * f / z * (h/2) with f = 1/tan(fov/2)
    f = 1.0 / np.tan(0.7853981634 / 2)
    half_px = 0.5 * f / (d - 0.5) * (h3 / 2)
    bg = img[2, 2, :3]
    mask = np.any(np.abs(img[..., :3].astype(int) - bg.astype(int)) > 8,
                  axis=-1)
    assert mask.any(), "cube not rendered"
    ys, xs = np.nonzero(mask)
    cx, cy = w3 / 2, h3 / 2
    for lo, hi, c in ((xs.min(), xs.max(), cx), (ys.min(), ys.max(), cy)):
        assert abs((c - lo) - half_px) <= 1.5, (lo, hi, half_px)
        assert abs((hi + 1 - c) - half_px) <= 1.5, (lo, hi, half_px)
    # flat front face shades uniformly — up to 1% pinholes tolerated
    # (the XLA fallback can drop pixels exactly on the two-triangle
    # shared diagonal under FMA contraction; see test_near_plane notes)
    inner = img[int(cy - half_px * 0.5):int(cy + half_px * 0.5),
                int(cx - half_px * 0.5):int(cx + half_px * 0.5), :3]
    vals, counts = np.unique(inner.reshape(-1, 3), axis=0,
                             return_counts=True)
    mode = vals[counts.argmax()]
    frac_off = 1.0 - counts.max() / inner[..., 0].size
    assert frac_off <= 0.01, (mode, frac_off)
