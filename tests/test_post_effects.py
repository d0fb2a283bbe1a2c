"""Post-processing effects (ref models: bevy_post_process dof/motion_blur,
bevy_pbr ssao, bevy_anti_alias fxaa/taa/cas behavior)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.post import (
    CasPlugin, ChromaticAberrationPlugin, DepthOfFieldPlugin, FxaaPlugin,
    MotionBlurPlugin, SsaoPlugin, TaaPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


def _app(*post_plugins, cubes=((0.0, 0.0, -4.0), (0.6, 0.2, -9.0))):
    app = App(capacity=32)
    plugin = Mesh3dPlugin()
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=120), plugin,
                    *post_plugins)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    for i, t in enumerate(cubes):
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.7, 0.6, 1.0)),
                        *transform_bundle(translation=t))
    return app


def _gradient_energy(img):
    g = img[..., :3].astype(np.float32).sum(-1)
    return np.abs(np.diff(g, axis=0)).mean() + \
        np.abs(np.diff(g, axis=1)).mean()


def test_ssao_darkens():
    base = _app()
    base.update(dt=1 / 60)
    img0 = frame_image(base).astype(np.float32)
    aoed = _app(SsaoPlugin(radius=1.0, intensity=2.0))
    aoed.update(dt=1 / 60)
    img1 = frame_image(aoed).astype(np.float32)
    # AO can only darken; must darken somewhere on geometry
    assert img1[..., :3].sum() < img0[..., :3].sum()
    assert (img0[..., :3] - img1[..., :3]).max() > 5


def test_dof_blurs_out_of_focus():
    sharp = _app(DepthOfFieldPlugin(focal_distance=4.0, focal_range=2.0))
    sharp.update(dt=1 / 60)
    img = frame_image(sharp)
    nodof = _app()
    nodof.update(dt=1 / 60)
    img0 = frame_image(nodof)
    # the far cube (z=-9, out of focus) region loses edge energy
    region = (slice(0, 120), slice(80, 160))
    assert _gradient_energy(img[region]) < _gradient_energy(img0[region])


def test_taa_stable_on_static_scene():
    app = _app(TaaPlugin())
    app.update(dt=1 / 60)
    a = frame_image(app).astype(int)
    app.update(dt=1 / 60)
    b = frame_image(app).astype(int)
    app.update(dt=1 / 60)
    c = frame_image(app).astype(int)
    # static camera: TAA converges, frames stay close
    assert np.abs(b - c).max() <= 8
    assert np.isfinite(c).all()


def test_motion_blur_smears_on_camera_move():
    def drive(app):
        app.update(dt=1 / 60)
        app.world.insert(0, Transform(translation=(0.8, 0.0, 0.0)))
        app.update(dt=1 / 60)
        app.world.insert(0, Transform(translation=(1.6, 0.0, 0.0)))
        app.update(dt=1 / 60)
        return frame_image(app).astype(np.float32)

    blurred = drive(_app(MotionBlurPlugin(strength=1.0, taps=4)))
    sharp = drive(_app())
    # same camera path: the motion-blurred frame has softer edges
    assert _gradient_energy(blurred) < _gradient_energy(sharp) * 0.95


def test_chromatic_aberration_shifts_channels():
    app = _app(ChromaticAberrationPlugin(strength=6.0))
    app.update(dt=1 / 60)
    img = frame_image(app).astype(int)
    base = _app()
    base.update(dt=1 / 60)
    img0 = frame_image(base).astype(int)
    # off-center the r/b channels separate: difference fields differ
    dr = np.abs(img[..., 0] - img0[..., 0]).sum()
    dg = np.abs(img[..., 1] - img0[..., 1]).sum()
    assert dr > dg * 1.5 + 1


def test_cas_sharpens_low_contrast_detail():
    import jax.numpy as jnp
    from bevy_tpu.render.post import cas_filter
    # soft low-contrast ramp bump
    x = np.linspace(0, 16 * np.pi, 64)
    img = (0.5 + 0.08 * np.sin(x)[None, :] * np.ones((48, 1)))
    rgb = jnp.asarray(np.broadcast_to(img, (3, 48, 64)), jnp.float32)
    out = np.asarray(cas_filter(rgb, 0.8))
    g0 = np.abs(np.diff(np.asarray(rgb)[0], axis=1)).mean()
    g1 = np.abs(np.diff(out[0], axis=1)).mean()
    assert g1 > g0 * 1.05, (g0, g1)


def test_fxaa_smooths_staircase_edge():
    import jax.numpy as jnp
    from bevy_tpu.render.post import fxaa_filter
    img = np.zeros((3, 48, 64), np.float32)
    for y in range(48):
        img[:, y, : 10 + (y // 4)] = 1.0      # staircase diagonal edge
    out = np.asarray(fxaa_filter(jnp.asarray(img)))
    # stairsteps get intermediate values → fewer hard 0/1 pixels
    hard0 = np.logical_or(img[0] < 0.01, img[0] > 0.99).mean()
    hard1 = np.logical_or(out[0] < 0.01, out[0] > 0.99).mean()
    assert hard1 < hard0
    assert np.isfinite(out).all()


def test_fxaa_pass_runs_in_app():
    fx = _app(FxaaPlugin())
    fx.update(dt=1 / 60)
    img_fx = frame_image(fx).astype(int)
    base = _app()
    base.update(dt=1 / 60)
    img0 = frame_image(base).astype(int)
    changed = np.abs(img_fx - img0).max(-1) > 2
    assert changed.sum() > 50            # edges got blended
    assert not changed[0, 0]             # flat background untouched
    assert np.isfinite(img_fx).all()
