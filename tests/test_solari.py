"""Realtime ReSTIR DI (ref model: bevy_solari realtime — restir.wesl
reservoir resampling + presample_light_tiles.wesl). Validation: the
temporally-converged ReSTIR estimate must match the analytic deferred
point-light shade (same Cook-Torrance model), and the single selected
shadow ray must darken occluded pixels (the payoff the deferred binned
kernel cannot produce)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
from bevy_tpu.render.mesh import cuboid, uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.solari import SolariPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _spawn_scene(app, plugin, blocker=False):
    sphere = plugin.add_mesh(uv_sphere(0.9, 24, 16))
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.insert_resource(AmbientLight(brightness=0.05))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    for lpos, col in (((1.5, 1.0, 2.0), (1.0, 0.9, 0.8)),
                      ((-1.5, -0.5, 2.0), (0.4, 0.5, 1.0)),
                      ((0.0, 2.0, 1.0), (0.9, 0.4, 0.3))):
        app.world.spawn(PointLight(intensity=12.0, range=30.0, color=col),
                        *transform_bundle(translation=lpos))
    app.world.spawn(
        Mesh3d(mesh=sphere),
        MeshMaterial(base_color=(0.7, 0.7, 0.7, 1.0),
                     perceptual_roughness=0.5),
        *transform_bundle())
    if blocker:
        # a plate between the first light and the sphere's upper right
        app.world.spawn(
            Mesh3d(mesh=cube),
            MeshMaterial(base_color=(0.2, 0.2, 0.2, 1.0)),
            *transform_bundle(translation=(1.1, 0.8, 1.3),
                              scale=(0.8, 0.8, 0.05)))


def _restir_frames(n_frames, shadow=False, blocker=False):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=96, height=72), plugin,
                    SolariPlugin(plugin, candidates=6, presample_k=16,
                                 shadow_rays=shadow))
    _spawn_scene(app, plugin, blocker=blocker)
    acc = None
    for _ in range(n_frames):
        app.update(dt=1 / 60)
        img = frame_image(app).astype(np.float64)
        acc = img if acc is None else acc + img
    return acc / n_frames


def _deferred_reference(blocker=False):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=96, height=72), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret"))
    _spawn_scene(app, plugin, blocker=blocker)
    app.update(dt=1 / 60)
    return frame_image(app).astype(np.float64)


def test_restir_converges_to_deferred():
    """Unshadowed ReSTIR, averaged over frames (temporal reuse makes
    per-frame output already low-variance), matches the analytic binned
    deferred shade on the geometry pixels."""
    ref = _deferred_reference()
    est = _restir_frames(12)
    geom = ref[..., 3] > 128
    diff = np.abs(est - ref)[..., :3].max(-1)
    # mean error small; allow a few noisy pixels
    assert diff[geom].mean() < 10.0, diff[geom].mean()
    assert (diff[geom] > 40).mean() < 0.05, (diff[geom] > 40).mean()


def test_restir_shadow_ray_darkens_occluded():
    """With shadow_rays=True, a blocker plate must darken the sphere
    region facing the blocked light vs the unshadowed estimate."""
    lit = _restir_frames(8, shadow=False, blocker=True)
    sh = _restir_frames(8, shadow=True, blocker=True)
    # upper-right sphere quadrant faces the first light through the plate
    reg_l = lit[20:36, 52:68, :3].sum()
    reg_s = sh[20:36, 52:68, :3].sum()
    assert reg_s < reg_l * 0.9, (reg_s, reg_l)


def test_restir_gi_color_bleed():
    """One-bounce ReSTIR GI (ref: bevy_solari realtime restir_gi.wesl):
    a red wall beside a white floor under a point light must bleed red
    onto nearby floor pixels — absent in the DI-only render — and the
    temporal reservoir must keep the indirect term stable."""
    def build(gi):
        app = App(capacity=32)
        plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
        app.add_plugins(TimePlugin(), TransformPlugin(),
                        RenderPlugin(width=64, height=48), plugin,
                        SolariPlugin(plugin, candidates=4, presample_k=8,
                                     gi=gi))
        cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
        app.insert_resource(AmbientLight(brightness=0.0))
        # camera tilted down at the floor/wall corner
        app.world.spawn(Camera3d(),
                        *transform_bundle(translation=(0.0, 2.2, 3.4),
                                          rotation=(-0.26, 0.0, 0.0,
                                                    0.966)))
        app.world.spawn(PointLight(intensity=6.0, range=50.0,
                                   color=(1.0, 1.0, 1.0)),
                        *transform_bundle(translation=(-1.0, 2.5, 1.0)))
        # white floor (thin slab)
        app.world.spawn(
            Mesh3d(mesh=cube),
            MeshMaterial(base_color=(0.9, 0.9, 0.9, 1.0),
                         perceptual_roughness=0.9),
            *transform_bundle(translation=(0.0, -0.1, 0.0),
                              scale=(6.0, 0.2, 6.0)))
        # red wall on the right, lit by the light, bounces onto floor
        app.world.spawn(
            Mesh3d(mesh=cube),
            MeshMaterial(base_color=(0.9, 0.05, 0.05, 1.0),
                         perceptual_roughness=0.9),
            *transform_bundle(translation=(1.6, 1.0, 0.0),
                              scale=(0.2, 2.0, 6.0)))
        return app

    def run(gi, frames):
        app = build(gi)
        acc = None
        for _ in range(frames):
            app.update(dt=1 / 60)
            img = frame_image(app).astype(np.float64)
            acc = img if acc is None else acc + img
        return acc / frames

    di_only = run(False, 1)
    with_gi = run(True, 5)
    # floor strip next to the red wall (measured: DI redness == 0 here,
    # GI redness 2-9 growing toward the wall)
    strip = (slice(28, 44), slice(32, 56))
    redness_di = (di_only[strip][..., 0] - di_only[strip][..., 1]).mean()
    redness_gi = (with_gi[strip][..., 0] - with_gi[strip][..., 1]).mean()
    assert redness_gi > redness_di + 1.5, (redness_di, redness_gi)
    # GI must add energy, not replace the direct term
    assert with_gi[strip][..., 0].mean() > di_only[strip][..., 0].mean()
