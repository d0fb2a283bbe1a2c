"""Two-phase occlusion culling (ref model: bevy meshlet two-pass cull +
bevy_render occlusion_culling): the culled image must match the
uncull-everything image once the visibility mask converges."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(occlusion, frames=3, n=120):
    app = App(capacity=256)
    plugin = Mesh3dPlugin(backend="pallas_interpret",
                          occlusion_cull=occlusion, phase_budget=512)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=96), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 14.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    rng = np.random.RandomState(0)
    # a big near wall occluding most of a far cube field
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.3, 0.5, 0.8, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, 6.0),
                                      scale=(6.0, 4.0, 0.5)))
    for i in range(n):
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=tuple(
                            rng.uniform(0.2, 1.0, 3)) + (1.0,)),
                        *transform_bundle(translation=(
                            rng.uniform(-12, 12), rng.uniform(-7, 7),
                            rng.uniform(-12, 0))))
    imgs = []
    for _ in range(frames):
        app.update(dt=1 / 60)
        imgs.append(frame_image(app).astype(int))
    return imgs, app


def test_occlusion_image_matches_unculled():
    culled, app = _scene(True)
    unculled, _ = _scene(False)
    # frame 1 starts all-visible, later frames use the converged mask —
    # every frame must match the unculled render
    for i, (a, b) in enumerate(zip(culled, unculled)):
        frac = (np.abs(a - b).max(-1) > 8).mean()
        assert frac < 0.002, f"frame {i}: {frac:.3%} pixels differ"


def test_occlusion_mask_shrinks():
    culled, app = _scene(True, frames=4)
    import jax
    vis = app.world.state["res"]["mesh_vis"]
    mask = jax.device_get(vis["g0v0"])
    # the wall hides a chunk of the far field: mask must be a strict
    # subset of everything after convergence
    assert 0 < mask.sum() < mask.shape[0]
