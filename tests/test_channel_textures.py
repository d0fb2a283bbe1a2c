"""Channel textures: emissive_texture, metallic_roughness_texture,
occlusion_texture (ref: bevy_pbr StandardMaterial texture slots,
pbr_material.rs; glTF packing G=roughness B=metallic)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import plane
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.texture import AtlasBuilder
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle

ROT_UP = (np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4))


def _render(mat_kwargs, atlas):
    plugin = Mesh3dPlugin(backend="pallas_interpret", atlas=atlas)
    quad = plugin.add_mesh(plane(2.5, 2.5))
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=96, height=72), plugin)
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3.5)))
    app.world.spawn(DirectionalLight(illuminance=0.8),
                    *transform_bundle(rotation=(-0.2, 0.1, 0.0, 0.97)))
    app.world.spawn(Mesh3d(mesh=quad), MeshMaterial(**mat_kwargs),
                    *transform_bundle(rotation=ROT_UP))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_emissive_texture_modulates():
    atlas = AtlasBuilder(16, 16)
    # left half black, right half green emissive mask
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[:, 4:] = (0, 255, 0, 255)
    h = atlas.add(tex)
    # a white uv rect is needed for fu/fv (the emissive rect reuses the
    # mesh UVs); base texture absent -> base color stands
    img = _render(dict(base_color=(0.1, 0.1, 0.1, 1.0),
                       emissive=(0.0, 2.0, 0.0),
                       em_min=h["uv_min"], em_max=h["uv_max"]), atlas)
    left = img[36, 30]
    right = img[36, 66]
    # emissive shows only where the mask is green (sides may be swapped
    # by the mesher's uv orientation — demand a big one-sided delta)
    assert abs(int(left[1]) - int(right[1])) > 60, (left, right)


def test_metallic_roughness_texture():
    """The MR texture modulates the metallic/roughness written into the
    deferred G-buffer (glTF packing: G=roughness, B=metallic); the
    forward resolve is Lambert-only so the check reads the G-buffer."""
    from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
    from bevy_tpu.render.plugin import RenderTarget

    atlas = AtlasBuilder(16, 16)
    # G channel: left rough (255), right smooth (8); B: left metal
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[:, :4, 1] = 255
    tex[:, 4:, 1] = 8
    tex[:, :4, 2] = 255
    tex[..., 3] = 255
    h = atlas.add(tex)
    plugin = Mesh3dPlugin(backend="pallas_interpret", atlas=atlas,
                          deferred=True)
    quad = plugin.add_mesh(plane(2.5, 2.5))
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=96, height=72), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3.5)))
    app.world.spawn(PointLight(intensity=5.0, range=20.0),
                    *transform_bundle(translation=(0.0, 1.0, 2.0)))
    app.world.spawn(Mesh3d(mesh=quad),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0),
                                 metallic=1.0, perceptual_roughness=1.0,
                                 mr_min=h["uv_min"], mr_max=h["uv_max"]),
                    *transform_bundle(rotation=ROT_UP))
    app.update(dt=1 / 60)
    g = np.asarray(
        app.world.state["res"][RenderTarget.RESOURCE]["gbuffer"])
    met, rough = g[10], g[11]
    met_l, met_r = met[36, 30], met[36, 66]
    rgh_l, rgh_r = rough[36, 30], rough[36, 66]
    assert abs(met_l - met_r) > 0.5, (met_l, met_r)
    assert abs(rgh_l - rgh_r) > 0.5, (rgh_l, rgh_r)


def test_occlusion_texture_darkens():
    atlas = AtlasBuilder(16, 16)
    tex = np.full((8, 8, 4), 255, np.uint8)
    tex[:, 4:, 0] = 40            # right half occluded (R channel)
    h = atlas.add(tex)
    img = _render(dict(base_color=(0.8, 0.8, 0.8, 1.0),
                       oc_min=h["uv_min"], oc_max=h["uv_max"]), atlas)
    left = img[36, 30].sum()
    right = img[36, 66].sum()
    assert abs(left - right) > 80, (img[36, 30], img[36, 66])


def test_reflectance_scales_specular():
    """StandardMaterial::reflectance — F0 = 0.16*r^2 (ref:
    pbr_material.rs, 0.5 = 4%). A smooth dielectric at reflectance 1.0
    shows a stronger specular response than at 0.05 under the deferred
    binned shade."""
    from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight

    def render(refl):
        plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
        quad = plugin.add_mesh(plane(2.5, 2.5))
        app = App(capacity=16)
        app.add_plugins(TimePlugin(), TransformPlugin(),
                        RenderPlugin(width=96, height=72), plugin,
                        DeferredLightingPlugin(backend="pallas_interpret"))
        app.insert_resource(AmbientLight(brightness=0.05))
        app.world.spawn(Camera3d(),
                        *transform_bundle(translation=(0, 0, 3.5)))
        app.world.spawn(PointLight(intensity=4.0, range=20.0),
                        *transform_bundle(translation=(0.5, 0.5, 2.0)))
        app.world.spawn(Mesh3d(mesh=quad),
                        MeshMaterial(base_color=(0.3, 0.3, 0.3, 1.0),
                                     metallic=0.0,
                                     perceptual_roughness=0.15,
                                     reflectance=refl),
                        *transform_bundle(rotation=ROT_UP))
        app.update(dt=1 / 60)
        return frame_image(app).astype(int)

    lo = render(0.05)[..., :3]
    hi = render(1.0)[..., :3]
    # the highlight region must brighten substantially with reflectance
    assert hi.sum() > lo.sum() + 20000, (hi.sum(), lo.sum())
    bright_hi = (hi.max(-1) > 150).sum()
    bright_lo = (lo.max(-1) > 150).sum()
    assert bright_hi > bright_lo, (bright_hi, bright_lo)
