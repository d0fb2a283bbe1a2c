"""Extended StandardMaterial showcase (reference twins:
examples/3d/anisotropy.rs, examples/3d/parallax_mapping.rs,
examples/3d/transmission.rs — one scene exercising anisotropic GGX,
parallax occlusion mapping, and volumetric attenuated transmission)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid, plane, uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.texture import AtlasBuilder, checkerboard
from bevy_tpu.render.transmission import TransmissionPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=640, height=360, backend="auto") -> App:
    atlas = AtlasBuilder(256, 256)
    tex = atlas.add(checkerboard(64, 8), srgb=False)
    # circular-bump depth map for POM (ref: the parallax example's
    # depth texture)
    yy, xx = np.mgrid[0:64, 0:64] / 63.0
    r = np.sqrt((xx - 0.5) ** 2 + (yy - 0.5) ** 2)
    dm = np.zeros((64, 64, 4), np.float32)
    dm[..., 0] = np.clip(1.0 - r * 3.0, 0.0, 1.0)
    dmap = atlas.add(dm, srgb=False)

    app = App(capacity=64)
    plugin = Mesh3dPlugin(backend=backend, atlas=atlas)
    sphere = plugin.add_mesh(uv_sphere(0.7, 32, 24))
    slab = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    floor = plugin.add_mesh(plane(6.0, 6.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    TransmissionPlugin(plugin, backend=backend))
    app.insert_resource(AmbientLight(brightness=0.08))
    app.world.spawn(Camera3d(),
                    *transform_bundle(translation=(0, 1.6, 4.5),
                                      rotation=(-0.17, 0.0, 0.0, 0.985)))
    app.world.spawn(DirectionalLight(illuminance=2.0),
                    *transform_bundle(rotation=(-0.45, 0.25, 0.0, 0.85)))

    # 1. anisotropic brushed-metal sphere (ref: anisotropy.rs)
    app.world.spawn(
        Mesh3d(mesh=sphere),
        MeshMaterial(base_color=(0.8, 0.7, 0.4, 1.0), metallic=1.0,
                     perceptual_roughness=0.35, anisotropy_strength=0.9),
        *transform_bundle(translation=(-1.8, 0.8, 0.0)))

    # 2. parallax-mapped checker floor tile (ref: parallax_mapping.rs)
    app.world.spawn(
        Mesh3d(mesh=floor),
        MeshMaterial(base_color=(1.0, 1.0, 1.0, 1.0),
                     uv_min=tex["uv_min"], uv_max=tex["uv_max"],
                     dm_min=dmap["uv_min"], dm_max=dmap["uv_max"],
                     parallax_depth_scale=0.08),
        *transform_bundle(translation=(0.0, 0.0, 0.0)))

    # 3. thick absorbing glass slab (ref: transmission.rs — attenuated
    #    volumetric transmission)
    app.world.spawn(
        Mesh3d(mesh=slab),
        MeshMaterial(base_color=(1.0, 1.0, 1.0, 1.0),
                     specular_transmission=1.0, ior=1.5,
                     perceptual_roughness=0.05, thickness=1.5,
                     attenuation_distance=0.8,
                     attenuation_color=(0.3, 0.9, 0.4)),
        *transform_bundle(translation=(1.8, 0.9, 0.6),
                          scale=(1.2, 1.5, 0.15)))

    # 4. translucent back-lit panel (diffuse transmission)
    app.world.spawn(
        Mesh3d(mesh=slab),
        MeshMaterial(base_color=(0.95, 0.9, 0.75, 1.0),
                     diffuse_transmission=0.9),
        *transform_bundle(translation=(0.0, 1.0, -1.6),
                          scale=(1.4, 1.2, 0.06)))
    return app


if __name__ == "__main__":
    import time

    import jax

    app = build_app()
    app.update(dt=1 / 60)
    img = frame_image(app)
    jax.device_get(img)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        app.update(dt=1 / 60)
    img = frame_image(app)
    jax.device_get(img)
    print(f"material_showcase: {(time.perf_counter() - t0) / n * 1000:.2f}"
          f" ms/frame")
    np.save("/tmp/material_showcase.npy", np.asarray(img))
    try:
        from PIL import Image
        Image.fromarray(np.asarray(img)).save("/tmp/material_showcase.png")
    except Exception:
        pass
