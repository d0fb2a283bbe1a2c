"""Lightmaps (reference twin: examples/3d/lightmaps.rs — baked lighting
from an atlas rect modulated by albedo; here a procedurally "baked"
warm/cool gradient lights a room with direct lights nearly off)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.texture import AtlasBuilder
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, backend="auto") -> App:
    atlas = AtlasBuilder(256, 256)
    # "baked" lightmap: warm glow pooling at the center, cool edges
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 63.0
    d = np.hypot(xx - 0.5, yy - 0.5) * 2.0
    lm = np.zeros((64, 64, 4), np.float32)
    lm[..., 0] = np.clip(2.2 - 2.0 * d, 0.05, None)
    lm[..., 1] = np.clip(1.8 - 1.9 * d, 0.05, None)
    lm[..., 2] = np.clip(0.9 - 0.5 * d, 0.1, None)
    lm[..., 3] = 1.0
    h = atlas.add(lm, srgb=False)

    app = App(capacity=32)
    plugin = Mesh3dPlugin(atlas=atlas, backend=backend)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.03))
    lm_kw = dict(lm_min=h["uv_min"], lm_max=h["uv_max"])
    # lightmapped floor + two unmapped cubes for contrast
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.85, 0.85, 0.85, 1.0), **lm_kw),
                    *transform_bundle(translation=(0.0, -0.55, -3.0),
                                      scale=(10.0, 0.1, 10.0)))
    for x in (-2.0, 2.0):
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.6, 0.6, 0.65, 1.0)),
                        *transform_bundle(translation=(x, 0.0, -3.0)))
    app.world.spawn(DirectionalLight(illuminance=0.15),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 3.5, 2.5), rotation=(-0.4, 0.0, 0.0, 0.917)))
    return app


def main():
    from PIL import Image

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    Image.fromarray(img).save("/tmp/lightmaps.png")
    print("saved /tmp/lightmaps.png")


if __name__ == "__main__":
    main()
