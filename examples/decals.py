"""Clustered decals (reference twin: examples/3d/decal.rs — box
projectors stamp color onto the surfaces they intersect; here three
tinted decals mark a floor and a wall)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.decal import Decal, DecalPlugin
from bevy_tpu.render.deferred import DeferredLightingPlugin
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, backend="auto") -> App:
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend=backend, deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    DecalPlugin(),
                    DeferredLightingPlugin(backend=backend))
    app.insert_resource(AmbientLight(brightness=0.3))
    # floor + back wall
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.75, 0.75, 0.78, 1.0)),
                    *transform_bundle(translation=(0.0, -0.55, -3.0),
                                      scale=(14.0, 0.1, 14.0)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.6, 0.62, 0.66, 1.0)),
                    *transform_bundle(translation=(0.0, 2.0, -8.0),
                                      scale=(14.0, 6.0, 0.2)))
    # three decal projectors (ref: decal.rs's rotating projectors)
    for x, col in ((-3.0, (1.0, 0.15, 0.1, 0.9)),
                   (0.0, (0.1, 0.9, 0.2, 0.9)),
                   (3.0, (0.2, 0.3, 1.0, 0.9))):
        app.world.spawn(Decal(color=col),
                        *transform_bundle(translation=(x, -0.4, -3.0),
                                          scale=(2.0, 1.2, 2.0)))
    app.world.spawn(DirectionalLight(illuminance=0.8),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 4.0, 4.0), rotation=(-0.35, 0.0, 0.0, 0.94)))
    return app


def main():
    import numpy as np
    from PIL import Image

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    Image.fromarray(img).save("/tmp/decals.png")
    print("saved /tmp/decals.png")


if __name__ == "__main__":
    main()
