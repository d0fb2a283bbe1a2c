"""Distance + volumetric fog (reference twin: examples/3d/fog.rs +
volumetric_fog.rs — a row of cubes receding into fog, plus shadowed
light shafts from a directional light)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.fog import DistanceFogPlugin, VolumetricFogPlugin
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, volumetric=True, **kw) -> App:
    app = App(capacity=64)
    plugin = Mesh3dPlugin(**kw)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    fog = [DistanceFogPlugin(color=(0.35, 0.4, 0.5), density=0.05)]
    if volumetric:
        fog.append(VolumetricFogPlugin(density=0.04))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin, *fog)
    app.insert_resource(AmbientLight(brightness=0.15))
    # receding cube colonnade (ref: fog.rs's depth cue scene)
    for i in range(8):
        for sx in (-2.5, 2.5):
            app.world.spawn(
                Mesh3d(mesh=cube),
                MeshMaterial(base_color=(0.8, 0.3 + 0.08 * i, 0.2, 1.0)),
                *transform_bundle(translation=(sx, 0.0, -3.0 * i),
                                  scale=(1.0, 2.0, 1.0)))
    # floor
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.4, 0.42, 0.45, 1.0)),
                    *transform_bundle(translation=(0.0, -1.6, -12.0),
                                      scale=(30.0, 0.2, 40.0)))
    app.world.spawn(DirectionalLight(illuminance=1.2),
                    *transform_bundle(rotation=(-0.35, 0.25, 0.0, 0.9)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 1.5, 4.0), rotation=(-0.08, 0.0, 0.0, 0.997)))
    return app


def main():
    import numpy as np
    from PIL import Image

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    Image.fromarray(img).save("/tmp/fog_3d.png")
    print("saved /tmp/fog_3d.png")


if __name__ == "__main__":
    main()
