"""Shadow showcase (reference twins: examples/3d/shadow_caster_receiver.rs
+ spotlight.rs — cascaded directional shadows and a shadow-casting spot
over the deferred path)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, SpotLight
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.shadow import ShadowPlugin
from bevy_tpu.render.spot_shadow import SpotShadowPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=640, height=360, backend="auto") -> App:
    app = App(capacity=64)
    plugin = Mesh3dPlugin(deferred=True, backend=backend)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    DeferredLightingPlugin(backend=backend),
                    ShadowPlugin(plugin, size=512, extent=16.0,
                                 distance=30.0, cascades=2, backend=backend),
                    SpotShadowPlugin(plugin, size=512, backend=backend))
    app.insert_resource(AmbientLight(brightness=0.05))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.75, 0.75, 0.75, 1.0)),
                    *transform_bundle(translation=(0.0, -0.55, 0.0),
                                      scale=(24.0, 0.1, 24.0)))
    for x, z in ((-2.0, 0.0), (0.0, -1.5), (2.0, 0.5)):
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.7, 0.4, 0.3, 1.0)),
                        *transform_bundle(translation=(x, 0.5, z)))
    app.world.spawn(DirectionalLight(illuminance=0.8),
                    *transform_bundle(rotation=(-0.35, 0.3, 0.1, 0.88)))
    app.world.spawn(SpotLight(intensity=50.0, range=25.0, inner_angle=0.4,
                              outer_angle=0.7, shadows=1),
                    *transform_bundle(translation=(1.0, 5.0, 3.0),
                                      rotation=(-0.55, 0.1, 0.05, 0.83)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 4.0, 9.0), rotation=(-0.2, 0.0, 0.0, 0.98)))
    return app


def main():
    import numpy as np
    from PIL import Image

    app = build_app()
    app.update(dt=1 / 60)
    Image.fromarray(np.asarray(frame_image(app))).save("/tmp/shadows.png")
    print("shadow_showcase: rendered → /tmp/shadows.png")


if __name__ == "__main__":
    main()
