"""Post-processing stack (reference twins: examples/3d/bloom.rs,
ssao.rs, depth_of_field.rs, motion_blur.rs, post_processing.rs — the
whole effect chain over one scene)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.post import (
    BloomPlugin, CasPlugin, DepthOfFieldPlugin, FxaaPlugin, SsaoPlugin,
    TonemappingPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=640, height=360) -> App:
    app = App(capacity=64)
    plugin = Mesh3dPlugin()
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    SsaoPlugin(intensity=1.5),
                    BloomPlugin(threshold=0.8, intensity=0.35),
                    DepthOfFieldPlugin(focal_distance=6.0, focal_range=3.0),
                    CasPlugin(strength=0.5), FxaaPlugin(),
                    TonemappingPlugin())
    for i in range(24):
        x = (i % 6) - 2.5
        z = -(i // 6) * 3.0
        emissive = (2.0, 1.6, 0.4) if i % 7 == 0 else (0.0, 0.0, 0.0)
        app.world.spawn(
            Mesh3d(mesh=cube),
            MeshMaterial(base_color=(0.4 + 0.1 * (i % 5), 0.45, 0.6, 1.0),
                         emissive=emissive),
            *transform_bundle(translation=(x * 1.6, 0.0, z)))
    app.world.spawn(DirectionalLight(illuminance=1.2),
                    *transform_bundle(rotation=(-0.35, 0.25, 0.08, 0.9)))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1.5, 6.0)))
    return app


def main():
    import numpy as np
    from PIL import Image

    app = build_app()
    app.update(dt=1 / 60)
    Image.fromarray(np.asarray(frame_image(app))).save("/tmp/post.png")
    print("post_processing: rendered → /tmp/post.png")


if __name__ == "__main__":
    main()
