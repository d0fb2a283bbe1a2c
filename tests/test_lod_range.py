"""LOD visibility-range culling (ref: bevy_camera visibility/range.rs
VisibilityRange). Moved out of test_state.py: it compiles two full 3D
frames (~79 s cold) and test_state is in the bounded smoke tier.
"""

from bevy_tpu import App
from bevy_tpu.time import TimePlugin


def test_lod_visibility_range():
    import numpy as np
    from bevy_tpu.render import RenderPlugin
    from bevy_tpu.render.camera import Camera3d
    from bevy_tpu.render.mesh import cuboid
    from bevy_tpu.render.mesh3d import (
        DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
    )
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    def scene(lod_far):
        app = App(capacity=16)
        plugin = Mesh3dPlugin(backend="pallas_interpret")
        cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
        app.add_plugins(TimePlugin(), TransformPlugin(),
                        RenderPlugin(width=96, height=64), plugin)
        app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 5)))
        app.world.spawn(DirectionalLight(), *transform_bundle())
        app.world.spawn(Mesh3d(mesh=cube, lod_far=lod_far), MeshMaterial(),
                        *transform_bundle())
        app.update(dt=1 / 60)
        img = frame_image(app)
        return img[32, 48, 0] > 100   # cube visible at center?

    assert bool(scene(lod_far=100.0))       # within range → visible
    assert not bool(scene(lod_far=2.0))     # camera at 5 > far 2 → culled
