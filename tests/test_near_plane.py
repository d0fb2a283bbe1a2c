"""Near-plane robustness (ref model: the reference rasterizer's
near-plane clipping — this engine instead uses clipless homogeneous
raster, ops/raster3d_visbuf.py header note: triangles straddling the
near plane rasterize correctly WITHOUT a clip pass). The classic
failure this guards: triangles popping out wholesale as the camera
passes through geometry.

Coverage is measured against an EMPTY-scene render (same camera, no
mesh), not against a corner pixel — a close quad legitimately fills
the whole frame, so any fixed in-frame pixel can land on the quad."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import plane
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _render(cam_z, with_quad, backend="pallas_interpret"):
    """A 6x6 quad at the origin TILTED 45 deg about X (so it spans view
    depths rather than sitting in one plane); the camera slides along +z
    THROUGH the quad. At small cam_z the quad genuinely straddles the
    near plane: vertices both behind the eye and well in front."""
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend=backend)
    quad = plugin.add_mesh(plane(6.0, 6.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=120), plugin)
    app.insert_resource(AmbientLight(brightness=0.4))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, cam_z)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    if with_quad:
        # plane() lies in XZ facing +Y; rotate -45 deg about X: the
        # far edge tips up, the near edge tips down, normal gains +z
        # (faces a camera on +z)
        s, c = np.sin(np.pi / 8), np.cos(np.pi / 8)
        app.world.spawn(
            Mesh3d(mesh=quad),
            MeshMaterial(base_color=(0.9, 0.3, 0.2, 1.0)),
            *transform_bundle(translation=(0.0, 0.0, 0.0),
                              rotation=(s, 0.0, 0.0, c)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def _coverage(cam_z, empty, backend="pallas_interpret"):
    img = _render(cam_z, True, backend=backend)
    return (np.abs(img - empty).max(-1) > 20).mean()


def test_quad_no_popping_through_near_plane():
    """As the camera approaches and crosses the tilted quad, coverage
    must stay large and never collapse to zero until the quad is
    genuinely behind the camera — near-straddling triangles (corners
    behind the eye at close range) must still rasterize their visible
    part (the clipless homogeneous guarantee)."""
    empty = _render(4.0, False)
    far_cov = _coverage(4.0, empty)
    near_cov = _coverage(1.0, empty)
    # camera INSIDE the quad's depth span (quad z extent +-2.12): real
    # near-plane straddle — two corners behind the eye
    straddle_cov = _coverage(0.5, empty)
    deep_cov = _coverage(0.05, empty)
    assert far_cov > 0.2, far_cov
    assert near_cov > 0.3, near_cov
    # the popping bug would show here as ~0 coverage
    assert straddle_cov > 0.25, straddle_cov
    assert deep_cov > 0.2, deep_cov


def test_behind_camera_not_drawn():
    empty = _render(4.0, False)
    # camera past the quad's whole depth span, facing away
    cov = _coverage(-3.0, empty)
    assert cov < 0.01, cov


def test_xla_fallback_clips_near_plane():
    """The XLA fallback raster used to DROP triangles with any vertex
    behind the eye (popping as the camera passes through geometry);
    ops/raster3d.clip_near_corners now clips them at w = eps like the
    reference's hardware clipper. Same straddle sweep as the Pallas
    test, on backend='xla'."""
    empty = _render(4.0, False, backend="xla")
    far_cov = _coverage(4.0, empty, backend="xla")
    straddle_cov = _coverage(0.5, empty, backend="xla")
    deep_cov = _coverage(0.05, empty, backend="xla")
    assert far_cov > 0.2, far_cov
    assert straddle_cov > 0.25, straddle_cov
    assert deep_cov > 0.2, deep_cov


def test_xla_matches_pallas_through_camera():
    """The clipped XLA fallback and the clipless Pallas raster agree on
    the visible fragment set for a quad through the near plane (same
    camera, per-pixel coverage IoU)."""
    empty = _render(0.5, False)
    a = (_render(0.5, True, backend="xla") - empty)
    b = (_render(0.5, True, backend="pallas_interpret") - empty)
    ca = np.abs(a).max(-1) > 20
    cb = np.abs(b).max(-1) > 20
    inter = (ca & cb).sum()
    union = (ca | cb).sum()
    assert union > 0
    assert inter / union > 0.97, inter / union
