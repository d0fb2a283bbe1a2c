"""Animation blend graphs (ref model: bevy_animation graph.rs tests —
weighted blend nodes, additive layering)."""

import numpy as np
import jax.numpy as jnp

from bevy_tpu.animation import AnimationClip, Skeleton, bake_clips
from bevy_tpu.animation.graph import (
    MAX_NODES, AnimationGraph, AnimationGraphPlayer,
)


def _const_clip(t_vec):
    t_vec = np.asarray(t_vec, np.float32)

    def pose(_t):
        return {"translation": t_vec[None, :],
                "rotation": np.asarray([[0, 0, 0, 1]], np.float32),
                "scale": np.ones((1, 3), np.float32)}

    return AnimationClip(1.0, pose)


class _Cols:
    """Stand-in for the AnimationGraphPlayer column view."""

    def __init__(self, times, speeds, weights):
        self.times = jnp.asarray(times, jnp.float32)
        self.speeds = jnp.asarray(speeds, jnp.float32)
        self.weights = jnp.asarray(weights, jnp.float32)


def _player_cols(graph, weights_override=None):
    n = 1
    w = np.zeros((n, MAX_NODES), np.float32)
    for i, node in enumerate(graph.nodes):
        w[:, i] = node.weight
    if weights_override:
        for i, v in weights_override.items():
            w[:, i] = v
    return _Cols(np.zeros((n, MAX_NODES)), np.ones((n, MAX_NODES)), w)


def test_blend_two_clips_midpoint():
    a = _const_clip([0.0, 0.0, 0.0])
    b = _const_clip([2.0, 0.0, 0.0])
    data, counts, rates = bake_clips([a, b])
    g = AnimationGraph()
    na = g.add_clip(0)
    nb = g.add_clip(1)
    g.add_blend([na, nb])
    pose = g.sample(data, counts, rates, _player_cols(g),
                    jnp.asarray([0], jnp.int32))
    np.testing.assert_allclose(pose["translation"][0, 0],
                               [1.0, 0.0, 0.0], atol=1e-5)


def test_blend_weights_shift():
    a = _const_clip([0.0, 0.0, 0.0])
    b = _const_clip([2.0, 0.0, 0.0])
    data, counts, rates = bake_clips([a, b])
    g = AnimationGraph()
    na = g.add_clip(0)
    nb = g.add_clip(1)
    g.add_blend([na, nb])
    cols = _player_cols(g, weights_override={na: 3.0, nb: 1.0})
    pose = g.sample(data, counts, rates, cols, jnp.asarray([0], jnp.int32))
    np.testing.assert_allclose(pose["translation"][0, 0],
                               [0.5, 0.0, 0.0], atol=1e-5)


def test_additive_layer():
    base = _const_clip([1.0, 0.0, 0.0])
    layer = _const_clip([0.0, 0.5, 0.0])
    data, counts, rates = bake_clips([base, layer])
    g = AnimationGraph()
    nb = g.add_clip(0)
    nl = g.add_clip(1)
    g.add_additive(nb, [nl])
    cols = _player_cols(g, weights_override={nl: 0.5})
    pose = g.sample(data, counts, rates, cols, jnp.asarray([0], jnp.int32))
    # base + 0.5 * layer translation
    np.testing.assert_allclose(pose["translation"][0, 0],
                               [1.0, 0.25, 0.0], atol=1e-5)


def test_graph_skinned_render():
    """Graph-driven skinned pass renders and responds to weight changes."""
    from bevy_tpu import App
    from bevy_tpu.render import RenderPlugin
    from bevy_tpu.render.camera import Camera3d
    from bevy_tpu.render.mesh import cuboid
    from bevy_tpu.render.mesh3d import DirectionalLight, MeshMaterial
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.render.skinned import SkinnedMesh3d, SkinnedMeshPlugin
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    skel = Skeleton([-1], [[0.0, 0.0, 0.0]])

    def make(dx):
        def pose(_t):
            return {"translation": np.asarray([[dx, 0.0, 0.0]], np.float32),
                    "rotation": np.asarray([[0, 0, 0, 1]], np.float32),
                    "scale": np.ones((1, 3), np.float32)}
        return AnimationClip(1.0, pose)

    left = make(-0.8)
    right = make(0.8)
    g = AnimationGraph()
    nl = g.add_clip(0)
    nr = g.add_clip(1)
    g.add_blend([nl, nr])

    mesh = cuboid(1.0, 1.0, 1.0)
    w = np.ones((mesh.num_vertices, 1), np.float32)

    app = App(capacity=16)
    sp = SkinnedMeshPlugin(skel, mesh, w, [left, right], graph=g)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), sp)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 4.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    e = app.world.spawn(SkinnedMesh3d(), g.default_player(),
                        MeshMaterial(base_color=(0.9, 0.9, 0.9, 1.0)),
                        *transform_bundle())
    app.update(dt=1 / 60)
    img_mid = frame_image(app)
    # all weight to the "right" clip → cube shifts right
    p = g.default_player()
    import bevy_tpu.animation.graph as ag
    weights = [0.0] * ag.MAX_NODES
    weights[nr] = 1.0
    weights[g.root] = 1.0
    app.world.insert(e.index if hasattr(e, "index") else e,
                     AnimationGraphPlayer(times=[0.0] * ag.MAX_NODES,
                                          speeds=[1.0] * ag.MAX_NODES,
                                          weights=weights))
    app.update(dt=1 / 60)
    img_right = frame_image(app)

    def centroid_x(img):
        bg = img[0, 0].astype(int)
        cov = np.abs(img.astype(int) - bg).max(-1) > 15
        ys, xs = np.where(cov)
        assert len(xs) > 20, "nothing rendered"
        return xs.mean()

    assert centroid_x(img_right) > centroid_x(img_mid) + 3


def test_joint_masks_split_body():
    """Masked clips drive disjoint joint subsets (ref:
    examples/animation/animation_masks.rs)."""

    def two_joint_clip(tj0, tj1):
        t = np.asarray([tj0, tj1], np.float32)

        def pose(_t):
            return {"translation": t,
                    "rotation": np.tile(np.asarray([0, 0, 0, 1],
                                                   np.float32), (2, 1)),
                    "scale": np.ones((2, 3), np.float32)}

        return AnimationClip(1.0, pose)

    a = two_joint_clip([1.0, 0, 0], [1.0, 0, 0])   # clip 0: both → x=1
    b = two_joint_clip([0, 1.0, 0], [0, 1.0, 0])   # clip 1: both → y=1
    data, counts, rates = bake_clips([a, b])

    g = AnimationGraph()
    na = g.add_clip(0, mask=np.asarray([1.0, 0.0]))   # joint 0 only
    nb = g.add_clip(1, mask=np.asarray([0.0, 1.0]))   # joint 1 only
    g.add_blend([na, nb])
    pose = g.sample(data, counts, rates, _player_cols(g),
                    jnp.asarray([0], jnp.int32))
    tr = np.asarray(pose["translation"][0])
    np.testing.assert_allclose(tr[0], [1.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(tr[1], [0.0, 1.0, 0.0], atol=1e-5)
