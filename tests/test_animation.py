"""Animation & skinning tests (ref model: bevy_animation in-crate tests +
many_foxes example semantics)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from bevy_tpu.animation import (
    AnimationClip, Skeleton, bake_clips, compose_joints, sample_pose,
    skin_matrices,
)
from bevy_tpu.math.affine import TRS


def _chain():
    """2-joint chain: root at origin, child offset +x 1."""
    return Skeleton([-1, 0], [[0, 0, 0], [1, 0, 0]])


def test_inverse_bind_roundtrip():
    sk = _chain()
    inv = sk.inverse_bind()
    # bind * inverse_bind == identity
    t, r, s = sk.rest_global()
    from bevy_tpu.math.affine import trs_to_mat4
    bind = np.asarray(trs_to_mat4(TRS(
        translation=jnp.asarray(t), rotation=jnp.asarray(r),
        scale=jnp.asarray(s))))
    prod = np.einsum("jab,jbc->jac", bind, inv)
    assert np.allclose(prod, np.eye(4)[None], atol=1e-5)


def test_clip_sampling_interpolates():
    sk = _chain()

    def pose(t):
        tr = sk.rest_t.copy()
        tr[1, 1] = t  # child rises linearly over the clip
        return {"translation": tr,
                "rotation": np.tile([0, 0, 0, 1.0], (2, 1))}

    clip = AnimationClip(1.0, pose, rate=10.0)
    data, counts, rates = bake_clips([clip])
    local = sample_pose(data, counts, rates,
                        jnp.zeros(3, jnp.int32),
                        jnp.asarray([0.0, 0.55, 1.0]))
    y = np.asarray(local["translation"])[:, 1, 1]
    assert abs(y[0] - 0.0) < 1e-5
    assert abs(y[1] - 0.55) < 0.02   # between baked frames
    assert abs(y[2] - 1.0) < 1e-5


def test_compose_and_skin_rest_pose_is_identity():
    sk = _chain()
    local = TRS(translation=jnp.asarray(sk.rest_t)[None],
                rotation=jnp.asarray(sk.rest_r)[None],
                scale=jnp.asarray(sk.rest_s)[None])
    g = compose_joints(sk, local)
    mats = np.asarray(skin_matrices(sk, g))
    assert np.allclose(mats, np.eye(4)[None, None], atol=1e-5)


def test_rotation_propagates_down_chain():
    sk = _chain()
    from bevy_tpu.math.quat import quat_from_rotation_z
    rot = quat_from_rotation_z(jnp.asarray(np.pi / 2))
    local = TRS(
        translation=jnp.asarray(sk.rest_t)[None],
        rotation=jnp.stack([rot, jnp.asarray([0, 0, 0, 1.0])])[None],
        scale=jnp.ones((1, 2, 3)))
    g = compose_joints(sk, local)
    # child global position: root rotation swings +x offset to +y
    child = np.asarray(g["translation"])[0, 1]
    assert np.allclose(child, [0, 1, 0], atol=1e-5)


def test_many_foxes_end_to_end():
    import many_foxes
    from bevy_tpu.render.plugin import frame_image

    kw = dict(n_foxes=9, width=192, height=96, capacity=32,
              camera=(0.0, 3.0, 12.0), camera_pitch=-0.2)
    app = many_foxes.build_app(**kw)
    app.update(dt=1 / 60)
    img0 = frame_image(app)
    for _ in range(10):
        app.update(dt=1 / 60)
    img1 = frame_image(app)
    bg = img1[2, 2, 0]
    assert (img1[..., 0] != bg).sum() > 100, "foxes not visible"
    assert (img0 != img1).any(), "animation frozen"
    # deterministic replay
    app2 = many_foxes.build_app(**kw)
    for _ in range(11):
        app2.update(dt=1 / 60)
    assert np.array_equal(img1, frame_image(app2))


def test_transition_crossfades():
    """start_transition blends poses over the configured duration."""
    import jax.numpy as jnp
    from bevy_tpu.animation import (
        AnimationClip, bake_clips, sample_pose_blended, start_transition,
    )
    sk = _chain()

    def pose_at(y):
        def pose(t):
            tr = sk.rest_t.copy()
            tr[1, 1] = y
            return {"translation": tr,
                    "rotation": np.tile([0, 0, 0, 1.0], (2, 1))}
        return pose

    clip_a = AnimationClip(1.0, pose_at(0.0), rate=10.0)
    clip_b = AnimationClip(1.0, pose_at(2.0), rate=10.0)
    data, counts, rates = bake_clips([clip_a, clip_b])

    def blended(blend):
        player = {"clip": jnp.asarray([1]), "time": jnp.zeros(1),
                  "prev_clip": jnp.asarray([0]), "prev_time": jnp.zeros(1),
                  "blend": jnp.asarray([blend], jnp.float32)}
        p = sample_pose_blended(data, counts, rates, player)
        return float(np.asarray(p["translation"])[0, 1, 1])

    assert abs(blended(0.0) - 0.0) < 1e-5   # fully on prev clip
    assert abs(blended(0.5) - 1.0) < 1e-5   # halfway
    assert abs(blended(1.0) - 2.0) < 1e-5   # fully on new clip


def test_transition_in_app():
    import many_foxes
    from bevy_tpu.animation import AnimationPlayer, start_transition
    from bevy_tpu.render.plugin import frame_image

    app = many_foxes.build_app(n_foxes=4, width=128, height=64, capacity=32,
                               camera=(0.0, 2.0, 8.0), camera_pitch=-0.2)
    app.update(dt=1 / 60)
    rows = app.world.query_rows(AnimationPlayer)
    start_transition(app.world, int(rows[0]), clip=0, duration=0.2)
    img0 = frame_image(app)
    for _ in range(5):
        app.update(dt=1 / 60)
    img1 = frame_image(app)
    assert (img0 != img1).any()
    p = app.world.get(int(rows[0]), AnimationPlayer)
    assert 0.0 < float(p.blend) <= 1.0
