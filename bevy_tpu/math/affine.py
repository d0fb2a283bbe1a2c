"""Batched TRS / affine transform math (reference twin: bevy_transform
components + glam Affine3A).

A batch of transforms is a dict-like `TRS` of three columns:
  translation (..., 3) · rotation quat (..., 4) · scale (..., 3)
`GlobalTransform` equivalents are stored the same way (the reference stores
an Affine3A; we keep TRS because composing quats is cheaper on the VPU than
3x3 matmuls at small batch, and converts to mat on demand for the raster
vertex stage where the MXU wants matrices).
"""

import jax.numpy as jnp

from bevy_tpu.math.quat import (
    quat_identity, quat_mul, quat_rotate_vec3, quat_to_mat3, quat_conjugate,
)


class TRS(dict):
    """Pytree-friendly transform batch: keys translation/rotation/scale."""

    @property
    def translation(self):
        return self["translation"]

    @property
    def rotation(self):
        return self["rotation"]

    @property
    def scale(self):
        return self["scale"]


def trs(translation=None, rotation=None, scale=None, shape=()):
    t = translation if translation is not None else jnp.zeros(shape + (3,), jnp.float32)
    r = rotation if rotation is not None else quat_identity(shape)
    s = scale if scale is not None else jnp.ones(shape + (3,), jnp.float32)
    return TRS(translation=jnp.asarray(t, jnp.float32),
               rotation=jnp.asarray(r, jnp.float32),
               scale=jnp.asarray(s, jnp.float32))


def trs_identity(shape=()):
    return trs(shape=shape)


def trs_compose(parent, child):
    """parent * child (ref: GlobalTransform::mul_transform,
    bevy_transform/src/components/global_transform.rs).

    Note: like the reference's Affine composition, non-uniform parent scale
    combined with child rotation is approximated by component-wise scale
    composition (bevy documents the same shear caveat)."""
    scale = parent["scale"] * child["scale"]
    rotation = quat_mul(parent["rotation"], child["rotation"])
    translation = parent["translation"] + quat_rotate_vec3(
        parent["rotation"], parent["scale"] * child["translation"])
    return TRS(translation=translation, rotation=rotation, scale=scale)


def trs_inverse(t):
    inv_rot = quat_conjugate(t["rotation"])
    inv_scale = 1.0 / t["scale"]
    inv_trans = quat_rotate_vec3(inv_rot, -t["translation"]) * inv_scale
    return TRS(translation=inv_trans, rotation=inv_rot, scale=inv_scale)


def trs_transform_point(t, p):
    return quat_rotate_vec3(t["rotation"], t["scale"] * p) + t["translation"]


def trs_transform_vector(t, v):
    return quat_rotate_vec3(t["rotation"], t["scale"] * v)


def trs_to_mat4(t):
    """(..., ) TRS -> (..., 4, 4) column-major-convention matrices
    (M @ [p;1]). This is the raster vertex-stage input: a (N, 4, 4) batch
    feeds the MXU as one big matmul."""
    rot = quat_to_mat3(t["rotation"])  # (..., 3, 3)
    rs = rot * t["scale"][..., None, :]  # scale columns
    batch = rs.shape[:-2]
    m = jnp.zeros(batch + (4, 4), jnp.float32)
    m = m.at[..., :3, :3].set(rs)
    m = m.at[..., :3, 3].set(t["translation"])
    m = m.at[..., 3, 3].set(1.0)
    return m


def trs_to_affine(t):
    """(..., ) TRS -> (..., 3, 4) affine matrices."""
    return trs_to_mat4(t)[..., :3, :]


def affine_mul(a, b):
    """(..., 3, 4) @ (..., 3, 4) affine composition."""
    ra, ta = a[..., :3], a[..., 3]
    rb, tb = b[..., :3], b[..., 3]
    r = jnp.einsum("...ij,...jk->...ik", ra, rb)
    t = jnp.einsum("...ij,...j->...i", ra, tb) + ta
    return jnp.concatenate([r, t[..., None]], axis=-1)


def affine_to_trs(m):
    """(..., 3, 4) -> TRS, assuming no shear (ref:
    GlobalTransform::to_scale_rotation_translation)."""
    from bevy_tpu.math.quat import quat_from_mat3

    r3 = m[..., :3]
    scale = jnp.sqrt(jnp.sum(r3 * r3, axis=-2))
    # Guard zero scale
    safe = jnp.where(scale == 0.0, 1.0, scale)
    rot_m = r3 / safe[..., None, :]
    return TRS(translation=m[..., 3],
               rotation=quat_from_mat3(rot_m),
               scale=scale)


def mat4_mul(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b)


def mat4_transform_point(m, p):
    """(..., 4, 4) x (..., 3) -> (..., 3) with perspective divide."""
    ph = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], axis=-1)
    out = jnp.einsum("...ij,...j->...i", m, ph)
    return out[..., :3] / out[..., 3:4]


jax_tree_registered = False


def _register_pytree():
    global jax_tree_registered
    if jax_tree_registered:
        return
    import jax

    jax.tree_util.register_pytree_node(
        TRS,
        lambda t: (tuple(t[k] for k in ("translation", "rotation", "scale")), None),
        lambda _, kids: TRS(translation=kids[0], rotation=kids[1], scale=kids[2]),
    )
    jax_tree_registered = True


_register_pytree()
