"""Animation & skeletal skinning (reference twin: bevy_animation —
AnimationClip of curves per target `src/animation_curves.rs`,
AnimationPlayer + graph blending `src/lib.rs:735`, `src/graph.rs`; skinning:
bevy_mesh SkinnedMesh joints+inverse bindposes `src/skinning.rs:18`, GPU
joint-matrix path `bevy_pbr/src/render/skin.rs:28`).

TPU design:
  * clips are baked to a UNIFORM sample rate at load (ref's keyframe binary
    search becomes two gathers + lerp/nlerp, vectorized over instances and
    joints).
  * joint hierarchies are composed joint-by-topological-order (J is small,
    static) on batched (Ni, …) arrays.
  * vertex skinning is a dense (VC, J) weight-matrix einsum — the MXU form
    of the reference's 4-influence gather loop (`skinning.wesl`).
All shapes static; instance count changes retrace via structure_version.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.component import field as efield
from bevy_tpu.ecs.message import MessageWriter, message
from bevy_tpu.ecs.query import Query, Res
from bevy_tpu.ecs.system import system
from bevy_tpu.math.affine import TRS, trs_compose, trs_to_mat4
from bevy_tpu.math.quat import quat_nlerp
from bevy_tpu.time import Time


class Skeleton:
    """Host-side skeleton: parents in topological order (parent[j] < j,
    root = -1), rest-pose local TRS. Computes inverse bindposes (ref:
    SkinnedMeshInverseBindposes)."""

    def __init__(self, parents, rest_translation, rest_rotation=None,
                 rest_scale=None, names: Optional[List[str]] = None,
                 inverse_bind=None):
        self.parents = np.asarray(parents, np.int32)
        j = len(self.parents)
        self.rest_t = np.asarray(rest_translation, np.float32).reshape(j, 3)
        self.rest_r = (np.asarray(rest_rotation, np.float32).reshape(j, 4)
                       if rest_rotation is not None
                       else np.tile([0, 0, 0, 1.0], (j, 1)).astype(np.float32))
        self.rest_s = (np.asarray(rest_scale, np.float32).reshape(j, 3)
                       if rest_scale is not None
                       else np.ones((j, 3), np.float32))
        self.names = names or [f"bone{i}" for i in range(j)]
        assert all(p < i for i, p in enumerate(self.parents)), \
            "parents must be topologically ordered"
        # cache host-side (rest_global uses jnp math, which must not run
        # for the first time inside a jit trace). Asset formats (glTF
        # skins[].inverseBindMatrices) provide explicit matrices instead.
        self._inverse_bind = None
        if inverse_bind is not None:
            self._inverse_bind = np.asarray(inverse_bind,
                                            np.float32).reshape(j, 4, 4)
        else:
            self._inverse_bind = self.inverse_bind()

    @property
    def num_joints(self):
        return len(self.parents)

    def rest_global(self):
        """Rest-pose global TRS per joint (host numpy math)."""
        out_t = np.zeros_like(self.rest_t)
        out_r = np.zeros_like(self.rest_r)
        out_s = np.ones_like(self.rest_s)
        for j2 in range(self.num_joints):
            p = self.parents[j2]
            local = TRS(translation=jnp.asarray(self.rest_t[j2]),
                        rotation=jnp.asarray(self.rest_r[j2]),
                        scale=jnp.asarray(self.rest_s[j2]))
            if p < 0:
                g = local
            else:
                parent = TRS(translation=jnp.asarray(out_t[p]),
                             rotation=jnp.asarray(out_r[p]),
                             scale=jnp.asarray(out_s[p]))
                g = trs_compose(parent, local)
            out_t[j2] = np.asarray(g["translation"])
            out_r[j2] = np.asarray(g["rotation"])
            out_s[j2] = np.asarray(g["scale"])
        return out_t, out_r, out_s

    def inverse_bind(self) -> np.ndarray:
        """(J, 4, 4) inverse bindpose matrices."""
        if self._inverse_bind is not None:
            return self._inverse_bind
        t, r, s = self.rest_global()
        mats = np.asarray(jax.device_get(trs_to_mat4(TRS(
            translation=jnp.asarray(t), rotation=jnp.asarray(r),
            scale=jnp.asarray(s)))))
        return np.linalg.inv(mats).astype(np.float32)


class AnimationClip:
    """Host clip: a pose function sampled to a uniform rate (ref:
    AnimationClip curves; authored keyframes resample the same way)."""

    def __init__(self, duration: float, pose_fn: Callable[[float], dict],
                 rate: float = 30.0):
        """pose_fn(time) -> {'translation': (J,3), 'rotation': (J,4),
        'scale': (J,3)} local joint pose."""
        self.duration = float(duration)
        self.rate = float(rate)
        frames = max(2, int(round(duration * rate)) + 1)
        ts, rs, ss = [], [], []
        for f in range(frames):
            pose = pose_fn(f / rate)
            ts.append(np.asarray(pose["translation"], np.float32))
            rs.append(np.asarray(pose["rotation"], np.float32))
            ss.append(np.asarray(pose.get("scale",
                                          np.ones_like(ts[-1])), np.float32))
        self.t = np.stack(ts)    # (F, J, 3)
        self.r = np.stack(rs)    # (F, J, 4)
        self.s = np.stack(ss)    # (F, J, 3)

    @property
    def num_frames(self):
        return self.t.shape[0]


@component
class AnimationPlayer:
    """ref: AnimationPlayer (lib.rs:735) + AnimationTransitions
    (transition.rs): the active clip crossfades from `prev_clip` while
    `blend` ramps 0→1 at `blend_rate` per second. `start_transition`
    (or in-jit writes) switch clips."""
    clip = field((), jnp.int32)
    time = field((), jnp.float32)
    speed = field((), jnp.float32, default=1.0)
    playing = field((), jnp.bool_, default=True)
    prev_clip = field((), jnp.int32)
    prev_time = field((), jnp.float32)
    blend = field((), jnp.float32, default=1.0)      # 1 = fully on `clip`
    blend_rate = field((), jnp.float32, default=4.0)  # 1/seconds


def start_transition(world, entity, clip: int, duration: float = 0.25):
    """Host helper: crossfade the player to `clip` over `duration` seconds
    (ref: AnimationTransitions::play)."""
    cur = world.get(entity, AnimationPlayer)
    world.insert(entity, AnimationPlayer(
        clip=clip, time=0.0, speed=float(cur.speed),
        playing=bool(cur.playing),
        prev_clip=int(cur.clip), prev_time=float(cur.time),
        blend=0.0, blend_rate=1.0 / max(duration, 1e-3)))


def advance_players(durations):
    """Update-system factory: advance & wrap player clocks + blend ramps
    (ref: advance_animations + advance_transitions)."""
    durs = jnp.asarray(durations, jnp.float32)

    @system(name="advance_animations")
    def advance_animations(q=Query(AnimationPlayer), time=Res(Time)):
        p = q.animation_player
        dt = jnp.where(p.playing, time.delta, 0.0) * p.speed

        def adv(t, clip):
            d = durs[jnp.clip(clip, 0, durs.shape[0] - 1)]
            return (t + dt) % jnp.maximum(d, 1e-6)

        p.time = jnp.where(q.mask, adv(p.time, p.clip), p.time)
        p.prev_time = jnp.where(q.mask, adv(p.prev_time, p.prev_clip),
                                p.prev_time)
        p.blend = jnp.where(q.mask,
                            jnp.minimum(p.blend + time.delta * p.blend_rate,
                                        1.0), p.blend)

    return advance_animations


def sample_pose_blended(clip_data, counts, rates, player):
    """Crossfaded pose: nlerp(prev, cur, blend) (ref: blend graph's 2-node
    case). `player` carries (Ni,) columns."""
    cur = sample_pose(clip_data, counts, rates, player["clip"],
                      player["time"])
    prev = sample_pose(clip_data, counts, rates, player["prev_clip"],
                       player["prev_time"])
    b = player["blend"][:, None, None]
    return TRS(
        translation=prev["translation"] * (1 - b) + cur["translation"] * b,
        rotation=quat_nlerp(prev["rotation"], cur["rotation"], b),
        scale=prev["scale"] * (1 - b) + cur["scale"] * b)


def bake_clips(clips: List[AnimationClip]):
    """Pad clips to one (C, F, J, 10) device array + per-clip frame counts
    and rates."""
    fmax = max(c.num_frames for c in clips)
    j = clips[0].t.shape[1]
    data = np.zeros((len(clips), fmax, j, 10), np.float32)
    counts, rates = [], []
    for i, c in enumerate(clips):
        f = c.num_frames
        data[i, :f, :, 0:3] = c.t
        data[i, :f, :, 3:7] = c.r
        data[i, :f, :, 7:10] = c.s
        data[i, f:] = data[i, f - 1]
        counts.append(f)
        rates.append(c.rate)
    return (jnp.asarray(data), jnp.asarray(counts, jnp.int32),
            jnp.asarray(rates, jnp.float32))


def sample_pose(clip_data, counts, rates, clip_ids, times):
    """Batched clip sampling: (Ni,) clip ids + times → local joint TRS
    (Ni, J, …). Two frame gathers + lerp/nlerp (ref: curve evaluation)."""
    ci = jnp.clip(clip_ids, 0, clip_data.shape[0] - 1)
    f = times * rates[ci]
    f0 = jnp.floor(f).astype(jnp.int32)
    alpha = (f - f0)[:, None, None]
    fmax = counts[ci] - 1
    f0 = jnp.clip(f0, 0, fmax)
    f1 = jnp.minimum(f0 + 1, fmax)
    p0 = clip_data[ci, f0]        # (Ni, J, 10)
    p1 = clip_data[ci, f1]
    t = p0[..., 0:3] * (1 - alpha) + p1[..., 0:3] * alpha
    r = quat_nlerp(p0[..., 3:7], p1[..., 3:7], alpha[..., 0][..., None])
    s = p0[..., 7:10] * (1 - alpha) + p1[..., 7:10] * alpha
    return TRS(translation=t, rotation=r, scale=s)


def compose_joints(skeleton: Skeleton, local: TRS) -> TRS:
    """Batched hierarchy composition in topological order (J static and
    small — the per-joint python loop unrolls into the jit; ref:
    bevy_transform propagation specialised to skeletons)."""
    t, r, s = local["translation"], local["rotation"], local["scale"]
    gt, gr, gs = [], [], []
    for j2 in range(skeleton.num_joints):
        lj = TRS(translation=t[:, j2], rotation=r[:, j2], scale=s[:, j2])
        p = int(skeleton.parents[j2])
        if p < 0:
            g = lj
        else:
            g = trs_compose(TRS(translation=gt[p], rotation=gr[p],
                                scale=gs[p]), lj)
        gt.append(g["translation"])
        gr.append(g["rotation"])
        gs.append(g["scale"])
    return TRS(translation=jnp.stack(gt, 1), rotation=jnp.stack(gr, 1),
               scale=jnp.stack(gs, 1))


def skin_matrices(skeleton: Skeleton, global_trs: TRS) -> jnp.ndarray:
    """(Ni, J, 4, 4) = joint global @ inverse bind (ref: skin.rs joint
    buffer build)."""
    mats = trs_to_mat4(global_trs)                     # (Ni, J, 4, 4)
    inv_bind = jnp.asarray(skeleton.inverse_bind())
    return jnp.einsum("njab,jbc->njac", mats, inv_bind)


@message
class AnimationEvent:
    """ref: bevy_animation/src/animation_event.rs — a payload fired when
    a player's clock crosses an authored timestamp."""
    entity = efield((), jnp.int32)
    code = efield((), jnp.int32)


def make_animation_event_system(durations, events, budget: int = 64):
    """Update-system factory (run AFTER advance_animations): fires an
    AnimationEvent message for every (clip, timestamp, code) in `events`
    whose timestamp the player's clock crossed this frame, wrap-aware
    (ref: trigger_animation_events)."""
    durs = jnp.asarray(durations, jnp.float32)
    ev_clip = jnp.asarray([e[0] for e in events], jnp.int32)
    ev_t = jnp.asarray([e[1] for e in events], jnp.float32)
    ev_code = jnp.asarray([e[2] for e in events], jnp.int32)
    n_ev = len(events)

    @system(name="animation_events")
    def animation_events(q=Query(AnimationPlayer), time=Res(Time),
                         w=MessageWriter(AnimationEvent, budget=budget)):
        p = q.animation_player
        dt = jnp.where(p.playing, time.delta, 0.0) * p.speed
        d = durs[jnp.clip(p.clip, 0, durs.shape[0] - 1)]
        # clock BEFORE this frame's advance (advance ran already)
        old = (p.time - dt) % jnp.maximum(d, 1e-6)
        tnew = p.time[:, None]
        told = old[:, None]
        ts = ev_t[None, :]
        match = (p.clip[:, None] == ev_clip[None, :]) & \
            q.mask[:, None] & (dt[:, None] > 0)
        nowrap = (told < ts) & (ts <= tnew)
        wrapped = (tnew < told) & ((ts > told) | (ts <= tnew))
        fire = (match & (nowrap | wrapped)).reshape(-1)
        ni = p.time.shape[0]
        ent = jnp.broadcast_to(
            jnp.arange(ni, dtype=jnp.int32)[:, None], (ni, n_ev)
        ).reshape(-1)
        code = jnp.broadcast_to(ev_code[None, :], (ni, n_ev)).reshape(-1)
        pos = jnp.cumsum(fire.astype(jnp.int32)) - 1
        tgt = jnp.where(fire & (pos < budget), pos, budget)
        ent_buf = jnp.zeros(budget + 1, jnp.int32).at[tgt].set(
            ent, mode="drop")[:budget]
        code_buf = jnp.zeros(budget + 1, jnp.int32).at[tgt].set(
            code, mode="drop")[:budget]
        total = jnp.minimum(jnp.sum(fire.astype(jnp.int32)), budget)
        w.send(count=total, entity=ent_buf, code=code_buf)

    return animation_events
