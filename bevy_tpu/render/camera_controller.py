"""Camera controllers (reference twin: bevy_camera_controller — free-cam
WASD+mouse and orbit controllers). Reads the input resources; attach the
component to a camera entity.
"""

from __future__ import annotations

import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Update
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Res
from bevy_tpu.ecs.system import system
from bevy_tpu.input import KeyCode
from bevy_tpu.math.quat import quat_from_euler, quat_rotate_vec3
from bevy_tpu.time import Time
from bevy_tpu.transform import Transform


@component
class FreeCamera:
    """WASD + QE vertical + mouse-look while right button held
    (ref: free_cam controller)."""
    speed = field((), jnp.float32, default=10.0)
    sensitivity = field((), jnp.float32, default=0.003)
    yaw = field((), jnp.float32)
    pitch = field((), jnp.float32)


@system(name="free_camera_controller")
def free_camera_controller(q=Query(Transform, FreeCamera),
                           kb=Res("keyboard"), mouse=Res("mouse"),
                           time=Res(Time)):
    looking = mouse.pressed[1]  # right button
    dyaw = jnp.where(looking, -mouse.delta[0], 0.0) * q.free_camera.sensitivity
    dpitch = jnp.where(looking, -mouse.delta[1], 0.0) * q.free_camera.sensitivity
    yaw = q.free_camera.yaw + dyaw
    pitch = jnp.clip(q.free_camera.pitch + dpitch, -1.54, 1.54)
    q.free_camera.yaw = jnp.where(q.mask, yaw, q.free_camera.yaw)
    q.free_camera.pitch = jnp.where(q.mask, pitch, q.free_camera.pitch)
    rot = quat_from_euler(yaw, pitch, jnp.zeros_like(yaw))
    q.transform.rotation = jnp.where(q.mask[:, None], rot, q.transform.rotation)

    def axis(plus, minus):
        return (kb.pressed[plus].astype(jnp.float32) -
                kb.pressed[minus].astype(jnp.float32))

    local = jnp.stack([
        jnp.broadcast_to(axis(KeyCode.KeyD, KeyCode.KeyA), yaw.shape),
        jnp.broadcast_to(axis(KeyCode.KeyE, KeyCode.KeyQ), yaw.shape),
        jnp.broadcast_to(-axis(KeyCode.KeyW, KeyCode.KeyS), yaw.shape),
    ], axis=-1)
    world_dir = quat_rotate_vec3(rot, local)
    step = world_dir * (q.free_camera.speed * time.delta)[..., None]
    q.transform.translation = jnp.where(
        q.mask[:, None], q.transform.translation + step,
        q.transform.translation)


class CameraControllerPlugin(Plugin):
    def build(self, app):
        app.world.register_component(FreeCamera)
        app.add_systems(Update, free_camera_controller)
