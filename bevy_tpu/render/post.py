"""Post-processing (reference twin: bevy_core_pipeline tonemapping/ —
Tonemapping modes + exposure; bevy_post_process bloom is future work).

Default is None (pass-through) so images stay bit-stable; Reinhard and the
ACES fitted curve are the analytic modes (the reference's default
TonyMcMapface needs its LUT asset — approximated by ACES here, noted for
parity reviews).
"""

from __future__ import annotations

import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Res, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.render.plugin import POST_SET, RenderTarget


class Tonemapping:
    NONE = 0
    REINHARD = 1
    REINHARD_LUMINANCE = 2
    ACES = 3


def _luminance(rgb):
    return (0.2126 * rgb[0] + 0.7152 * rgb[1] + 0.0722 * rgb[2])


def tonemap(rgb, mode: int, exposure: float):
    """rgb: (3, H, W) linear planes."""
    rgb = rgb * exposure
    if mode == Tonemapping.NONE:
        return rgb
    if mode == Tonemapping.REINHARD:
        return rgb / (1.0 + rgb)
    if mode == Tonemapping.REINHARD_LUMINANCE:
        l = _luminance(rgb)
        return rgb * (1.0 / (1.0 + l))[None]
    if mode == Tonemapping.ACES:
        # Narkowicz ACES fit (public constants)
        a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
        return jnp.clip((rgb * (a * rgb + b)) /
                        (rgb * (c * rgb + d) + e), 0.0, 1.0)
    raise ValueError(mode)


class TonemappingPlugin(Plugin):
    """ref: Tonemapping component on cameras — global here (one target)."""

    def __init__(self, mode: int = Tonemapping.ACES, exposure: float = 1.0):
        self.mode = mode
        self.exposure = exposure

    def build(self, app):
        mode, exposure = self.mode, self.exposure

        @system(name="tonemap_pass")
        def tonemap_pass(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            target.color = jnp.concatenate(
                [tonemap(c[:3], mode, exposure), c[3:4]], axis=0)

        app.add_systems(Render, tonemap_pass, in_set=POST_SET)
