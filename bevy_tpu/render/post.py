"""Post-processing (reference twin: bevy_core_pipeline tonemapping/ —
Tonemapping modes + exposure; bevy_post_process bloom is future work).

Default is None (pass-through) so images stay bit-stable; Reinhard and the
ACES fitted curve are the analytic modes (the reference's default
TonyMcMapface needs its LUT asset — approximated by ACES here, noted for
parity reviews).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import ResMut
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


def _gauss_kernel(sigma, k=9):
    x = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    return w / jnp.sum(w)


class BloomPlugin(Plugin):
    """ref: bevy_post_process bloom/ — bright-pass, downsampled separable
    gaussian blur, additive upsample. Runs in POST before tonemapping."""

    def __init__(self, threshold: float = 1.0, intensity: float = 0.2,
                 sigma: float = 2.0, downsample: int = 4):
        self.threshold = threshold
        self.intensity = intensity
        self.sigma = sigma
        self.downsample = downsample

    def build(self, app):
        thr, inten = self.threshold, self.intensity
        ds = self.downsample
        kern = _gauss_kernel(self.sigma)

        @system(name="bloom_pass")
        def bloom_pass(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            rgb = c[:3]                                   # (3, H, W)
            _, h, w = rgb.shape
            hd, wd = h // ds, w // ds
            bright = jnp.maximum(rgb - thr, 0.0)
            down = bright[:, :hd * ds, :wd * ds].reshape(
                3, hd, ds, wd, ds).mean((2, 4))           # (3, hd, wd)
            # separable gaussian via depthwise conv (channels as batch)
            x = down[:, None]                             # (3, 1, hd, wd)
            kh = kern[None, None, :, None]
            kw = kern[None, None, None, :]
            x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME")
            x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME")
            blur = x[:, 0]
            up = jnp.repeat(jnp.repeat(blur, ds, 1), ds, 2)
            up = jnp.pad(up, ((0, 0), (0, h - hd * ds), (0, w - wd * ds)))
            out = jnp.concatenate([rgb + up * inten, c[3:4]], axis=0)
            target.color = out

        from bevy_tpu.app.main_schedule import Render
        app.add_systems(Render, bloom_pass, in_set=POST_SET,
                        before="tonemap_pass")


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
