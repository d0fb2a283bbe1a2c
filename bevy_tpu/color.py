"""Color spaces & conversions (reference twin: bevy_color — Srgba,
LinearRgba, Hsla, Oklaba; `crates/bevy_color/src/`).

All rendering math happens in linear RGBA f32 (as the reference's
LinearRgba). sRGB encode/decode uses the exact IEC 61966-2-1 transfer
function (ref: bevy_color/src/srgba.rs gamma functions) so output images
match the wgpu swapchain encode bit-for-bit within fp tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(c):
    """Per-channel sRGB EOTF (ref: Srgba::gamma_function_inverse)."""
    c = jnp.asarray(c, jnp.float32)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    """Per-channel sRGB OETF (ref: Srgba::gamma_function)."""
    c = jnp.asarray(c, jnp.float32)
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def srgba(r, g, b, a=1.0):
    """sRGB-encoded color -> linear RGBA (ref: Color::srgb)."""
    rgb = srgb_to_linear(jnp.asarray([r, g, b], jnp.float32))
    return jnp.concatenate([rgb, jnp.asarray([a], jnp.float32)])


def linear_rgba(r, g, b, a=1.0):
    return jnp.asarray([r, g, b, a], jnp.float32)


def hsla(h, s, l, a=1.0):
    """HSL -> linear RGBA (ref: bevy_color/src/hsla.rs -> Srgba)."""
    h = (h % 360.0) / 60.0
    c = (1.0 - abs(2.0 * l - 1.0)) * s
    x = c * (1.0 - abs(h % 2.0 - 1.0))
    m = l - c / 2.0
    idx = int(h) % 6
    table = [(c, x, 0.0), (x, c, 0.0), (0.0, c, x),
             (0.0, x, c), (x, 0.0, c), (c, 0.0, x)]
    r, g, b = table[idx]
    return srgba(r + m, g + m, b + m, a)


def image_to_srgb_u8(img):
    """(H, W, 4) linear f32 -> (H, W, 4) sRGB u8 for host-side viewing /
    golden comparison (the swapchain-encode position, ref:
    bevy_render upscaling/blit into an Rgba8UnormSrgb surface)."""
    rgb = linear_to_srgb(img[..., :3])
    a = jnp.clip(img[..., 3:4], 0.0, 1.0)
    out = jnp.concatenate([rgb, a], axis=-1)
    return jnp.asarray(jnp.round(out * 255.0), jnp.uint8)


# Named colors (linear RGBA), matching bevy_color::palettes::css values.
WHITE = linear_rgba(1.0, 1.0, 1.0, 1.0)
BLACK = linear_rgba(0.0, 0.0, 0.0, 1.0)
TRANSPARENT = linear_rgba(0.0, 0.0, 0.0, 0.0)
RED = srgba(1.0, 0.0, 0.0)
GREEN = srgba(0.0, 1.0, 0.0)
BLUE = srgba(0.0, 0.0, 1.0)
