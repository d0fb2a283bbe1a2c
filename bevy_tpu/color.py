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


# -- Oklab / Oklch (ref: bevy_color/src/oklaba.rs, oklcha.rs — Björn
# Ottosson's perceptual space; bevy uses it for Color::mix gradients) -----

def linear_to_oklab(rgb):
    """Linear RGB (..., 3) -> Oklab (..., 3) [L, a, b]."""
    rgb = jnp.asarray(rgb, jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    l = 0.4122214708 * r + 0.5363325363 * g + 0.0514459929 * b
    m = 0.2119034982 * r + 0.6806995451 * g + 0.1073969566 * b
    s = 0.0883024619 * r + 0.2817188376 * g + 0.6299787005 * b
    l, m, s = jnp.cbrt(l), jnp.cbrt(m), jnp.cbrt(s)
    return jnp.stack([
        0.2104542553 * l + 0.7936177850 * m - 0.0040720468 * s,
        1.9779984951 * l - 2.4285922050 * m + 0.4505937099 * s,
        0.0259040371 * l + 0.7827717662 * m - 0.8086757660 * s,
    ], axis=-1)


def oklab_to_linear(lab):
    """Oklab (..., 3) -> linear RGB (..., 3) (inverse of linear_to_oklab)."""
    lab = jnp.asarray(lab, jnp.float32)
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    l = (L + 0.3963377774 * a + 0.2158037573 * b) ** 3
    m = (L - 0.1055613458 * a - 0.0638541728 * b) ** 3
    s = (L - 0.0894841775 * a - 1.2914855480 * b) ** 3
    return jnp.stack([
        4.0767416621 * l - 3.3077115913 * m + 0.2309699292 * s,
        -1.2684380046 * l + 2.6097574011 * m - 0.3413193965 * s,
        -0.0041960863 * l - 0.7034186147 * m + 1.7076147010 * s,
    ], axis=-1)


def oklaba(L, a, b, alpha=1.0):
    """Oklab color -> linear RGBA (ref: Oklaba -> LinearRgba From impl)."""
    rgb = oklab_to_linear(jnp.asarray([L, a, b], jnp.float32))
    return jnp.concatenate([rgb, jnp.asarray([alpha], jnp.float32)])


def oklcha(L, c, h, alpha=1.0):
    """Oklch (cylindrical Oklab; hue in degrees) -> linear RGBA (ref:
    Oklcha, bevy_color/src/oklcha.rs)."""
    hr = jnp.deg2rad(jnp.asarray(h, jnp.float32))
    return oklaba(L, c * jnp.cos(hr), c * jnp.sin(hr), alpha)


def mix(c0, c1, t):
    """Perceptual blend of two linear RGBA colors through Oklab (ref:
    Mix::mix — bevy mixes in the color's own space; Oklab gives the
    gradient the reference recommends for smooth ramps)."""
    c0 = jnp.asarray(c0, jnp.float32)
    c1 = jnp.asarray(c1, jnp.float32)
    lab = (1.0 - t) * linear_to_oklab(c0[..., :3]) + \
        t * linear_to_oklab(c1[..., :3])
    a = (1.0 - t) * c0[..., 3:4] + t * c1[..., 3:4]
    return jnp.concatenate([oklab_to_linear(lab), a], axis=-1)


# Named colors (linear RGBA), matching bevy_color::palettes::css values.
WHITE = linear_rgba(1.0, 1.0, 1.0, 1.0)
BLACK = linear_rgba(0.0, 0.0, 0.0, 1.0)
TRANSPARENT = linear_rgba(0.0, 0.0, 0.0, 0.0)
RED = srgba(1.0, 0.0, 0.0)
GREEN = srgba(0.0, 1.0, 0.0)
BLUE = srgba(0.0, 0.0, 1.0)
