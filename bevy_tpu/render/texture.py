"""Texture atlas (reference twin: bevy_image texture_atlas*.rs + the
GpuImage upload path of bevy_render/src/render_asset.rs).

All sprite textures live in ONE device-resident atlas array (AH, AW, 4)
linear f32 — the TPU equivalent of bindless texture arrays: raster kernels
index it with uv rects, no per-texture bind groups. Packing happens host-side
at build time (shelf packing, like the reference's TextureAtlasBuilder).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from bevy_tpu.color import srgb_to_linear


class TextureAtlas:
    """Resource name + handle vocabulary for the packed atlas."""
    RESOURCE = "texture_atlas"


class AtlasBuilder:
    """Host-side shelf packer (ref: TextureAtlasBuilder,
    bevy_image/src/texture_atlas_builder.rs). add() returns a handle dict
    usable directly as Sprite uv fields."""

    def __init__(self, width: int = 1024, height: int = 1024):
        self.width = width
        self.height = height
        self.data = np.zeros((height, width, 4), np.float32)
        self._shelf_y = 0
        self._shelf_h = 0
        self._cursor_x = 0
        self.handles: Dict[str, dict] = {}
        self._count = 0

    def add(self, image: np.ndarray, name: str = None, srgb: bool = True) -> dict:
        """Pack an (h, w, 3|4) image (u8 or float). Returns
        {'tex', 'uv_min', 'uv_max', 'size'}."""
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img.astype(np.float32)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones(img.shape[:2] + (1,), np.float32)], -1)
        if srgb:
            img = np.concatenate(
                [np.asarray(srgb_to_linear(img[..., :3])), img[..., 3:]], -1)
        h, w = img.shape[:2]
        if self._cursor_x + w > self.width:
            self._shelf_y += self._shelf_h
            self._cursor_x = 0
            self._shelf_h = 0
        if self._shelf_y + h > self.height or w > self.width:
            raise ValueError(f"atlas full packing {w}x{h}")
        x, y = self._cursor_x, self._shelf_y
        self.data[y:y + h, x:x + w] = img
        self._cursor_x += w
        self._shelf_h = max(self._shelf_h, h)
        handle = {
            "tex": self._count,
            "uv_min": (x / self.width, y / self.height),
            "uv_max": ((x + w) / self.width, (y + h) / self.height),
            "size": (float(w), float(h)),
        }
        self._count += 1
        if name:
            self.handles[name] = handle
        return handle

    def add_solid(self, name: str = None) -> dict:
        """A 1x1 white texel — the reference's fallback white GpuImage."""
        return self.add(np.ones((1, 1, 4), np.float32), name, srgb=False)

    def grid(self, handle: dict, cols: int, rows: int, index: int) -> dict:
        """Sub-rect of a packed sheet (ref: TextureAtlasLayout::from_grid)."""
        u0, v0 = handle["uv_min"]
        u1, v1 = handle["uv_max"]
        du, dv = (u1 - u0) / cols, (v1 - v0) / rows
        c, r = index % cols, index // cols
        return {
            "tex": handle["tex"],
            "uv_min": (u0 + c * du, v0 + r * dv),
            "uv_max": (u0 + (c + 1) * du, v0 + (r + 1) * dv),
            "size": (handle["size"][0] / cols, handle["size"][1] / rows),
        }

    def build(self) -> jnp.ndarray:
        """Device atlas array. Install as the TextureAtlas resource:
        app.insert_resource(TextureAtlas.RESOURCE, {'data': builder.build()})"""
        return jnp.asarray(self.data)


def checkerboard(size: int = 64, cells: int = 8,
                 c0=(1.0, 1.0, 1.0, 1.0), c1=(0.0, 0.0, 0.0, 1.0)) -> np.ndarray:
    """Deterministic test texture."""
    yy, xx = np.mgrid[0:size, 0:size]
    m = ((yy // (size // cells)) + (xx // (size // cells))) % 2
    out = np.where(m[..., None] > 0, np.asarray(c1, np.float32),
                   np.asarray(c0, np.float32))
    return out
