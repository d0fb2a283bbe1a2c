"""Render core (reference twin: bevy_render + bevy_camera +
bevy_core_pipeline + bevy_sprite(_render) — re-designed TPU-first: extract
is a pure gather over world columns, phases are sort keys, passes are
raster ops over an HBM framebuffer; the whole frame stays in one jit).
"""

from bevy_tpu.render.camera import Camera2d, OrthographicProjection  # noqa: F401
from bevy_tpu.render.plugin import (  # noqa: F401
    RenderPlugin, RenderTarget, ClearColor,
)
from bevy_tpu.render.sprite import (  # noqa: F401
    Anchor, Sprite, SpritePlugin, sprite_from_handle,
)
from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas  # noqa: F401
