"""Device kernels (the position WESL compute/raster shaders hold in the
reference — see SURVEY.md §2.8 item 6). Pure-jnp reference implementations
live beside Pallas fast paths; tests assert they agree."""

from bevy_tpu.ops.binning import expand_runs, tile_segments  # noqa: F401
