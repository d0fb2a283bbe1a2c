from bevy_tpu.app.app import App, AppExit  # noqa: F401
from bevy_tpu.app.plugin import Plugin, PluginGroup  # noqa: F401
