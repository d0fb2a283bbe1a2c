"""Plugin protocol (reference twin: bevy_app plugin.rs:57 — build/ready/
finish/cleanup phases; PluginGroup)."""


class Plugin:
    def build(self, app):
        raise NotImplementedError

    def ready(self, app) -> bool:
        return True

    def finish(self, app):
        pass

    def cleanup(self, app):
        pass

    @property
    def name(self):
        return type(self).__name__


class PluginGroup:
    """An ordered list of plugins (ref: plugin_group.rs)."""

    def plugins(self):
        raise NotImplementedError

    def build(self, app):
        for p in self.plugins():
            app.add_plugins(p)
