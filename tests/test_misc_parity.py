"""Contact shadows, system-info diagnostics, function reflection
(ref models: bevy_pbr contact shadows, SystemInformationDiagnosticsPlugin,
bevy_reflect func)."""

import numpy as np
import pytest


def test_function_registry():
    from bevy_tpu.reflect_fn import FunctionRegistry

    reg = FunctionRegistry()

    @reg.register(name="math::add")
    def add(a: float, b: float = 1.0) -> float:
        """Adds."""
        return a + b

    assert reg.contains("math::add")
    assert reg.call("math::add", 2.0, 3.0) == 5.0
    assert reg.call("math::add", 2.0) == 3.0
    info = reg.info("math::add").describe()
    assert info["args"][0]["type"] == "float"
    assert info["args"][1]["default"] == 1.0
    assert info["return"] == "float"
    with pytest.raises(TypeError):
        reg.call("math::add")
    with pytest.raises(KeyError):
        reg.call("math::sub", 1)


def test_sysinfo_diagnostics():
    from bevy_tpu import App
    from bevy_tpu.diagnostic import SystemInfoDiagnosticsPlugin
    from bevy_tpu.time import TimePlugin

    app = App(capacity=8)
    app.add_plugins(TimePlugin(), SystemInfoDiagnosticsPlugin(every=1))
    for _ in range(3):
        app.update(dt=1 / 60)
    mem = app.diagnostics.get(SystemInfoDiagnosticsPlugin.MEM_USAGE)
    assert mem is not None and mem.value is not None
    assert 0.0 < float(mem.value) < 100.0
    cpu = app.diagnostics.get(SystemInfoDiagnosticsPlugin.CPU_USAGE)
    assert cpu.value is None or 0.0 <= float(cpu.value) <= 100.0


def test_contact_shadows_darken_crevice():
    from bevy_tpu import App
    from bevy_tpu.render import RenderPlugin
    from bevy_tpu.render.camera import Camera3d
    from bevy_tpu.render.contact_shadows import ContactShadowsPlugin
    from bevy_tpu.render.deferred import DeferredLightingPlugin
    from bevy_tpu.render.mesh import cuboid
    from bevy_tpu.render.mesh3d import (
        AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
    )
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    def scene(cs):
        app = App(capacity=32)
        plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
        cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
        plugins = [TimePlugin(), TransformPlugin(),
                   RenderPlugin(width=160, height=96), plugin,
                   DeferredLightingPlugin(backend="pallas_interpret")]
        if cs:
            plugins.append(ContactShadowsPlugin(length=1.2, strength=0.8))
        app.add_plugins(*plugins)
        app.insert_resource(AmbientLight(brightness=0.15))
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                        *transform_bundle(translation=(0.0, -0.55, 0.0),
                                          scale=(12.0, 0.1, 12.0)))
        # a box sitting on the floor: its base should get contact-darkened
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.5, 0.4, 1.0)),
                        *transform_bundle(translation=(0.0, 0.0, -1.0)))
        # light from the side so the floor next to the box occludes rays
        app.world.spawn(DirectionalLight(illuminance=1.0),
                        *transform_bundle(rotation=(-0.2, 0.5, 0.1, 0.84)))
        app.world.spawn(Camera3d(), *transform_bundle(
            translation=(0.0, 2.0, 3.0), rotation=(-0.25, 0.0, 0.0, 0.97)))
        app.update(dt=1 / 60)
        return frame_image(app).astype(int)

    off = scene(False)
    on = scene(True)
    diff = off[..., :3].sum(-1) - on[..., :3].sum(-1)
    # some pixels darken, most of the frame doesn't
    assert diff.max() > 40, diff.max()
    assert (diff > 20).mean() < 0.5
