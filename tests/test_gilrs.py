"""Gamepad HID backend (ref model: bevy_gilrs event pump → bevy_input
gamepad state). The evdev decoder is fd-based, so these tests feed
synthetic `input_event` structs through a regular file."""

import struct

import numpy as np

from bevy_tpu import App
from bevy_tpu.gilrs import (
    _EV_FMT, EV_ABS, EV_KEY, EvdevGamepad, GilrsPlugin, decode_events,
)
from bevy_tpu.input import InputPlugin, InputState
from bevy_tpu.time import TimePlugin


def _ev(etype, code, value):
    return struct.pack(_EV_FMT, 0, 0, etype, code, value)


def test_decode_buttons_and_axes():
    st = InputState()
    buf = (_ev(EV_KEY, 0x130, 1) +          # south pressed
           _ev(EV_ABS, 0x00, 32767) +       # left stick x full right
           _ev(EV_ABS, 0x01, -32768) +      # left stick y full up(evdev)
           _ev(EV_ABS, 0x02, 255) +         # left trigger full
           _ev(EV_ABS, 0x10, -1))           # dpad left
    assert decode_events(buf, st) == 5
    assert st.gamepad_buttons[0]
    assert abs(st.gamepad_axes[0] - 1.0) < 1e-5
    assert abs(st.gamepad_axes[1] - 1.0) < 1e-5      # y inverted -> up
    assert abs(st.gamepad_axes[4] - 1.0) < 1e-5
    assert abs(st.gamepad_axes[6] + 1.0) < 1e-5
    decode_events(_ev(EV_KEY, 0x130, 0), st)
    assert not st.gamepad_buttons[0]


def test_evdev_device_pump_from_file(tmp_path):
    st = InputState()
    f = tmp_path / "event7"
    f.write_bytes(_ev(EV_KEY, 0x13B, 1) + _ev(EV_ABS, 0x03, 16384))
    dev = EvdevGamepad(f, st)
    alive = dev.pump()
    assert st.gamepad_buttons[9]             # start pressed
    assert st.gamepad_axes[2] > 0.4
    # regular file hits EOF after the events -> device reported gone
    assert alive is False or dev.pump() is False
    dev.close()


def test_plugin_scans_and_pumps(tmp_path):
    (tmp_path / "event0").write_bytes(_ev(EV_KEY, 0x131, 1))
    app = App(capacity=8)
    plugin = GilrsPlugin(scan_dir=str(tmp_path))
    app.add_plugins(TimePlugin(), InputPlugin(), plugin)
    app.input.rumble(strength=0.5, duration=0.1)
    app.update(dt=1 / 60)
    assert app.input.gamepad_buttons[1]      # east pressed via the pump
    assert len(plugin.rumble_log) == 1       # rumble drained
    app.update(dt=1 / 60)   # next gather carries it to the device tier
    kb = app.world.state["res"]["gamepad"]
    pressed = np.asarray(kb["pressed"])
    assert bool(pressed[1])                  # reached the device columns
