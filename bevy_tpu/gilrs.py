"""Gamepad HID backend (reference twin: bevy_gilrs — the gilrs event
pump feeding bevy_input's gamepad state, `bevy_gilrs/src/gilrs_system.rs`).

Linux evdev reader in pure Python: non-blocking reads of
`/dev/input/event*` devices that advertise gamepad keys, decoded into
the engine's host `InputState` (axes normalized to [-1, 1], buttons to
the bevy_input GamepadButton order). Headless hosts without /dev/input
simply get no devices — the frame-input channel keeps its zeros, and
`InputState.set_axis` remains the test/driver path.

The decoder is file-descriptor based, so tests feed synthetic
`input_event` structs through a regular file."""

from __future__ import annotations

import os
import struct
from pathlib import Path

from bevy_tpu.app.plugin import Plugin

# struct input_event { timeval (2 longs); __u16 type; __u16 code; __s32 v }
_EV_FMT = "qqHHi"
_EV_SIZE = struct.calcsize(_EV_FMT)

EV_KEY = 0x01
EV_ABS = 0x03

# evdev BTN_* codes -> bevy GamepadButton order (ref: bevy_input
# gamepad.rs GamepadButton variants; gilrs' btn mapping)
BUTTON_MAP = {
    0x130: 0,   # BTN_SOUTH
    0x131: 1,   # BTN_EAST
    0x134: 2,   # BTN_NORTH (evdev quirk: WEST/NORTH swapped vs letters)
    0x133: 3,   # BTN_WEST
    0x136: 4,   # BTN_TL (left bumper)
    0x137: 5,   # BTN_TR
    0x138: 6,   # BTN_TL2
    0x139: 7,   # BTN_TR2
    0x13A: 8,   # BTN_SELECT
    0x13B: 9,   # BTN_START
    0x13C: 10,  # BTN_MODE
    0x13D: 11,  # BTN_THUMBL
    0x13E: 12,  # BTN_THUMBR
}

# evdev ABS_* -> (bevy axis index, (min, max)) — ranges per the common
# xpad report descriptor; real drivers vary, EVIOCGABS would refine
AXIS_MAP = {
    0x00: (0, (-32768, 32767)),   # ABS_X  -> LeftStickX
    0x01: (1, (-32768, 32767)),   # ABS_Y  -> LeftStickY
    0x03: (2, (-32768, 32767)),   # ABS_RX -> RightStickX
    0x04: (3, (-32768, 32767)),   # ABS_RY -> RightStickY
    0x02: (4, (0, 255)),          # ABS_Z  -> LeftTrigger
    0x05: (5, (0, 255)),          # ABS_RZ -> RightTrigger
    0x10: (6, (-1, 1)),           # ABS_HAT0X -> DPadX
    0x11: (7, (-1, 1)),           # ABS_HAT0Y -> DPadY
}


def decode_events(buf: bytes, input_state, invert_y=True):
    """Apply a batch of raw input_event structs to an InputState.
    Returns the number of events consumed."""
    n = len(buf) // _EV_SIZE
    for i in range(n):
        _, _, etype, code, value = struct.unpack_from(
            _EV_FMT, buf, i * _EV_SIZE)
        if etype == EV_KEY and code in BUTTON_MAP:
            idx = BUTTON_MAP[code]
            if value:
                input_state.gamepad_buttons[idx] = True
            else:
                input_state.gamepad_buttons[idx] = False
        elif etype == EV_ABS and code in AXIS_MAP:
            idx, (lo, hi) = AXIS_MAP[code]
            if lo < 0:
                v = 2.0 * (value - lo) / (hi - lo) - 1.0
            else:
                v = (value - lo) / (hi - lo)
            if invert_y and code in (0x01, 0x04, 0x11):
                v = -v          # evdev y-down -> bevy y-up sticks
            input_state.gamepad_axes[idx] = max(-1.0, min(1.0, v))
    return n


class EvdevGamepad:
    """One open evdev device, drained non-blocking each frame."""

    def __init__(self, path, input_state):
        self.path = str(path)
        self.input_state = input_state
        self.fd = os.open(self.path, os.O_RDONLY | os.O_NONBLOCK)

    def pump(self):
        try:
            while True:
                buf = os.read(self.fd, _EV_SIZE * 64)
                if not buf:
                    return False               # EOF: device gone
                decode_events(buf, self.input_state)
                if len(buf) < _EV_SIZE * 64:
                    return True
        except BlockingIOError:
            return True
        except OSError:
            return False

    def close(self):
        try:
            os.close(self.fd)
        except OSError:
            pass


class GilrsPlugin(Plugin):
    """Host gamepad driver (ref: bevy_gilrs GilrsPlugin). Scans
    /dev/input at build, pumps events into `app.input` before each
    frame's input gather, and drains rumble requests (force feedback
    needs EVIOCSFF ioctls — recorded, not issued, like the WAV audio
    stand-in)."""

    def __init__(self, scan_dir="/dev/input"):
        self.scan_dir = scan_dir
        self.devices = []
        self.rumble_log = []

    def build(self, app):
        state = getattr(app, "input", None)
        if state is None:
            raise RuntimeError("GilrsPlugin requires InputPlugin first")
        root = Path(self.scan_dir)
        if root.is_dir():
            for dev in sorted(root.glob("event*")):
                try:
                    self.devices.append(EvdevGamepad(dev, state))
                except OSError:
                    continue

        def pump(app_):
            self.devices = [d for d in self.devices if d.pump()]
            for r in state.pending_rumble:
                self.rumble_log.append(r)
            state.pending_rumble.clear()

        app.add_frame_hook(pump)
