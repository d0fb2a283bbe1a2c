"""Buffered messages (reference twin: bevy_ecs message/ — `Message`
`message/mod.rs:100`, `Messages<M>` two-frame ring `message/messages.rs:95`,
`MessageReader`/`MessageWriter` params).

Device layout per message type: each field is a `(2, capacity, *shape)`
array plus `count[2]` and a `cur` buffer index. Writers append into the
current buffer with masked scatters; readers see both frames (current +
previous) like the reference's default reader that never lags more than one
frame. The swap (flip `cur`, clear the new buffer) runs in the frame-final
builtin system (ref: message_update_system).
"""

from __future__ import annotations

import jax.numpy as jnp

from bevy_tpu.ecs._state import set_in
from bevy_tpu.ecs.component import get_spec


def message(cls=None, **kw):
    """Decorator registering a message struct (same field machinery as
    components)."""
    from bevy_tpu.ecs.component import component as _component
    return _component(cls, **kw) if cls is not None else _component(**kw)


class MessageWriter:
    def __init__(self, msg, budget: int = 64):
        self.spec = get_spec(msg)
        self.budget = budget

    def reads(self):
        return set()

    def writes(self):
        return {f"msg:{self.spec.name}"}

    def build(self, state, world, sysctx):
        return MessageWriterView(self, state["msg"][self.spec.name])


class MessageWriterView:
    def __init__(self, param, store):
        self._param = param
        self._store = store
        self._sends = []

    def send(self, count=None, **fields):
        """Queue up to `budget` messages; `count` (traced or int) of them
        real. Field values: (budget, *shape) arrays or broadcastable."""
        self._sends.append((count, fields))

    def send_one(self, **fields):
        self.send(count=1, **fields)

    def merge(self, state, tick):
        if not self._sends:
            return state
        name = self._param.spec.name
        budget = self._param.budget
        store = dict(state["msg"][name])
        fields = dict(store["f"])
        for count, vals in self._sends:
            count = budget if count is None else count
            cur = store["cur"]
            cnt = store["count"][cur]
            lane = jnp.arange(budget, dtype=jnp.int32)
            rows = cnt + lane
            cap = next(iter(fields.values())).shape[1] if fields else 0
            valid = (lane < count) & (rows < cap)
            rows = jnp.where(valid, rows, cap)
            for fname, fld in self._param.spec.fields.items():
                val = vals.get(fname, fld.default)
                val = jnp.broadcast_to(jnp.asarray(val, fld.dtype),
                                       (budget,) + fld.shape)
                fields[fname] = fields[fname].at[cur, rows].set(val, mode="drop")
            added = jnp.sum(valid.astype(jnp.int32))
            store["count"] = store["count"].at[cur].add(added)
            store["t"] = store["t"].at[cur, rows].set(tick, mode="drop")
        store["f"] = fields
        return set_in(state, ("msg", name), store)


class MessageReader:
    def __init__(self, msg):
        self.spec = get_spec(msg)

    def reads(self):
        return {f"msg:{self.spec.name}"}

    def writes(self):
        return set()

    def build(self, state, world, sysctx):
        last_run = state["sys"][sysctx["id"]]["last_run"]
        return MessageReaderView(self.spec, state["msg"][self.spec.name],
                                 last_run)


class MessageReaderView:
    def __init__(self, spec, store, last_run=None):
        self._spec = spec
        self._store = store
        self._last_run = last_run

    def read(self):
        """Returns (fields, mask): each field flattened to (2*capacity, ...)
        with previous-frame rows first, and a validity mask. The mask is
        cursor-filtered: only messages written since this system's last
        run show (ref: MessageCursor, message/messages.rs — each reader
        consumes each message exactly once)."""
        store = self._store
        cur = store["cur"]
        prev = 1 - cur
        order = jnp.stack([prev, cur])
        fields = {}
        cap = 0
        for fname, arr in store["f"].items():
            arr = arr[order]  # (2, cap, ...) with prev first
            cap = arr.shape[1]
            fields[fname] = arr.reshape((2 * cap,) + arr.shape[2:])
        lane = jnp.arange(cap, dtype=jnp.int32)
        counts = store["count"][order]
        mask = jnp.concatenate([lane < counts[0], lane < counts[1]])
        if self._last_run is not None:
            ticks = store["t"][order].reshape(2 * cap)
            mask = mask & (ticks > self._last_run)
        return fields, mask

    def count(self):
        return jnp.sum(self._store["count"])

    def merge(self, state, tick):
        return state


def swap_message_buffers(state):
    """Frame-final swap: flip cur, clear the buffer that becomes current
    (ref: Messages::update)."""
    msgs = {}
    for name, store in state["msg"].items():
        cur = 1 - store["cur"]
        msgs[name] = {
            "f": store["f"],
            "count": store["count"].at[cur].set(0),
            "t": store["t"],
            "cur": cur,
        }
    return set_in(state, ("msg",), msgs)
