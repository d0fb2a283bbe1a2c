"""Remote protocol tests (ref model: bevy_remote builtin methods over
JSON-RPC HTTP)."""

import json
import threading
import time
import urllib.request

import jax.numpy as jnp

from bevy_tpu import App, component, field
from bevy_tpu.remote import RemotePlugin
from bevy_tpu.time import TimePlugin


@component
class Hp:
    value = field((), jnp.float32, default=10.0)


def _rpc(port, method, params=None, id_=1):
    body = json.dumps({"jsonrpc": "2.0", "id": id_, "method": method,
                       "params": params or {}}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read())


def test_brp_query_and_mutation_roundtrip():
    app = App(capacity=32)
    app.add_plugins(TimePlugin(), RemotePlugin(port=0))
    e = app.world.spawn(Hp(value=42.0))
    app.update(dt=1 / 60)
    port = app.remote.port

    # discover + list
    assert "world.query" in _rpc(port, "rpc.discover")["result"]["methods"]
    assert "hp" in _rpc(port, "world.list_components")["result"]

    # query reads live values
    rows = _rpc(port, "world.query", {"components": ["hp"]})["result"]
    assert rows[0]["entity"] == e.index
    assert rows[0]["components"]["hp"]["value"] == 42.0

    # mutations apply between frames (pumped on the main thread)
    done = {}

    def client():
        done["spawn"] = _rpc(port, "world.spawn_entity",
                             {"components": {"hp": {"value": 7.0}}})["result"]
        done["insert"] = _rpc(port, "world.insert_components",
                              {"entity": e.index,
                               "components": {"hp": {"value": 1.0}}})["result"]

    t = threading.Thread(target=client)
    t.start()
    deadline = time.time() + 10
    while t.is_alive() and time.time() < deadline:
        app.update(dt=1 / 60)   # pumps the remote queue
    t.join(timeout=1)
    assert done["spawn"]["entity"] >= 0
    assert done["insert"] is True
    assert app.world.entity_count(Hp) == 2
    assert float(app.world.get(e, Hp).value) == 1.0

    # despawn via rpc
    def client2():
        done["despawn"] = _rpc(port, "world.despawn_entity",
                               {"entity": done["spawn"]["entity"]})["result"]

    t2 = threading.Thread(target=client2)
    t2.start()
    while t2.is_alive() and time.time() < deadline:
        app.update(dt=1 / 60)
    t2.join(timeout=1)
    assert done["despawn"] is True
    assert app.world.entity_count(Hp) == 1
