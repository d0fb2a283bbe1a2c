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


def test_brp_watch_and_schemas():
    app = App(capacity=32)
    app.add_plugins(TimePlugin(), RemotePlugin(port=0))
    e = app.world.spawn(Hp(value=1.0))
    app.update(dt=1 / 60)
    port = app.remote.port
    row = e.index if hasattr(e, "index") else e

    # schemas export registered layouts (ref: registry.schemas)
    sch = _rpc(port, "registry.schemas")["result"]
    assert sch["hp"]["fields"]["value"]["dtype"] == "float32"

    # first watch returns immediately with a version
    r1 = _rpc(port, "world.watch_components",
              {"entity": row, "components": ["hp"], "timeout": 2.0})
    v1 = r1["result"]["version"]
    assert r1["result"]["components"]["hp"]["value"] == 1.0

    # unchanged → times out with components None
    r2 = _rpc(port, "world.watch_components",
              {"entity": row, "components": ["hp"], "version": v1,
               "timeout": 0.3})
    assert r2["result"]["components"] is None

    # change from another thread while a watch blocks
    def change():
        time.sleep(0.2)
        app.world.insert(row, Hp(value=7.0))
        app.update(dt=1 / 60)

    t = threading.Thread(target=change)
    t.start()
    r3 = _rpc(port, "world.watch_components",
              {"entity": row, "components": ["hp"], "version": v1,
               "timeout": 5.0})
    t.join()
    assert r3["result"]["components"]["hp"]["value"] == 7.0
    app.remote.shutdown()


def test_brp_reparent():
    from bevy_tpu.transform import ChildOf, TransformPlugin
    import numpy as np

    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin(), RemotePlugin(port=0))
    p = app.world.spawn(Hp())
    c = app.world.spawn(Hp())
    app.update(dt=1 / 60)
    port = app.remote.port
    prow = p.index if hasattr(p, "index") else p
    crow = c.index if hasattr(c, "index") else c

    done = {}

    def client():
        done["r"] = _rpc(port, "world.reparent_entities",
                         {"parent": prow, "entities": [crow]})

    t = threading.Thread(target=client)
    t.start()
    for _ in range(50):
        app.update(dt=1 / 60)
        if done:
            break
    t.join(timeout=5)
    assert done["r"]["result"] is True
    assert int(app.world.get(crow, ChildOf).parent) == prow
    app.remote.shutdown()


def test_brp_remove_and_mutate_component():
    """world.remove_components + world.mutate_component (ref:
    builtin_methods.rs). Mutations pump on the main thread between
    frames, so the RPCs issue from a client thread."""
    app = App(capacity=32)
    app.add_plugins(TimePlugin(), RemotePlugin(port=0))
    e = app.world.spawn(Hp(value=7.0))
    app.update(dt=1 / 60)
    port = app.remote.port
    done = {}

    def client():
        done["mutate"] = _rpc(port, "world.mutate_component",
                              {"entity": e.index, "component": "hp",
                               "path": "value", "value": 99.0})["result"]
        done["got"] = _rpc(port, "world.get_components",
                           {"entity": e.index,
                            "components": ["hp"]})["result"]
        done["remove"] = _rpc(port, "world.remove_components",
                              {"entity": e.index,
                               "components": ["hp"]})["result"]
        done["rows"] = _rpc(port, "world.query",
                            {"components": ["hp"]})["result"]

    t = threading.Thread(target=client)
    t.start()
    deadline = time.time() + 15
    while t.is_alive() and time.time() < deadline:
        app.update(dt=1 / 60)
    t.join(timeout=1)
    assert done["mutate"] is True
    assert done["got"]["hp"]["value"] == 99.0
    assert done["remove"] is True
    assert all(r["entity"] != e.index for r in done["rows"])
