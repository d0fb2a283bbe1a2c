"""Remote protocol (reference twin: bevy_remote — BRP, JSON-RPC 2.0 over
HTTP `src/http.rs`, builtin methods `src/builtin_methods.rs:45`: world.query,
world.get_components, world.insert_components, world.spawn_entity,
world.despawn_entity, world.list_components, rpc.discover).

Host-side: reads answer from the world snapshot immediately; mutations
queue and apply between frames on the main thread (the reference's
command-queue position), with the HTTP thread blocking on the result.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import ComponentInstance, _REGISTRY


class _Pending:
    def __init__(self, fn):
        self.fn = fn
        self.done = threading.Event()
        self.result = None
        self.error = None


class RemoteServer:
    def __init__(self, app, port: int = 15702):
        self.app = app
        self.port = port
        self.queue: list[_Pending] = []
        self.lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(length))
                    result = server.dispatch(req.get("method", ""),
                                             req.get("params") or {})
                    body = {"jsonrpc": "2.0", "id": req.get("id"),
                            "result": result}
                except Exception as e:  # noqa: BLE001 — reported to client
                    body = {"jsonrpc": "2.0", "id": None,
                            "error": {"code": -32603, "message": str(e)}}
                data = json.dumps(body).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()

    # -- main-thread pump (frame hook) -----------------------------------
    def pump(self):
        with self.lock:
            pending, self.queue = self.queue, []
        for p in pending:
            try:
                p.result = p.fn()
            except Exception as e:  # noqa: BLE001
                p.error = e
            p.done.set()

    def _on_main(self, fn, timeout=10.0):
        p = _Pending(fn)
        with self.lock:
            self.queue.append(p)
        if not p.done.wait(timeout):
            raise TimeoutError("main thread did not pump remote queue")
        if p.error:
            raise p.error
        return p.result

    # -- methods (ref: builtin_methods.rs) --------------------------------
    def dispatch(self, method: str, params: dict):
        world = self.app.world
        if method == "rpc.discover":
            return {"methods": ["world.query", "world.get_components",
                                "world.insert_components",
                                "world.remove_components",
                                "world.mutate_component",
                                "world.spawn_entity", "world.despawn_entity",
                                "world.reparent_entities",
                                "world.watch_components",
                                "world.list_components",
                                "registry.schemas", "rpc.discover"]}
        if method == "world.list_components":
            return sorted(world.specs.keys())
        if method == "world.query":
            comps = params.get("components", [])
            rows = world.query_rows(*[self._spec(world, c) for c in comps]) \
                if comps else np.flatnonzero(world._sync() or world._host_alive)
            out = []
            for row in rows.tolist():
                entry = {"entity": int(row)}
                if params.get("fetch", True):
                    entry["components"] = {
                        c: self._get(world, row, c) for c in comps}
                out.append(entry)
            return out
        if method == "world.get_components":
            row = int(params["entity"])
            return {c: self._get(world, row, c)
                    for c in params["components"]}
        if method == "world.insert_components":
            row = int(params["entity"])

            def do():
                for name, fields in params["components"].items():
                    spec = self._spec(self.app.world, name)
                    self.app.world.insert(row, ComponentInstance(spec, {
                        f: np.asarray(v) for f, v in fields.items()}))
                return True
            return self._on_main(do)
        if method == "world.remove_components":
            # ref: builtin_methods.rs world.remove_components
            row = int(params["entity"])

            def do():
                specs = [self._spec(self.app.world, c)
                         for c in params["components"]]
                self.app.world.remove(row, *specs)
                return True
            return self._on_main(do)
        if method == "world.mutate_component":
            # ref: builtin_methods.rs world.mutate_component — set one
            # FIELD of one component without replacing the rest
            row = int(params["entity"])

            def do():
                spec = self._spec(self.app.world, params["component"])
                current = {
                    f: np.asarray(self._get(
                        self.app.world, row, params["component"])[f])
                    for f in spec.fields}
                current[params["path"]] = np.asarray(params["value"])
                self.app.world.insert(
                    row, ComponentInstance(spec, current))
                return True
            return self._on_main(do)
        if method == "world.spawn_entity":
            def do():
                insts = []
                for name, fields in params.get("components", {}).items():
                    spec = self._spec(self.app.world, name)
                    insts.append(ComponentInstance(spec, {
                        f: np.asarray(v) for f, v in fields.items()}))
                e = self.app.world.spawn(*insts)
                return {"entity": e.index, "generation": e.generation}
            return self._on_main(do)
        if method == "world.despawn_entity":
            return self._on_main(
                lambda: bool(self.app.world.despawn(int(params["entity"]))))
        if method == "world.reparent_entities":
            def do():
                from bevy_tpu.transform import set_parent
                parent = int(params["parent"])
                for child in params["entities"]:
                    set_parent(self.app.world, int(child), parent)
                return True
            return self._on_main(do)
        if method == "world.watch_components":
            # long-poll watch (ref: the +watch streaming variants of
            # builtin_methods.rs): returns immediately when the caller's
            # `version` is stale, otherwise blocks until the values
            # change or `timeout` elapses
            import hashlib
            import json as _json
            import time as _time
            row = int(params["entity"])
            comps = params["components"]
            deadline = _time.monotonic() + float(params.get("timeout", 5.0))
            last = params.get("version")
            ver = last or ""
            while True:
                try:
                    vals = {c: self._get(world, row, c) for c in comps}
                    ver = hashlib.sha1(_json.dumps(
                        vals, sort_keys=True).encode()).hexdigest()
                except Exception:
                    # the app thread may be mid-update; retry next poll
                    vals = None
                if vals is not None and ver != last:
                    return {"components": vals, "version": ver}
                if _time.monotonic() >= deadline:
                    return {"components": None, "version": ver}
                _time.sleep(0.05)
        if method == "registry.schemas":
            # JSON-schema-ish export of registered component layouts
            # (ref: bevy_remote/src/schemas)
            out = {}
            for name, spec in sorted(world.specs.items()):
                fields = {}
                for fname, fspec in spec.fields.items():
                    fields[fname] = {
                        "shape": list(fspec.shape),
                        "dtype": np.dtype(fspec.dtype).name,
                        "entity_ref": bool(fspec.entity_ref),
                    }
                out[name] = {"fields": fields}
            return out
        raise ValueError(f"unknown method '{method}'")

    @staticmethod
    def _spec(world, name: str):
        if name in world.specs:
            return world.specs[name]
        for cls, s in _REGISTRY.items():
            if s.name == name:
                return world.register_component(s)
        raise KeyError(f"unknown component '{name}'")

    @staticmethod
    def _get(world, row: int, name: str):
        import jax
        store = world.state["comp"][name]["f"]
        return {f: np.asarray(jax.device_get(a[row])).tolist()
                for f, a in store.items()}

    def shutdown(self):
        self.httpd.shutdown()


class RemotePlugin(Plugin):
    """ref: RemotePlugin + RemoteHttpPlugin (default port 15702; pass 0 for
    an ephemeral port — read it from `app.remote.port`)."""

    def __init__(self, port: int = 15702):
        self.port = port

    def build(self, app):
        server = RemoteServer(app, self.port)
        app.remote = server
        app.add_frame_hook(lambda a: server.pump())
