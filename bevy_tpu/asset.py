"""Assets (reference twin: bevy_asset — AssetServer::load returning typed
handles immediately with IO on a pool `src/server/mod.rs:364,588`,
Assets<A> storage `src/assets.rs:288`, AssetLoader registry by extension
`src/loader.rs:32`, file-watcher hot reload `src/io/file/`).

Host-side by design (asset IO never belongs in the jit): loads run on a
thread pool, handles resolve when done, and an optional watcher polls
mtimes to hot-reload (the notify-based watcher's polling cousin).
Loaded CPU assets feed device uploads (atlas build, mesh pools) explicitly.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Callable, Dict

import numpy as np

from bevy_tpu.app.plugin import Plugin


class LoadState:
    NOT_LOADED = "not_loaded"
    LOADING = "loading"
    LOADED = "loaded"
    FAILED = "failed"


class Handle:
    """Typed-ish handle, valid immediately (ref: Handle<A>)."""

    __slots__ = ("id", "path")

    def __init__(self, id_: int, path: str):
        self.id = id_
        self.path = path

    def __repr__(self):
        return f"Handle({self.id}, {self.path!r})"


def _load_image(path: Path):
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGBA"), np.uint8)
    return img


def _load_json(path: Path):
    return json.loads(path.read_text())


def _load_npy(path: Path):
    return np.load(path)


def _load_scene(path: Path):
    from bevy_tpu.scene import Scene
    return Scene(json.loads(path.read_text()))


def _load_hdr(path: Path):
    from bevy_tpu.image import load_hdr
    return load_hdr(path)


def _load_exr(path: Path):
    from bevy_tpu.image import load_exr
    return load_exr(path)


def _load_ktx2(path: Path):
    from bevy_tpu.image import load_ktx2
    return load_ktx2(path)


def _load_dds(path: Path):
    from bevy_tpu.image import load_dds
    return load_dds(path)


def _load_glb(path: Path):
    from bevy_tpu.gltf import load_glb
    return load_glb(path)


def _load_gltf_text(path: Path):
    from bevy_tpu.gltf import load_gltf
    return load_gltf(path)


DEFAULT_LOADERS = {
    ".png": _load_image, ".jpg": _load_image, ".jpeg": _load_image,
    ".bmp": _load_image, ".webp": _load_image,
    # extended codecs (ref: bevy_image ktx2/dds/hdr/exr loaders)
    ".hdr": _load_hdr, ".exr": _load_exr,
    ".ktx2": _load_ktx2, ".dds": _load_dds,
    ".json": _load_json, ".npy": _load_npy,
    ".scene": _load_scene,   # bevy_tpu world snapshots (see bevy_tpu.scene)
    ".glb": _load_glb, ".gltf": _load_gltf_text,
}


class LoadedAsset:
    """A loader result carrying labeled sub-assets and dependency paths
    (ref: bevy_asset's LoadedAsset + labeled sub-asset mechanism,
    `src/loader.rs` + `server/mod.rs:588` — `load("x.glb#Scene0")`).
    Plain return values are wrapped as LoadedAsset(value)."""

    __slots__ = ("value", "labels", "dependencies")

    def __init__(self, value, labels: Dict[str, Any] = None,
                 dependencies=None):
        self.value = value
        self.labels = labels or {}
        self.dependencies = list(dependencies or [])


class AssetServer:
    """ref: AssetServer + Assets<A> + AssetProcessor's invalidation (mtime
    based). `load` is async (IoTaskPool position); `load_sync` blocks.

    Paths support multi-source prefixes (ref: AssetSource registry,
    `bevy_asset/src/io/source.rs`): `embedded://x` (bytes registered via
    `add_embedded`, the `embedded_asset!` position), `memory://x`
    (runtime byte store), `http(s)://…` (urllib fetch — raises a clear
    error in zero-egress environments), and bare paths from the file
    root. `path#label` addresses labeled sub-assets of the loaded asset
    (gltf-style). Loaders may return `LoadedAsset(value, labels=…,
    dependencies=[paths])` — dependencies load recursively and gate
    `loaded_with_dependencies`."""

    def __init__(self, root: str = "assets", workers: int = 4,
                 watch: bool = False, processed: str = None):
        self.root = Path(root)
        # processor-gated reads (ref: io/processor_gated.rs): when a
        # processed tree is given, artifacts there shadow raw sources
        self.processed = None if processed is None else Path(processed)
        self.pool = ThreadPoolExecutor(max_workers=workers)
        self.loaders: Dict[str, Callable] = dict(DEFAULT_LOADERS)
        self._assets: Dict[int, Any] = {}
        self._labels: Dict[int, Dict[str, Any]] = {}
        self._deps: Dict[int, list] = {}
        self._state: Dict[int, str] = {}
        self._futures: Dict[int, Any] = {}
        self._mtimes: Dict[int, float] = {}
        self._by_path: Dict[str, Handle] = {}
        self._embedded: Dict[str, bytes] = {}
        self._memory: Dict[str, bytes] = {}
        self._next = 0
        self.watch = watch
        self.events = []   # (kind, handle) — 'loaded' | 'modified' | 'failed'

    def register_loader(self, ext: str, fn: Callable):
        self.loaders[ext] = fn

    def add_embedded(self, path: str, data: bytes):
        """Register in-binary bytes under `embedded://path` (ref: the
        embedded AssetReader / embedded_asset! macro)."""
        self._embedded[path] = bytes(data)

    def add_memory(self, path: str, data: bytes):
        """Register runtime bytes under `memory://path` (ref: the
        memory AssetReader)."""
        self._memory[path] = bytes(data)

    def _resolve(self, path: str) -> Path:
        p = Path(path)
        if p.is_absolute():
            return p
        if self.processed is not None:
            # exact artifact, or one with a rewritten suffix (the
            # processor may transcode, e.g. .png → .npy)
            cand = self.processed / p
            if cand.exists():
                return cand
            matches = sorted(cand.parent.glob(p.stem + ".*")) \
                if cand.parent.exists() else []
            matches = [m for m in matches
                       if not m.name.endswith(".meta.json")]
            if matches:
                return matches[0]
        return self.root / p

    def load(self, path: str) -> Handle:
        if path in self._by_path:
            return self._by_path[path]
        h = Handle(self._next, path)
        self._next += 1
        self._by_path[path] = h
        self._state[h.id] = LoadState.LOADING
        self._futures[h.id] = self.pool.submit(self._do_load, h)
        return h

    def load_sync(self, path: str) -> Any:
        h = self.load(path)
        self._futures[h.id].result()
        if self._state[h.id] == LoadState.FAILED:
            raise IOError(f"failed to load {path}: {self._assets.get(h.id)}")
        return self._assets[h.id]

    def _read_source(self, path: str):
        """Multi-source read → (local Path, suffix). Byte-backed sources
        spill to a temp file so every loader (they take paths) works
        uniformly."""
        import tempfile
        for prefix, store in (("embedded://", self._embedded),
                              ("memory://", self._memory)):
            if path.startswith(prefix):
                key = path[len(prefix):]
                if key not in store:
                    raise FileNotFoundError(f"{path} not registered")
                suffix = Path(key).suffix
                tf = tempfile.NamedTemporaryFile(
                    suffix=suffix, delete=False)
                tf.write(store[key])
                tf.close()
                return Path(tf.name), suffix
        if path.startswith(("http://", "https://")):
            import urllib.request
            suffix = Path(path.split("?")[0]).suffix
            try:
                with urllib.request.urlopen(path, timeout=10) as r:
                    data = r.read()
            except Exception as e:
                raise IOError(
                    f"http asset source unreachable ({e}); this "
                    "environment may have no egress") from e
            tf = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
            tf.write(data)
            tf.close()
            return Path(tf.name), suffix
        p = self._resolve(path)
        return p, p.suffix

    def _do_load(self, h: Handle):
        try:
            base, label = (h.path.split("#", 1) + [None])[:2] \
                if "#" in h.path else (h.path, None)
            p, suffix = self._read_source(base)
            loader = self.loaders.get(suffix.lower())
            if loader is None:
                raise ValueError(f"no loader for '{suffix}'")
            asset = loader(p)
            if isinstance(asset, LoadedAsset):
                self._labels[h.id] = asset.labels
                self._deps[h.id] = [self.load(d)
                                    for d in asset.dependencies]
                asset = asset.value
            if label is not None:
                labels = self._labels.get(h.id, {})
                if label not in labels:
                    raise KeyError(
                        f"no labeled sub-asset '{label}' in {base} "
                        f"(have: {sorted(labels)})")
                asset = labels[label]
            self._assets[h.id] = asset
            try:
                self._mtimes[h.id] = p.stat().st_mtime
            except OSError:
                pass
            self._state[h.id] = LoadState.LOADED
            self.events.append(("loaded", h))
        except Exception as e:  # noqa: BLE001 — reported via load_state
            self._assets[h.id] = e
            self._state[h.id] = LoadState.FAILED
            self.events.append(("failed", h))

    def get(self, handle: Handle):
        return self._assets.get(handle.id) \
            if self._state.get(handle.id) == LoadState.LOADED else None

    def get_labeled(self, handle: Handle, label: str):
        """Labeled sub-asset of a loaded asset (ref: the `path#label`
        sub-asset addressing of AssetServer::load)."""
        return self._labels.get(handle.id, {}).get(label)

    def load_state_with_dependencies(self, handle: Handle) -> str:
        """LOADED only when the asset AND its declared dependencies are
        loaded (ref: LoadedWithDependencies / recursive dependency
        state, server/mod.rs)."""
        st = self._state.get(handle.id, LoadState.NOT_LOADED)
        if st != LoadState.LOADED:
            return st
        for dep in self._deps.get(handle.id, []):
            ds = self.load_state_with_dependencies(dep)
            if ds != LoadState.LOADED:
                return ds
        return LoadState.LOADED

    def load_state(self, handle: Handle) -> str:
        return self._state.get(handle.id, LoadState.NOT_LOADED)

    def check_modified(self):
        """Poll mtimes; reload changed assets (ref: file-watcher reload)."""
        for path, h in list(self._by_path.items()):
            if self._state.get(h.id) != LoadState.LOADED:
                continue
            p = self._resolve(path)
            try:
                mt = p.stat().st_mtime
            except OSError:
                continue
            if mt > self._mtimes.get(h.id, 0):
                self._state[h.id] = LoadState.LOADING
                fut = self.pool.submit(self._do_load, h)
                self._futures[h.id] = fut
                fut.result()
                self.events.append(("modified", h))

    def drain_events(self):
        ev, self.events = self.events, []
        return ev


class AssetPlugin(Plugin):
    """ref: AssetPlugin. `app.assets` is the server; with watch=True a frame
    hook polls for hot reloads every `watch_every` frames."""

    def __init__(self, root: str = "assets", watch: bool = False,
                 watch_every: int = 30):
        self.root = root
        self.watch = watch
        self.watch_every = watch_every

    def build(self, app):
        server = AssetServer(self.root, watch=self.watch)
        app.assets = server
        from bevy_tpu.scene_template import register_bsn_loader
        register_bsn_loader(server)   # .bsn.json scene templates
        if self.watch:
            # event-driven reload when inotify is available (ref: the
            # notify FileWatcher of bevy_asset/src/io/file/); the mtime
            # poll stays as the cross-platform fallback cadence
            from bevy_tpu.asset_watch import attach_watcher
            watcher = attach_watcher(server)
            counter = {"n": 0}
            every = self.watch_every

            def tick(app_):
                if watcher is not None:
                    server.check_watched()      # per frame: O(events)
                    return
                counter["n"] += 1
                if counter["n"] % every == 0:
                    server.check_modified()

            app.add_frame_hook(tick)
