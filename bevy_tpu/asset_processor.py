"""Offline asset processing (reference twin: bevy_asset's
AssetProcessor — `src/processor/mod.rs:98-104`: import/transform/save
with `.meta` files, content-hash invalidation, and processor-gated
reads via `io/processor_gated.rs`).

`AssetProcessor.process_all()` walks the source tree, runs the
registered processor for each extension, writes artifacts to the
processed tree plus a sidecar `.meta.json` (source hash + processor
name + version), and skips files whose hash/meta are unchanged.
`AssetServer(processed=...)` then resolves reads through the processed
tree when an artifact exists (the processor-gated read)."""

from __future__ import annotations

import hashlib
import json
import shutil
from pathlib import Path
from typing import Callable, Dict, Tuple


class AssetProcessor:
    def __init__(self, source_dir, processed_dir):
        self.source = Path(source_dir)
        self.processed = Path(processed_dir)
        # ext → (name, version, fn(src_bytes, src_path) -> (bytes, out_suffix))
        self._processors: Dict[str, Tuple[str, int, Callable]] = {}

    def register(self, ext: str, fn: Callable, name: str = None,
                 version: int = 1, out_suffix: str = None):
        """fn(data: bytes, path: Path) -> bytes. `out_suffix` renames the
        artifact (e.g. '.png' → '.npy' for decoded textures)."""
        self._processors[ext.lower()] = (
            name or fn.__name__, version, fn, out_suffix)

    def _meta_path(self, rel: Path) -> Path:
        return self.processed / rel.parent / (rel.name + ".meta.json")

    def _artifact_path(self, rel: Path, out_suffix) -> Path:
        if out_suffix:
            rel = rel.with_suffix(out_suffix)
        return self.processed / rel

    def process_all(self) -> dict:
        """Process changed/new sources; prune orphaned artifacts.
        Returns {'processed': n, 'skipped': n, 'removed': n}."""
        stats = {"processed": 0, "skipped": 0, "removed": 0}
        seen = set()
        for src in sorted(self.source.rglob("*")):
            if not src.is_file():
                continue
            rel = src.relative_to(self.source)
            entry = self._processors.get(src.suffix.lower())
            if entry is None:
                # passthrough copy (ref: default no-op processing)
                entry = ("copy", 1, lambda data, p: data, None)
            name, version, fn, out_suffix = entry
            data = src.read_bytes()
            digest = hashlib.sha256(data).hexdigest()
            meta_p = self._meta_path(rel)
            art_p = self._artifact_path(rel, out_suffix)
            seen.add(meta_p)
            seen.add(art_p)
            if meta_p.exists() and art_p.exists():
                meta = json.loads(meta_p.read_text())
                if meta.get("hash") == digest and \
                        meta.get("processor") == name and \
                        meta.get("version") == version:
                    stats["skipped"] += 1
                    continue
            out = fn(data, src)
            art_p.parent.mkdir(parents=True, exist_ok=True)
            art_p.write_bytes(out)
            meta_p.write_text(json.dumps({
                "hash": digest, "processor": name, "version": version,
                "artifact": art_p.name}))
            stats["processed"] += 1
        # prune artifacts whose sources vanished
        for p in sorted(self.processed.rglob("*")):
            if p.is_file() and p not in seen:
                p.unlink()
                stats["removed"] += 1
        for d in sorted(self.processed.rglob("*"), reverse=True):
            if d.is_dir() and not any(d.iterdir()):
                d.rmdir()
        return stats

    def clear(self):
        if self.processed.exists():
            shutil.rmtree(self.processed)
