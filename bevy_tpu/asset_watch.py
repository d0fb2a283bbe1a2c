"""Filesystem watcher for asset hot-reload (reference twin: bevy_asset's
notify-based FileWatcher, `bevy_asset/src/io/file/file_watcher.rs` —
event-driven reloads instead of the O(assets)-per-frame mtime poll).

Linux inotify through ctypes/libc (no dependencies): one inotify fd,
one watch per asset directory, non-blocking drains per frame. Events
carry the changed file name, so a reload touches exactly the edited
assets and sub-second edits can't slip between polls. On platforms
without inotify the AssetServer's mtime poll remains the fallback."""

from __future__ import annotations

import ctypes
import ctypes.util
import errno
import os
import struct
from pathlib import Path

IN_CLOSE_WRITE = 0x00000008
IN_MOVED_TO = 0x00000080
IN_CREATE = 0x00000100
IN_MODIFY = 0x00000002
_MASK = IN_CLOSE_WRITE | IN_MOVED_TO | IN_CREATE | IN_MODIFY
_O_NONBLOCK = os.O_NONBLOCK


class InotifyWatcher:
    """Watches directories; `poll()` returns the set of changed paths."""

    def __init__(self):
        libc_name = ctypes.util.find_library("c") or "libc.so.6"
        self._libc = ctypes.CDLL(libc_name, use_errno=True)
        self.fd = self._libc.inotify_init1(_O_NONBLOCK)
        if self.fd < 0:
            raise OSError(ctypes.get_errno(), "inotify_init1 failed")
        self._wd_to_dir = {}

    def watch_dir(self, directory) -> bool:
        d = str(Path(directory))
        wd = self._libc.inotify_add_watch(
            self.fd, d.encode(), _MASK)
        if wd < 0:
            return False
        self._wd_to_dir[wd] = d
        return True

    def poll(self):
        """Drain pending events; returns {absolute paths touched}."""
        changed = set()
        while True:
            try:
                buf = os.read(self.fd, 4096)
            except BlockingIOError:
                break
            except OSError as e:
                if e.errno == errno.EAGAIN:
                    break
                raise
            if not buf:
                break
            off = 0
            while off + 16 <= len(buf):
                wd, mask, cookie, ln = struct.unpack_from("iIII", buf, off)
                name = buf[off + 16:off + 16 + ln].split(b"\0", 1)[0]
                off += 16 + ln
                d = self._wd_to_dir.get(wd)
                if d is not None and name:
                    changed.add(os.path.join(d, name.decode()))
        return changed

    def close(self):
        try:
            os.close(self.fd)
        except OSError:
            pass


def attach_watcher(server) -> InotifyWatcher | None:
    """Wire an InotifyWatcher to an AssetServer: watches every loaded
    asset's directory and exposes `server.check_watched()` that reloads
    exactly the inotify-reported files. Returns the watcher, or None
    when inotify is unavailable (the mtime poll stays authoritative)."""
    try:
        watcher = InotifyWatcher()
    except OSError:
        return None

    watched_dirs = set()

    def ensure_dirs():
        for path in list(server._by_path.keys()):
            d = str(server._resolve(path).parent)
            if d not in watched_dirs and watcher.watch_dir(d):
                watched_dirs.add(d)

    def check_watched():
        ensure_dirs()
        changed = watcher.poll()
        if not changed:
            return 0
        n = 0
        from bevy_tpu.asset import LoadState
        for path, h in list(server._by_path.items()):
            if str(server._resolve(path)) in changed and \
                    server._state.get(h.id) == LoadState.LOADED:
                server._state[h.id] = LoadState.LOADING
                fut = server.pool.submit(server._do_load, h)
                server._futures[h.id] = fut
                fut.result()
                server.events.append(("modified", h))
                n += 1
        return n

    ensure_dirs()
    server.check_watched = check_watched
    server._watcher = watcher
    return watcher
