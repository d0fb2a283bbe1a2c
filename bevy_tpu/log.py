"""Structured logging with env-filter directives (reference twin:
bevy_log — `LogPlugin` configuring tracing_subscriber's `EnvFilter`,
`src/lib.rs:218`; the `once!` macros; span-style scopes map to
jax.profiler ranges).

Filter syntax matches tracing's EnvFilter subset:
    "warn"                      → global level
    "info,bevy_tpu.render=debug" → default info, module override
Read from `BEVY_TPU_LOG` (the RUST_LOG analogue) or passed explicitly.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, Optional

from bevy_tpu.app.plugin import Plugin

LEVELS = {"trace": 0, "debug": 1, "info": 2, "warn": 3, "error": 4,
          "off": 5}
_LEVEL_NAMES = {v: k.upper() for k, v in LEVELS.items()}


class EnvFilter:
    """ref: tracing_subscriber::EnvFilter — longest-prefix module match."""

    def __init__(self, spec: str = "info"):
        self.default = LEVELS["info"]
        self.rules: Dict[str, int] = {}
        for part in (spec or "info").split(","):
            part = part.strip()
            if not part:
                continue
            if "=" in part:
                target, lvl = part.split("=", 1)
                self.rules[target.strip()] = LEVELS.get(lvl.strip().lower(),
                                                        2)
            else:
                self.default = LEVELS.get(part.lower(), 2)

    def enabled(self, target: str, level: int) -> bool:
        best = self.default
        best_len = -1
        for prefix, lvl in self.rules.items():
            if (target == prefix or target.startswith(prefix + ".")) and \
                    len(prefix) > best_len:
                best = lvl
                best_len = len(prefix)
        return level >= best


class Logger:
    def __init__(self, filter_: EnvFilter, stream=None, timestamps=True):
        self.filter = filter_
        self.stream = stream or sys.stderr
        self.timestamps = timestamps
        self._once_seen = set()
        self._t0 = time.perf_counter()

    def log(self, level: int, target: str, msg: str, once_key=None):
        if not self.filter.enabled(target, level):
            return
        if once_key is not None:
            if once_key in self._once_seen:
                return
            self._once_seen.add(once_key)
        ts = f"{time.perf_counter() - self._t0:9.3f}s " \
            if self.timestamps else ""
        self.stream.write(
            f"{ts}{_LEVEL_NAMES[level]:5} {target}: {msg}\n")

    def trace(self, target, msg):
        self.log(LEVELS["trace"], target, msg)

    def debug(self, target, msg):
        self.log(LEVELS["debug"], target, msg)

    def info(self, target, msg):
        self.log(LEVELS["info"], target, msg)

    def warn(self, target, msg):
        self.log(LEVELS["warn"], target, msg)

    def error(self, target, msg):
        self.log(LEVELS["error"], target, msg)

    def info_once(self, target, msg):
        """ref: the once! log macros."""
        self.log(LEVELS["info"], target, msg, once_key=(target, msg))

    def warn_once(self, target, msg):
        self.log(LEVELS["warn"], target, msg, once_key=(target, msg))


_global: Optional[Logger] = None


def get_logger() -> Logger:
    global _global
    if _global is None:
        _global = Logger(EnvFilter(os.environ.get("BEVY_TPU_LOG", "info")))
    return _global


class LogPlugin(Plugin):
    """ref: bevy_log LogPlugin. `filter` overrides BEVY_TPU_LOG."""

    def __init__(self, filter: str = None, stream=None, timestamps=True):
        spec = filter if filter is not None \
            else os.environ.get("BEVY_TPU_LOG", "info")
        self.logger = Logger(EnvFilter(spec), stream=stream,
                             timestamps=timestamps)

    def build(self, app):
        global _global
        _global = self.logger
        app.logger = self.logger
