"""Native (C++) runtime components, loaded via ctypes.

The reference engine leans on native crates for its host-side heavy
lifting (taffy for UI layout, parley for text shaping, …); this package
holds the equivalents. Libraries are compiled on demand with g++ (cached
next to the source, keyed by source mtime) — no pybind11, plain C ABI.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent


def load_library(name: str) -> ctypes.CDLL | None:
    """Compile (if stale) and dlopen `name`.cpp from this directory.
    Returns None when no C++ toolchain is available (callers fall back to
    their pure-Python paths)."""
    src = _DIR / f"{name}.cpp"
    so = _DIR / f"lib{name}.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               str(src), "-o", str(so)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (OSError, subprocess.CalledProcessError) as e:
            import warnings
            msg = getattr(e, "stderr", str(e))
            warnings.warn(f"native build of {name} failed: {msg}")
            return None
    try:
        return ctypes.CDLL(str(so))
    except OSError:
        return None
