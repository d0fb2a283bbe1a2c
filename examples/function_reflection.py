"""Function reflection (reference twin:
examples/reflection/function_reflection.rs — register callables by name,
inspect their reflected signatures, call them dynamically; the console /
scripting / BRP hook point)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu.reflect_fn import FunctionRegistry


def main():
    reg = FunctionRegistry()

    @reg.register
    def add(a: float, b: float) -> float:
        """Sum two numbers."""
        return a + b

    @reg.register(name="math.scale")
    def scale(v: float, factor: float = 2.0) -> float:
        return v * factor

    print("registered:", sorted(reg.names()))
    add_name = f"{add.__module__}::{add.__qualname__}"   # type-path key
    print("add signature:", reg.info(add_name).describe())
    print("add(2, 3) =", reg.call(add_name, 2.0, 3.0))
    print("math.scale(21) =", reg.call("math.scale", 21.0))


build_app = None  # host-only example


if __name__ == "__main__":
    main()
