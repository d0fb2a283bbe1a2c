"""Function reflection (reference twin: bevy_reflect's `func` module —
`DynamicFunction`/`FunctionRegistry`: register callables with reflected
signatures, look them up by path, and invoke them with dynamic args).

Python callables already carry runtime signatures, so the registry's
job is the reference's: a stable name → callable map with argument
introspection and checked dynamic dispatch (used by tooling/remote)."""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class FunctionInfo:
    """ref: FunctionInfo — name, arg names/annotations, return, doc."""

    def __init__(self, fn: Callable, name: str):
        self.name = name
        sig = inspect.signature(fn)
        self.args = [(p.name,
                      None if p.annotation is inspect.Parameter.empty
                      else p.annotation,
                      None if p.default is inspect.Parameter.empty
                      else p.default)
                     for p in sig.parameters.values()]
        self.ret = None if sig.return_annotation is inspect.Signature.empty \
            else sig.return_annotation
        self.doc = inspect.getdoc(fn) or ""

    def describe(self) -> dict:
        return {
            "name": self.name,
            "args": [{"name": n,
                      "type": getattr(t, "__name__", str(t)) if t else None,
                      "default": d} for n, t, d in self.args],
            "return": getattr(self.ret, "__name__", str(self.ret))
            if self.ret else None,
            "doc": self.doc,
        }


class FunctionRegistry:
    """ref: FunctionRegistry::register/call. Names default to
    `module::qualname` (the reference's type-path convention)."""

    def __init__(self):
        self._fns: Dict[str, Callable] = {}
        self._info: Dict[str, FunctionInfo] = {}

    def register(self, fn: Callable = None, *, name: Optional[str] = None):
        if fn is None:                       # decorator-with-args form
            return lambda f: self.register(f, name=name)
        key = name or f"{fn.__module__}::{fn.__qualname__}"
        if key in self._fns:
            raise ValueError(f"function '{key}' already registered")
        self._fns[key] = fn
        self._info[key] = FunctionInfo(fn, key)
        return fn

    def contains(self, name: str) -> bool:
        return name in self._fns

    def info(self, name: str) -> FunctionInfo:
        return self._info[name]

    def names(self):
        return sorted(self._fns)

    def call(self, name: str, *args, **kwargs) -> Any:
        """Checked dynamic dispatch (ref: DynamicFunction::call — arity
        mismatches raise instead of panicking mid-invoke)."""
        fn = self._fns.get(name)
        if fn is None:
            raise KeyError(f"unknown function '{name}'")
        try:
            inspect.signature(fn).bind(*args, **kwargs)
        except TypeError as e:
            raise TypeError(f"bad args for '{name}': {e}") from e
        return fn(*args, **kwargs)


GLOBAL_FUNCTIONS = FunctionRegistry()


def reflect_fn(fn=None, *, name=None):
    """Module-level convenience decorator onto the global registry."""
    return GLOBAL_FUNCTIONS.register(fn, name=name) if fn is not None \
        else GLOBAL_FUNCTIONS.register(name=name)
