"""Compiled-HLO collective inventory of the sharded many_cubes frame at
BENCHMARK scale (VERDICT r2 #5: comm-volume claims must be tested, not
quoted). Compile-only — the 160k-cube interpret run is not executed."""

import re
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def _collect(hlo_text):
    """Collective ops in the entry+called computations: name -> list of
    result byte sizes (one per op instance)."""
    out = {}
    pat = re.compile(
        r"=\s*(?:\(([^)]*)\)|(\w+)\[([\d,]*)\][^ ]*)\s*"
        r"(all-to-all|all-gather|all-reduce|collective-permute|"
        r"reduce-scatter)\(")
    for m in pat.finditer(hlo_text):
        op = m.group(4)
        if m.group(1) is not None:          # tuple result
            size = 0
            for part in re.finditer(r"(\w+)\[([\d,]*)\]", m.group(1)):
                n = int(np.prod([int(x) for x in
                                 part.group(2).split(",") if x] or [1]))
                size += n * _DTYPE_BYTES.get(part.group(1), 4)
        else:
            dt, dims = m.group(2), m.group(3)
            n = int(np.prod([int(x) for x in dims.split(",") if x] or [1]))
            size = n * _DTYPE_BYTES.get(dt, 4)
        out.setdefault(op, []).append(size)
    return out


def test_sharded_benchmark_frame_collectives():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from many_cubes import build_app

    app = build_app(shards=8, backend="pallas_interpret")
    step = jax.jit(app.frame_fn())
    hlo = step.lower(app.world.state).compile().as_text()
    inv = _collect(hlo)
    total_by_op = {k: (len(v), sum(v)) for k, v in inv.items()}
    print("collective inventory:", total_by_op)

    # the sharded mesh pass contract (parallel/raster.py):
    #   band merge = all-to-all on depth + winner (2 ops, H*W f32 each)
    #   flat records = one all-gather
    #   overflow    = one scalar all-reduce
    assert "all-to-all" in inv and len(inv["all-to-all"]) >= 2
    a2a_bytes = sum(inv["all-to-all"])
    assert 2_000_000 < a2a_bytes < 16_000_000, a2a_bytes
    assert "all-gather" in inv
    ag_bytes = sum(inv["all-gather"])
    assert ag_bytes < 64_000_000, ag_bytes
    # no accidental full-frame replication: total collective traffic per
    # step stays under ~2x the round-2 measured 30 MB inventory
    total = sum(sum(v) for v in inv.values())
    assert total < 64_000_000, total
