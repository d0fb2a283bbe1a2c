"""Worker process for the multi-host DCN dryrun (tests/test_multihost.py).

One of N jax.distributed processes on this machine, each with
`jax_num_cpu_devices` virtual CPU devices — the CPU stand-in for an
N-host TPU pod slice (SURVEY.md §2.8/§5: single-host ICI is covered by
the 8-device mesh tests; this exercises the 'DCN for multi-host later'
axis). Gloo backs the inter-process collectives, standing in for DCN.

Runs the SHARDED many_cubes frame over a ('host', 'chip') mesh —
host-major device order, so the flattened shard axis crosses process
boundaries exactly where a real deployment's ring would cross DCN —
then records checksum + compiled-HLO collective inventory to JSON.

Usage: python multihost_worker.py <pid> <nprocs> <port> <out.json>
"""

import json
import os
import sys
from pathlib import Path

pid = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = int(sys.argv[3])
out_path = sys.argv[4]

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs,
                           process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from bevy_tpu.parallel import collective_inventory, cross_host_ops  # noqa: E402
from many_cubes import build_app  # noqa: E402


def main():
    devs = np.array(jax.devices())
    per_host = len(jax.local_devices())
    mesh = Mesh(devs.reshape(nprocs, per_host), ("host", "chip"))

    app = build_app(n_cubes=256, width=256, height=128, capacity=512,
                    window_budget=4096, cull_budget=None, shards=mesh,
                    backend="pallas_interpret")
    app.world.set_resource_field("frame_input", "dt", 1 / 60.0)
    step = jax.jit(app.frame_fn())
    compiled = step.lower(app.world.state).compile()
    inv = collective_inventory(compiled.as_text())

    st = app.world.state
    for _ in range(2):
        st = step(st)
    # sum over the (row-sharded) framebuffer is a replicated global
    # scalar — fetchable identically on every process
    checksum = float(np.asarray(
        jax.device_get(st["res"]["render_target"]["color"].sum())))

    result = {
        "pid": pid,
        "n_global": len(devs),
        "n_local": per_host,
        "checksum": checksum,
        "collectives": {op: [b for b, _ in insts]
                        for op, insts in inv.items()},
        "cross_host_ops": cross_host_ops(inv, per_host),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"worker {pid} ok: {result}")


if __name__ == "__main__":
    main()
