"""Multi-host DCN dryrun (SURVEY.md §2.8/§5 'DCN for multi-host later').

Launches TWO real `jax.distributed` processes on this machine (gloo CPU
collectives standing in for DCN), each presenting 4 virtual devices —
the 2-host × 4-chip pod-slice stand-in. Each worker runs the SHARDED
many_cubes frame over a ('host','chip') mesh (host-major device order:
ring collectives cross the process boundary exactly where a real
deployment crosses DCN) and records a framebuffer checksum plus the
compiled-HLO collective inventory.

Asserts: both processes complete, produce IDENTICAL images (the
replicated checksum), the frame actually communicates (all_to_all +
all_gather present), and at least one collective's replica groups span
both hosts (the DCN-riding ops).

The reference has no multi-host axis at all — its parallelism ends at
one machine (pipelined_rendering.rs:23-110 is intra-process); this is
the TPU build's pod-scale story, compile- AND execution-tested.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

TESTS = Path(__file__).resolve().parent


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_dryrun(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"mh{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(TESTS / "multihost_worker.py"),
             str(i), "2", str(port), str(outs[i])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu"})
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    res = [json.loads(o.read_text()) for o in outs]
    assert res[0]["n_global"] == 8 and res[0]["n_local"] == 4

    # identical image on every process (replicated reduction of the
    # row-sharded framebuffer)
    assert res[0]["checksum"] == res[1]["checksum"]
    assert res[0]["checksum"] > 0.0

    # the frame actually communicates: band exchange (all_to_all) +
    # record gather (all_gather) — same op classes the single-host ICI
    # inventory test pins (test_sharded_hlo.py)
    ops = res[0]["collectives"]
    assert "all-to-all" in ops and "all-gather" in ops, ops

    # and some of those collectives ride DCN (replica groups spanning
    # both hosts)
    assert res[0]["cross_host_ops"] >= 1, res[0]
