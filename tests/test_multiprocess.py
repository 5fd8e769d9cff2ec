"""True multi-controller execution: 2 processes × 4 virtual devices.

The single-process suite validates SPMD semantics on one 8-device mesh;
this test additionally validates the multi-HOST mechanics the reference
only roadmapped (ROADMAP.md 0.9-1.0 worker nodes): jax.distributed
initialization, cross-process device_put of partitioned tables,
collectives crossing process boundaries (Gloo standing in for DCN), and
multi-controller result materialization (parallel/multihost.py to_host).
"""

import pathlib
import socket
import subprocess
import sys

DRIVER = pathlib.Path(__file__).parent / "multiproc_driver.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_parity():
    port = str(_free_port())
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(DRIVER), port, str(pid), str(nproc)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"MULTIPROC-OK {pid}" in out
