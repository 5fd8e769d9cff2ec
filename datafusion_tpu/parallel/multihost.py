"""Multi-host initialization scaffolding.

On a multi-host TPU pod slice, JAX's single-controller SPMD model needs
`jax.distributed.initialize` on every host before building the mesh —
after that, the engine's shard_map pipelines run unchanged: a global
Mesh over all hosts' devices, tables row-partitioned globally, ICI
collectives within a slice and DCN across slices, all inserted by XLA.
No coordination service is required (the reference planned etcd-managed
workers exchanging Arrow IPC, ROADMAP.md:42-56, smoketest.sh:36-63).

This environment exposes one chip, so multi-host runs are validated with
virtual CPU devices (tests/conftest.py); this module documents and wraps
the real-pod entry point.
"""

from __future__ import annotations

from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (call once per host,
    before any jax operation). On Cloud TPU, arguments are discovered
    from the metadata server when omitted."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh():
    """1-D mesh over every chip in the slice (all hosts)."""
    from datafusion_tpu.parallel.mesh import make_mesh

    return make_mesh()


def to_host(x):
    """Fetch a jax array to host numpy, handling multi-controller runs.

    Single process (or fully addressable array): plain device_get. Under
    multi-process SPMD a partitioned result spans devices this process
    cannot address, so the shards are exchanged with a process-level
    all-gather (every process must reach this call — the engine's run()
    is SPMD by construction). Replicated results read the local shard."""
    import numpy as np

    import jax

    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
    if x.is_fully_replicated:
        return np.asarray(jax.device_get(x.addressable_data(0)))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
