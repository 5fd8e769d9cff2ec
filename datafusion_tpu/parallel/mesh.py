"""Device mesh helpers for SPMD query execution.

The reference planned distributed execution via etcd-coordinated worker
processes exchanging serialized plans and Arrow IPC batches
(reference: ROADMAP.md:36-56, scripts/smoketest.sh:30-63 — never built).
The TPU-native equivalent is single-controller JAX SPMD: a 1-D
`jax.sharding.Mesh` over all chips, tables row-partitioned across the
mesh, and XLA collectives over ICI for the merge/exchange steps
(SURVEY.md §5 'Distributed communication backend').
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "x"  # the row-partitioning mesh axis


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over the given (default: all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (AXIS,))


def partition_table(table, mesh: Mesh):
    """Re-lay a Table's buffers row-partitioned across the mesh.

    Contiguous row blocks: device i holds rows [i*cap/n, (i+1)*cap/n).
    Capacities are multiples of PAD_UNIT=1024, divisible by any practical
    mesh size."""
    from datafusion_tpu.columnar.table import Column, Table

    n = mesh.devices.size
    if table.capacity % n != 0:
        raise ValueError(f"capacity {table.capacity} not divisible by mesh size {n}")
    sharding = NamedSharding(mesh, P(AXIS))
    cols = []
    for c in table.columns:
        data = jax.device_put(c.data, sharding)
        validity = None if c.validity is None else jax.device_put(c.validity, sharding)
        cols.append(Column(c.dtype, data, validity, c.dictionary))
    return Table(table.schema, tuple(cols), table.num_rows)
