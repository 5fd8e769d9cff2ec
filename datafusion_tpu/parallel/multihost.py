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


def merge_string_dictionaries(vocab):
    """Merge THIS process's order-preserving vocab with every other
    process's into one globally sorted vocabulary (SURVEY §7 hard part:
    'global dictionaries need a merge step across hosts'). Returns
    (merged vocab tuple, int32 remap with remap[old_code] == new_code).

    The exchange rides jax.experimental.multihost_utils.process_allgather
    on padded utf-8 byte buffers (two rounds: max length, then payload) —
    the same process-level channel the engine's result materialization
    uses, so no extra coordination service is needed."""
    import numpy as np

    import jax

    vocab = tuple(vocab)
    if jax.process_count() <= 1:
        return vocab, np.arange(len(vocab), dtype=np.int32)
    from jax.experimental import multihost_utils as mh

    blob = "\x00".join(vocab).encode("utf-8") if vocab else b""
    b = np.frombuffer(blob, dtype=np.uint8)
    lens = mh.process_allgather(np.array([len(b), len(vocab)], np.int64))
    lens = np.asarray(lens).reshape(-1, 2)
    maxlen = max(1, int(lens[:, 0].max()))
    padded = np.zeros((maxlen,), np.uint8)
    padded[: len(b)] = b
    allb = np.asarray(mh.process_allgather(padded)).reshape(-1, maxlen)
    union: set = set()
    for p in range(allb.shape[0]):
        nb, nv = int(lens[p, 0]), int(lens[p, 1])
        if nv == 0:
            continue
        union.update(bytes(allb[p, :nb]).decode("utf-8").split("\x00"))
    merged = tuple(sorted(union))
    index = {s: i for i, s in enumerate(merged)}
    remap = np.array([index[s] for s in vocab], dtype=np.int32)
    return merged, remap


def register_csv_shards(ctx, name: str, path: str, schema, *, has_header: bool = True) -> None:
    """Per-host sharded ingest: each process reads ITS OWN CSV shard
    (`path` is process-local), string dictionaries merge globally
    (merge_string_dictionaries), and rows concatenate in process order
    into one globally consistent row-partitioned table. The exchange is
    a one-time host-level all-gather at ingest; queries then run the
    unchanged SPMD pipelines."""
    import numpy as np

    import jax

    from datafusion_tpu.columnar.csv import read_csv
    from datafusion_tpu.columnar.table import Table

    local = read_csv(path, schema, has_header=has_header)
    if jax.process_count() <= 1:
        ctx.register_table(name, local)
        return
    from jax.experimental import multihost_utils as mh

    n_local = local.num_rows
    counts = np.asarray(
        mh.process_allgather(np.array([n_local], np.int64))
    ).reshape(-1)
    m = max(1, int(counts.max()))
    nproc = len(counts)

    def gather_rows(arr: np.ndarray) -> np.ndarray:
        padded = np.zeros((m,), arr.dtype)
        padded[: len(arr)] = arr
        g = np.asarray(mh.process_allgather(padded)).reshape(nproc, m)
        return np.concatenate([g[p, : counts[p]] for p in range(nproc)])

    arrays: list = []
    validity: list = []
    any_null = False
    for c in local.columns:
        d = np.asarray(jax.device_get(c.data))[:n_local]
        if c.dictionary is not None:
            merged, remap = merge_string_dictionaries(c.dictionary)
            codes = remap[d] if len(remap) else d.astype(np.int32)
            arrays.append((gather_rows(codes.astype(np.int32)), merged))
        else:
            arrays.append(gather_rows(d))
        vloc = (
            np.ones((n_local,), np.uint8)
            if c.validity is None
            else np.asarray(jax.device_get(c.validity))[:n_local].astype(np.uint8)
        )
        vglob = gather_rows(vloc)
        if vglob.all():
            validity.append(None)
        else:
            any_null = True
            validity.append(vglob.astype(np.bool_))
    table = Table.from_arrays(
        schema, arrays, validity=validity if any_null else None
    )
    ctx.register_table(name, table)
