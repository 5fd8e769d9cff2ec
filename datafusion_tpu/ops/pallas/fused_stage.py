"""Fused scan→filter→project stage: ONE pass over the input columns.

XLA compiles the selection mask and each computed projection column as
SEPARATE kernels (no multi-output fusion across the pipeline's jit
outputs — verified in the compiled TPU HLO), so input columns shared
between the predicate and computed expressions are read from HBM once
PER OUTPUT: the flagship filter+project pipeline moves ~17 B/row instead
of its true 13 B/row. This kernel evaluates the predicate and every
computed expression on one VMEM-resident block, reading each input
column exactly once. Measured on a v5e chip: 50.1 Grows/s vs 40.6 for
the two-kernel XLA path (+23%), bit-exact outputs.

Two Mosaic-specific choices, both measured on chip:
* 2-D blocks — `f32[n]` with T(1024) layout is bit-identical to
  `f32[n/128, 128]` with T(8,128), so the reshape is free, and Mosaic's
  2-D vector path is ~15% faster than its 1-D path at the same block
  bytes.
* int8 masks — Mosaic's packed-bool VMEM stores cost ~40% of the whole
  kernel (31 → 50 Grows/s); boolean outputs are declared int8 in the
  kernel and cast back with a `!= 0` OUTSIDE the pallas_call, which XLA
  fuses into the consumers.

The block evaluator is an arbitrary closure over compiled expression
functions — the compiler only routes expressions through here after an
elementwise-safety whitelist (exec/compiler.py _elementwise_safe), so
everything traced inside the kernel is add/compare/select/cast-shaped
and lowers cleanly through Mosaic.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
# VMEM working-set budget: in+out block buffers are double-buffered by
# the pipeline; stay well under the ~16 MB/core limit
VMEM_BUDGET = 8 * 1024 * 1024
MAX_BROWS = 1024


def pick_block_rows(capacity: int, bytes_per_row: int) -> int:
    """Rows-of-128 per grid step. Capacities are multiples of 1024
    (PAD_UNIT), so ROWS = capacity/128 is a multiple of 8."""
    rows = capacity // LANES
    brows = MAX_BROWS
    while brows > 8 and (
        rows % brows or brows * LANES * bytes_per_row * 2 > VMEM_BUDGET
    ):
        brows //= 2
    return brows if rows % brows == 0 else 0


def run_fused(
    block_eval: Callable,
    inputs: Sequence[jax.Array],
    out_dtypes: Sequence,
    capacity: int,
    brows: int,
    interpret: bool = False,
) -> list[jax.Array]:
    """Run block_eval(blocks_2d, base_row) over a 1-D grid of
    (brows, 128) blocks; returns [capacity]-shaped outputs. Requested
    bool outputs are computed as int8 in-kernel and cast back outside."""
    n_in = len(inputs)
    rows = capacity // LANES
    grid = rows // brows
    kernel_dtypes = [
        jnp.int8 if jnp.dtype(dt) == jnp.dtype(jnp.bool_) else dt
        for dt in out_dtypes
    ]

    def kernel(*refs):
        in_refs = refs[:n_in]
        out_refs = refs[n_in:]
        base = pl.program_id(0) * (brows * LANES)
        blocks = [r[:, :] for r in in_refs]
        outs = block_eval(blocks, base)
        for o_ref, o in zip(out_refs, outs):
            o_ref[:, :] = jnp.broadcast_to(o, o_ref.shape).astype(o_ref.dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((brows, LANES), lambda i: (i, 0)) for _ in range(n_in)
        ],
        out_specs=[
            pl.BlockSpec((brows, LANES), lambda i: (i, 0)) for _ in out_dtypes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), dt) for dt in kernel_dtypes
        ],
        interpret=interpret,
    )(*[x.reshape(rows, LANES) for x in inputs])
    fixed = []
    for o, want in zip(outs, out_dtypes):
        o = o.reshape(capacity)
        if jnp.dtype(want) == jnp.dtype(jnp.bool_):
            o = o != 0  # fuses into consumers
        fixed.append(o)
    return fixed
