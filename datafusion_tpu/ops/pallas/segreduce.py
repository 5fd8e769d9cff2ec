"""Pallas TPU kernel: segmented reductions over SORTED group ids.

After the grouped-aggregate main sort (ops/aggregate.py), group ids are
ascending. That makes every reduction windowed: a block of B rows can
only touch group slots [gid[first], gid[first] + B] — each row advances
the group id by at most one. So a sequential grid walks the blocks,
keeps the full accumulator table in VMEM, and combines each block's
contribution into a dynamic-start window:

  * sum/count: one-hot [B, B] matmul on the MXU (~0.7 ns/row)
  * min/max:   masked [B, B] reduce on the VPU

vs ~7 ns/row for XLA's scatter-based segment ops — and it replaces the
secondary value-sorts for MIN/MAX too.

Accumulator identities make cross-block combining exact for count/min/
max; float sums combine block partials in block order (deterministic,
fixed shape), which is why the engine keeps XLA segment_sum where
bit-exact row-order sums are required (CPU parity path) and uses this
kernel on TPU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512  # rows per grid step; one-hot is [BLOCK, BLOCK] in VMEM

_F32_OPS = ("sum", "count", "min", "max")


def _identity(op: str, dtype):
    if op in ("sum", "count"):
        return jnp.zeros((), dtype)
    if op == "min":
        return (
            jnp.asarray(jnp.inf, dtype)
            if jnp.issubdtype(dtype, jnp.floating)
            else jnp.asarray(jnp.iinfo(dtype).max, dtype)
        )
    return (
        jnp.asarray(-jnp.inf, dtype)
        if jnp.issubdtype(dtype, jnp.floating)
        else jnp.asarray(jnp.iinfo(dtype).min, dtype)
    )


def _kernel(ops, out_pad, gid_ref, *refs):
    nags = len(ops)
    val_refs = refs[:nags]
    mask_refs = refs[nags : 2 * nags]
    out_refs = refs[2 * nags : 3 * nags]
    step = pl.program_id(0)

    # initialize accumulators on the first step
    @pl.when(step == 0)
    def _():
        for a, op in enumerate(ops):
            out_refs[a][:] = jnp.full(
                out_refs[a].shape, _identity(op, out_refs[a].dtype)
            )

    gid = gid_ref[:]  # [BLOCK] int32, ascending; invalid rows hold big ids
    base = gid[0]
    local = gid - base  # in [0, BLOCK) for valid rows
    in_window = local < BLOCK
    rows = lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    cols = lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    local_b = jnp.where(in_window, local, BLOCK)  # park out-of-window rows
    onehot = (local_b[:, None] == cols).astype(jnp.float32)  # [BLOCK, BLOCK]
    del rows

    for a, op in enumerate(ops):
        v = val_refs[a][:]
        m = jnp.logical_and(mask_refs[a][:].astype(jnp.bool_), in_window)
        window = out_refs[a][pl.ds(base, BLOCK)]
        if op in ("sum", "count"):
            vv = (
                m.astype(jnp.float32)
                if op == "count"
                else jnp.where(m, v, jnp.zeros((), v.dtype)).astype(jnp.float32)
            )
            contrib = jnp.dot(
                vv[None, :], onehot, preferred_element_type=jnp.float32
            )[0]
            out_refs[a][pl.ds(base, BLOCK)] = window + contrib.astype(window.dtype)
        else:
            big = _identity(op, v.dtype)
            cell = jnp.where(
                jnp.logical_and(onehot > 0, m[:, None]), v[:, None], big
            )  # [BLOCK, BLOCK]
            contrib = (
                jnp.min(cell, axis=0) if op == "min" else jnp.max(cell, axis=0)
            )
            combined = (
                jnp.minimum(window, contrib)
                if op == "min"
                else jnp.maximum(window, contrib)
            )
            out_refs[a][pl.ds(base, BLOCK)] = combined


@functools.partial(jax.jit, static_argnames=("ops", "num_groups", "interpret"))
def segmented_reduce_sorted(
    gid: jax.Array,
    values: tuple[jax.Array, ...],
    masks: tuple[jax.Array, ...],
    *,
    ops: tuple[str, ...],
    num_groups: int,
    interpret: bool = False,
):
    """Reduce `values[a]` into per-group slots according to sorted `gid`.

    gid: [N] int32 ascending for valid rows; invalid rows must hold an id
         >= num_groups AND sort after all valid rows.
    values[a]: [N] (f32 for sum; any numeric for min/max)
    masks[a]: [N] bool — row contributes to aggregate a
    Returns tuple of [num_groups] arrays.
    """
    n = int(gid.shape[0])
    assert n % BLOCK == 0, f"input length {n} not a multiple of {BLOCK}"
    out_pad = num_groups + BLOCK  # window updates may run past the end

    grid = (n // BLOCK,)
    in_specs = [pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)]
    for _ in values:
        in_specs.append(pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM))
    for _ in masks:
        in_specs.append(pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM))

    out_shapes = []
    out_specs = []
    for a, op in enumerate(ops):
        dt = jnp.float32 if op in ("sum", "count") else values[a].dtype
        out_shapes.append(jax.ShapeDtypeStruct((out_pad,), dt))
        out_specs.append(pl.BlockSpec((out_pad,), lambda i: (0,), memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, ops, out_pad)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(gid, *values, *[m.astype(jnp.int8) for m in masks])
    return tuple(o[:num_groups] for o in outs)
