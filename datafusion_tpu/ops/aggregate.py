"""Aggregation kernels: grouped and ungrouped reductions.

The reference's AggregateRelation drains its input and updates per-row
scalar accumulators through a FnvHashMap keyed by boxed row keys
(reference: src/execution/aggregate.rs:548-952 — its stated hotspot).
Here aggregation is a fully vectorized sort-based pipeline: one
multi-key sort, segment-boundary detection, and XLA segment reductions —
no per-row host work, static shapes throughout.

Group output order is ascending key order (deterministic; the reference's
order was FnvHashMap iteration order, explicitly nondeterministic per
tests/sql.rs:47). SUM accumulates over rows in ascending original row
order within each group (stable sort), matching the reference's
batch-order folds for parity on its pinned float sums
(aggregate.rs:1126).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from datafusion_tpu.errors import NotImplementedError_
from datafusion_tpu.types import DataType, physical_np

ColVal = tuple[jax.Array, Optional[jax.Array]]


@dataclass(frozen=True)
class AggSpec:
    """One aggregate to compute: function name + argument column value."""

    func: str  # 'min' | 'max' | 'sum' | 'count' | 'avg'
    arg: ColVal
    out_dtype: DataType


def _sentinel(dtype, minimum: bool):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(-jnp.inf if minimum else jnp.inf, dtype)
    info = jnp.iinfo(dtype)
    return jnp.asarray(info.min if minimum else info.max, dtype)


def _masked(data: jax.Array, valid: Optional[jax.Array], sel: jax.Array):
    mask = sel if valid is None else jnp.logical_and(sel, valid)
    return mask


def ungrouped_aggregate(specs: Sequence[AggSpec], sel: jax.Array):
    """Whole-column reductions (reference: without_group_by,
    aggregate.rs:703-785). Returns list of (scalar data, valid scalar)."""
    outs = []
    for spec in specs:
        data, valid = spec.arg
        data = jnp.broadcast_to(data, sel.shape) if jnp.ndim(data) == 0 else data
        mask = _masked(data, valid, sel)
        n = jnp.sum(mask)
        if spec.func == "count":
            outs.append((n.astype(physical_np(spec.out_dtype)), None))
            continue
        if spec.func == "min":
            r = jnp.min(jnp.where(mask, data, _sentinel(data.dtype, False)))
        elif spec.func == "max":
            r = jnp.max(jnp.where(mask, data, _sentinel(data.dtype, True)))
        elif spec.func == "sum":
            r = jnp.sum(jnp.where(mask, data, jnp.zeros((), data.dtype)))
        elif spec.func == "avg":
            s = jnp.sum(jnp.where(mask, data, jnp.zeros((), data.dtype)))
            r = s / n.astype(s.dtype)
        else:
            raise NotImplementedError_(f"aggregate function {spec.func}")
        outs.append((r.astype(physical_np(spec.out_dtype)), n > 0))
    return outs


def grouped_aggregate(
    key_cols: Sequence[ColVal],
    specs: Sequence[AggSpec],
    sel: jax.Array,
    group_capacity: int | None = None,
):
    """GROUP BY aggregation (reference: with_group_by, aggregate.rs:787-952).

    Returns (out_key_datas, out_agg_vals, out_sel, n_groups). Output
    arrays have length `group_capacity` (default: input capacity — the
    static worst case of every row being its own group). If the true
    group count exceeds group_capacity, the surplus groups are dropped
    from the output and the returned n_groups (> group_capacity) lets the
    caller detect the overflow and recompile bigger (the fixed-capacity +
    valid-count idiom, SURVEY.md §7).
    """
    capacity = int(sel.shape[0])
    gcap = capacity if group_capacity is None else int(group_capacity)
    iota = lax.broadcasted_iota(jnp.int32, (capacity,), 0)

    # rows with a NULL group key form their own group in SQL; fold key
    # validity into the sort keys so nulls group together (null-first)
    skeys = []
    for kd, kv in key_cols:
        if kv is not None:
            skeys.append(jnp.logical_not(kv).astype(jnp.int8))
        skeys.append(kd)

    notsel = jnp.logical_not(sel).astype(jnp.int8)
    operands = [notsel, *skeys, iota]
    sorted_ops = lax.sort(operands, num_keys=len(operands))
    perm = sorted_ops[-1]
    sorted_keys = sorted_ops[1:-1]
    sel_sorted = jnp.logical_not(sorted_ops[0].astype(jnp.bool_))

    # segment boundaries among selected rows
    first = iota == 0
    changed = jnp.zeros((capacity,), jnp.bool_)
    for sk in sorted_keys:
        prev = jnp.roll(sk, 1)
        changed = jnp.logical_or(changed, sk != prev)
    prev_sel = jnp.roll(sel_sorted, 1)
    boundary = jnp.logical_and(
        sel_sorted, jnp.logical_or(first, jnp.logical_or(changed, jnp.logical_not(prev_sel)))
    )
    gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1  # -1 for pre-first rows
    # park unselected rows (and any overflow groups) out of range — XLA
    # segment ops drop out-of-range ids
    gid = jnp.where(sel_sorted, gid, gcap)
    n_groups = jnp.sum(boundary.astype(jnp.int32))
    giota = lax.broadcasted_iota(jnp.int32, (gcap,), 0)

    # representative key values per group (all rows in a segment share keys)
    out_keys = []
    for kd, kv in key_cols:
        kd_sorted = jnp.take(kd, perm)
        kmax = jax.ops.segment_max(
            jnp.where(sel_sorted, kd_sorted, _sentinel(kd_sorted.dtype, True)),
            gid,
            num_segments=gcap,
        )
        if kv is not None:
            kv_sorted = jnp.take(kv, perm)
            kvalid = jax.ops.segment_max(
                jnp.logical_and(sel_sorted, kv_sorted).astype(jnp.int8),
                gid,
                num_segments=gcap,
            ).astype(jnp.bool_)
            out_keys.append((kmax, kvalid))
        else:
            out_keys.append((kmax, None))

    out_aggs = []
    for spec in specs:
        data, valid = spec.arg
        data = jnp.broadcast_to(data, sel.shape) if jnp.ndim(data) == 0 else data
        d_sorted = jnp.take(data, perm)
        mask = sel_sorted
        if valid is not None:
            mask = jnp.logical_and(mask, jnp.take(valid, perm))
        # int32 counters suffice: per-chip capacity < 2^31 rows
        cnt = jax.ops.segment_sum(mask.astype(jnp.int32), gid, num_segments=gcap)
        if spec.func == "count":
            out_aggs.append((cnt.astype(physical_np(spec.out_dtype)), None))
            continue
        if spec.func == "min":
            r = jax.ops.segment_min(
                jnp.where(mask, d_sorted, _sentinel(d_sorted.dtype, False)),
                gid,
                num_segments=gcap,
            )
        elif spec.func == "max":
            r = jax.ops.segment_max(
                jnp.where(mask, d_sorted, _sentinel(d_sorted.dtype, True)),
                gid,
                num_segments=gcap,
            )
        elif spec.func == "sum":
            r = jax.ops.segment_sum(
                jnp.where(mask, d_sorted, jnp.zeros((), d_sorted.dtype)),
                gid,
                num_segments=gcap,
            )
        elif spec.func == "avg":
            s = jax.ops.segment_sum(
                jnp.where(mask, d_sorted, jnp.zeros((), d_sorted.dtype)),
                gid,
                num_segments=gcap,
            )
            r = s / jnp.maximum(cnt, 1).astype(s.dtype)
        else:
            raise NotImplementedError_(f"aggregate function {spec.func}")
        out_aggs.append((r.astype(physical_np(spec.out_dtype)), cnt > 0))

    out_sel = giota < n_groups
    return out_keys, out_aggs, out_sel, n_groups
