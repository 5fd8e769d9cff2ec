"""Aggregation kernels: grouped and ungrouped reductions.

The reference's AggregateRelation drains its input and updates per-row
scalar accumulators through a FnvHashMap keyed by boxed row keys
(reference: src/execution/aggregate.rs:548-952 — its stated hotspot).
Here aggregation is a fully vectorized sort-based pipeline engineered
around TPU cost realities (random gather ≈ 7 ns/elem, scatter-based
segment ops ≈ 7 ns/elem, but lax.sort payload operands ≈ 0.7 ns/elem and
cumsum ≈ 0.2 ns/elem):

  * ONE multi-operand lax.sort co-sorts the keys AND every aggregate
    argument — no per-payload gathers
  * group boundaries + group ids come from elementwise compares + cumsum
  * COUNT comes from boundary-position differences (a second tiny sort
    compacts boundary positions; exact integer prefix math)
  * MIN/MAX come from value-co-sorted secondary sorts — the group min is
    the value at the group's start, the max at its end (no scatter)
  * SUM/AVG keep XLA segment_sum over the sorted rows: the scatter is the
    price of exact left-to-right, row-order accumulation, which the
    reference's goldens pin (aggregate.rs:1126, e.g. 3.3000000000000003)

Group output order is ascending key order (deterministic; the reference's
order was FnvHashMap iteration order, explicitly nondeterministic per
tests/sql.rs:47).
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


def _pallas_enabled() -> bool:
    """Use the pallas segmented-reduce kernel? Default: only on TPU
    backends (the XLA path stays for CPU parity runs).
    DFTPU_PALLAS=1 forces it (interpret mode off-TPU), =0 disables."""
    import os

    v = os.environ.get("DFTPU_PALLAS", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


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


def _key_sort_operands(key_cols, sel):
    """Leading sort operands: not-selected flag then null-first key parts."""
    skeys = []
    for kd, kv in key_cols:
        if kv is not None:
            skeys.append(jnp.logical_not(kv).astype(jnp.int8))
        skeys.append(kd)
    notsel = jnp.logical_not(sel).astype(jnp.int8)
    return notsel, skeys


def grouped_aggregate(
    key_cols: Sequence[ColVal],
    specs: Sequence[AggSpec],
    sel: jax.Array,
    group_capacity: int | None = None,
):
    """GROUP BY aggregation. Returns (out_keys, out_aggs, out_sel,
    n_groups); output arrays have length group_capacity. If the true
    group count exceeds group_capacity the surplus groups are dropped and
    the returned n_groups (> group_capacity) lets the caller recompile
    bigger (the fixed-capacity + valid-count idiom, SURVEY.md §7).
    """
    capacity = int(sel.shape[0])
    gcap = capacity if group_capacity is None else min(int(group_capacity), capacity)
    iota = lax.broadcasted_iota(jnp.int32, (capacity,), 0)
    giota = lax.broadcasted_iota(jnp.int32, (gcap,), 0)

    notsel, skeys = _key_sort_operands(key_cols, sel)

    # ---- main co-sort: keys + iota + every distinct payload ------------
    payload_plan: list[int] = []  # operand index per spec (data)
    vpayload_plan: list[Optional[int]] = []  # operand index per spec (validity)
    operands = [notsel, *skeys, iota]
    num_keys = len(operands)
    seen: dict[int, int] = {}
    for spec in specs:
        data, valid = spec.arg
        data = jnp.broadcast_to(data, sel.shape) if jnp.ndim(data) == 0 else data
        key_id = id(data)
        if key_id not in seen:
            seen[key_id] = len(operands)
            operands.append(data)
        payload_plan.append(seen[key_id])
        if valid is not None:
            vid = id(valid)
            if vid not in seen:
                seen[vid] = len(operands)
                operands.append(valid.astype(jnp.int8))
            vpayload_plan.append(seen[vid])
        else:
            vpayload_plan.append(None)

    sorted_ops = lax.sort(operands, num_keys=num_keys)
    sel_sorted = jnp.logical_not(sorted_ops[0].astype(jnp.bool_))
    sorted_keys = sorted_ops[1 : num_keys - 1]

    # ---- boundaries, group ids, group extents --------------------------
    first = iota == 0
    changed = jnp.zeros((capacity,), jnp.bool_)
    for sk in sorted_keys:
        changed = jnp.logical_or(changed, sk != jnp.roll(sk, 1))
    prev_sel = jnp.roll(sel_sorted, 1)
    boundary = jnp.logical_and(
        sel_sorted,
        jnp.logical_or(first, jnp.logical_or(changed, jnp.logical_not(prev_sel))),
    )
    gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    gid = jnp.where(sel_sorted, gid, gcap)  # out-of-range ids are dropped
    n_groups = jnp.sum(boundary.astype(jnp.int32))
    n_sel = jnp.sum(sel_sorted.astype(jnp.int32))

    # compact boundary positions to the front: starts[g] = first row of
    # group g in the sorted order (tiny 2-operand sort, no scatter)
    comp = lax.sort([jnp.logical_not(boundary).astype(jnp.int8), iota], num_keys=1)
    starts_full = jnp.concatenate(
        [comp[1], jnp.zeros((1,), jnp.int32)]  # pad so the +1 slice is in range
    )
    starts = lax.slice(starts_full, (0,), (gcap,))
    ends = jnp.where(
        giota + 1 < n_groups,
        lax.slice(starts_full, (1,), (gcap + 1,)),
        n_sel,
    )
    group_sizes = jnp.where(giota < n_groups, ends - starts, 0)

    def at_starts(arr):
        return jnp.take(arr, jnp.clip(starts, 0, capacity - 1))

    def at_ends(arr):
        return jnp.take(arr, jnp.clip(ends - 1, 0, capacity - 1))

    # ---- group key outputs: values at group starts ---------------------
    out_keys = []
    ki = 1
    for kd, kv in key_cols:
        if kv is not None:
            knull = at_starts(sorted_ops[ki]).astype(jnp.bool_)  # null-first flag
            ki += 1
            kvalid = jnp.logical_not(knull)
        else:
            kvalid = None
        out_keys.append((at_starts(sorted_ops[ki]), kvalid))
        ki += 1

    # ---- aggregates -----------------------------------------------------
    # TPU fast path: one pallas pass over the sorted gids computes every
    # eligible reduction (ops/pallas/segreduce.py) — no scatters, no
    # secondary sorts. CPU/parity path keeps XLA ops (bit-exact row-order
    # float sums).
    pallas_results: dict[int, jax.Array] = {}
    pallas_counts: dict[int, jax.Array] = {}
    if _pallas_enabled() and capacity % 512 == 0 and gcap >= 1:
        from datafusion_tpu.ops.pallas.segreduce import segmented_reduce_sorted

        k_ops: list[str] = []
        k_vals: list[jax.Array] = []
        k_masks: list[jax.Array] = []
        k_slots: list[tuple[int, str]] = []  # (spec index, role)
        need_count: set[int] = set()
        for si, (spec, pi, vpi) in enumerate(zip(specs, payload_plan, vpayload_plan)):
            d_sorted = sorted_ops[pi]
            mask = sel_sorted if vpi is None else jnp.logical_and(
                sel_sorted, sorted_ops[vpi].astype(jnp.bool_)
            )
            is_float = jnp.issubdtype(d_sorted.dtype, jnp.floating)
            f32 = d_sorted.dtype == jnp.float32
            i32 = d_sorted.dtype == jnp.int32
            if spec.func in ("sum", "avg") and f32:
                k_ops.append("sum")
                k_vals.append(d_sorted)
                k_masks.append(mask)
                k_slots.append((si, "sum"))
                need_count.add(si)
            elif spec.func in ("min", "max") and (f32 or i32):
                k_ops.append(spec.func)
                k_vals.append(d_sorted)
                k_masks.append(mask)
                k_slots.append((si, spec.func))
                need_count.add(si)
            elif spec.func == "count":
                pass  # counts ride along below
            else:
                continue
        for si in sorted(
            need_count
            | {i for i, s in enumerate(specs) if s.func == "count"}
        ):
            _, pi, vpi = specs[si], payload_plan[si], vpayload_plan[si]
            mask = sel_sorted if vpi is None else jnp.logical_and(
                sel_sorted, sorted_ops[vpi].astype(jnp.bool_)
            )
            k_ops.append("count")
            k_vals.append(sorted_ops[pi].astype(jnp.float32))
            k_masks.append(mask)
            k_slots.append((si, "count"))
        if k_ops:
            interp = jax.devices()[0].platform not in ("tpu", "axon")
            outs = segmented_reduce_sorted(
                gid,
                tuple(k_vals),
                tuple(k_masks),
                ops=tuple(k_ops),
                num_groups=gcap,
                interpret=interp,
            )
            for (si, role), o in zip(k_slots, outs):
                if role == "count":
                    pallas_counts[si] = o.astype(jnp.int32)
                else:
                    pallas_results[si] = o

    # cache secondary value-sorts per (arg operand index) so MIN and MAX
    # of the same argument share one sort
    minmax_cache: dict[int, jax.Array] = {}

    def minmax_sorted(pi: int) -> jax.Array:
        if pi not in minmax_cache:
            vops = lax.sort(
                [notsel, *skeys, operands[pi]], num_keys=1 + len(skeys) + 1
            )
            minmax_cache[pi] = vops[-1]
        return minmax_cache[pi]

    out_aggs = []
    for si, (spec, pi, vpi) in enumerate(zip(specs, payload_plan, vpayload_plan)):
        d_sorted = sorted_ops[pi]
        if si in pallas_counts:
            mask = None
            valid_cnt = pallas_counts[si]
        elif vpi is None:
            mask = sel_sorted
            valid_cnt = group_sizes
        else:
            mask = jnp.logical_and(sel_sorted, sorted_ops[vpi].astype(jnp.bool_))
            valid_cnt = jax.ops.segment_sum(
                mask.astype(jnp.int32), gid, num_segments=gcap
            )
        if spec.func == "count":
            out_aggs.append((valid_cnt.astype(physical_np(spec.out_dtype)), None))
            continue
        if si in pallas_results:
            r = pallas_results[si]
            if spec.func == "avg":
                r = r / jnp.maximum(valid_cnt, 1).astype(r.dtype)
            out_aggs.append((r.astype(physical_np(spec.out_dtype)), valid_cnt > 0))
            continue
        if mask is None:
            mask = sel_sorted if vpi is None else jnp.logical_and(
                sel_sorted, sorted_ops[vpi].astype(jnp.bool_)
            )
        if spec.func in ("min", "max") and vpi is None:
            # value-co-sorted path: min at group start, max at group end
            vs = minmax_sorted(pi)
            r = at_starts(vs) if spec.func == "min" else at_ends(vs)
        elif spec.func == "min":
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
        elif spec.func in ("sum", "avg"):
            # exact row-order accumulation (parity: aggregate.rs:1126)
            s = jax.ops.segment_sum(
                jnp.where(mask, d_sorted, jnp.zeros((), d_sorted.dtype)),
                gid,
                num_segments=gcap,
            )
            if spec.func == "avg":
                r = s / jnp.maximum(valid_cnt, 1).astype(s.dtype)
            else:
                r = s
        else:
            raise NotImplementedError_(f"aggregate function {spec.func}")
        out_aggs.append((r.astype(physical_np(spec.out_dtype)), valid_cnt > 0))

    out_sel = giota < n_groups
    return out_keys, out_aggs, out_sel, n_groups
