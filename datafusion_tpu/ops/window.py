"""Window functions (beyond the reference, which had no window grammar).

TPU-native shape: one multi-operand `lax.sort` per window spec
(partition keys, then ORDER BY keys) carries the row ids and every
argument column as payloads; partition/peer boundaries are elementwise
compares + cumsum/cummax scans in sorted space; results ride ONE second
sort (key = original row id) back to source order. No gathers except
the two per whole-partition aggregate (partition start/end lookups).

Functions:
  row_number, rank, dense_rank                 (ranking; need ORDER BY)
  lag, lead (arg[, offset])                    (need ORDER BY)
  sum, count, avg                              running when ORDER BY is
                                               present (ROWS frame,
                                               documented deviation from
                                               RANGE peers), else whole
                                               partition
  min, max                                     whole partition (the arg
                                               rides the spec sort as an
                                               extra key); running
                                               min/max not supported
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from datafusion_tpu.errors import NotImplementedError_
from datafusion_tpu.ops.sort import _directed_key
from datafusion_tpu.types import DataType, physical_np

ColVal = tuple[jax.Array, Optional[jax.Array]]

RANKING = {"row_number", "rank", "dense_rank", "percent_rank", "cume_dist"}
SHIFTS = {"lag", "lead"}
AGGS = {"sum", "count", "avg", "min", "max"}


@dataclass(frozen=True)
class WindowCall:
    """One window function instance within a shared spec."""

    kind: str
    arg: Optional[ColVal] = None  # None for row_number/rank/dense_rank/count(*)
    offset: int = 1  # lag/lead
    # explicit ROWS frame (lo, hi) row offsets vs the current row; None
    # end = unbounded; frame=None = default (running with ORDER BY,
    # whole partition without)
    frame: Optional[tuple[Optional[int], Optional[int]]] = None


def _first_pos(flag: jax.Array, iota: jax.Array) -> jax.Array:
    """Per row: position of the most recent True at or before it."""
    return lax.cummax(jnp.where(flag, iota, -1))


def _next_pos(flag: jax.Array, iota: jax.Array, cap: int) -> jax.Array:
    """Per row: position of the first True strictly after it."""
    marks = jnp.where(flag, iota, cap)
    return jnp.flip(lax.cummin(jnp.flip(jnp.roll(marks, -1).at[-1].set(cap))))


def window_spec(
    part_keys: Sequence[ColVal],
    order_keys: Sequence[tuple[ColVal, bool]],
    calls: Sequence[WindowCall],
    sel: jax.Array,
) -> list[ColVal]:
    """Evaluate `calls` sharing one (PARTITION BY, ORDER BY) spec.
    Returns one (data, valid) per call, in ORIGINAL row order; values on
    unselected rows are garbage (masked by the pipeline selection)."""
    cap = int(sel.shape[0])
    iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)

    # ---- forward sort: unselected last, partition keys, order keys ------
    operands: list[jax.Array] = [jnp.logical_not(sel).astype(jnp.int8)]
    n_pk_ops: list[int] = []
    for data, valid in part_keys:
        d = jnp.broadcast_to(data, (cap,)) if jnp.ndim(data) == 0 else data
        ks = _directed_key(d, valid, True)
        n_pk_ops.append(len(ks))
        operands.extend(ks)
    n_ok_ops: list[int] = []
    for entry in order_keys:
        (data, valid), asc = entry[0], entry[1]
        nf = entry[2] if len(entry) > 2 else False
        d = jnp.broadcast_to(data, (cap,)) if jnp.ndim(data) == 0 else data
        ks = _directed_key(d, valid, asc, nf)
        n_ok_ops.append(len(ks))
        operands.extend(ks)
    num_keys = len(operands) + 1  # + row id for stable ties
    operands.append(iota)

    payload_base = len(operands)
    arg_slots: list[tuple[Optional[int], Optional[int]]] = []
    seen: dict[int, int] = {}
    for c in calls:
        if c.arg is None:
            arg_slots.append((None, None))
            continue
        data, valid = c.arg
        data = jnp.broadcast_to(data, (cap,)) if jnp.ndim(data) == 0 else data
        if id(data) not in seen:
            seen[id(data)] = len(operands)
            operands.append(data)
        di = seen[id(data)]
        vi = None
        if valid is not None:
            if id(valid) not in seen:
                seen[id(valid)] = len(operands)
                operands.append(valid.astype(jnp.int8))
            vi = seen[id(valid)]
        arg_slots.append((di, vi))

    s = lax.sort(operands, num_keys=num_keys)
    rowid = s[payload_base - 1]
    n_valid = jnp.sum(sel.astype(jnp.int32))
    sel_s = iota < n_valid

    # ---- boundaries in sorted space -------------------------------------
    def changed(ops_start: int, n_ops: list[int]) -> jax.Array:
        ch = jnp.zeros((cap,), jnp.bool_)
        k = ops_start
        for n in n_ops:
            for j in range(n):
                a = s[k + j]
                ch = jnp.logical_or(ch, a != jnp.roll(a, 1))
            k += n
        return ch

    pb = jnp.logical_or(iota == 0, changed(1, n_pk_ops))
    # the first unselected row closes the last real partition
    pb = jnp.logical_or(pb, iota == n_valid)
    ob = jnp.logical_or(pb, changed(1 + sum(n_pk_ops), n_ok_ops))

    pstart = _first_pos(pb, iota)
    pend = _next_pos(pb, iota, cap)  # exclusive
    has_order = len(order_keys) > 0

    out_sorted: list[ColVal] = []
    for c, (di, vi) in zip(calls, arg_slots):
        if c.kind == "row_number":
            out_sorted.append(((iota - pstart + 1).astype(physical_np(DataType.Int64)), None))
            continue
        if c.kind == "rank":
            out_sorted.append(
                ((_first_pos(ob, iota) - pstart + 1).astype(physical_np(DataType.Int64)), None)
            )
            continue
        if c.kind == "percent_rank":
            # (rank - 1) / (partition rows - 1); single-row partition → 0
            f64 = physical_np(DataType.Float64)
            rank0 = (_first_pos(ob, iota) - pstart).astype(f64)
            psize = jnp.maximum(jnp.minimum(pend, n_valid) - pstart, 1)
            denom = jnp.maximum(psize - 1, 1).astype(f64)
            out_sorted.append((rank0 / denom, None))
            continue
        if c.kind == "cume_dist":
            # peers-end position / partition rows
            f64 = physical_np(DataType.Float64)
            peers_end = _next_pos(ob, iota, cap)
            psize = jnp.maximum(jnp.minimum(pend, n_valid) - pstart, 1)
            cd = (
                jnp.minimum(peers_end, jnp.minimum(pend, n_valid)) - pstart
            ).astype(f64) / psize.astype(f64)
            out_sorted.append((cd, None))
            continue
        if c.kind == "nth_value":
            # value at the partition's n-th row (whole-partition frame);
            # NULL when the partition has fewer than n rows
            pos = pstart + (c.offset - 1)
            inside = pos < jnp.minimum(pend, n_valid)
            posc = jnp.clip(pos, 0, cap - 1)
            d = jnp.take(s[di], posc)
            v = inside
            if vi is not None:
                v = jnp.logical_and(v, jnp.take(s[vi], posc) > 0)
            out_sorted.append((d, v))
            continue
        if c.kind == "dense_rank":
            obc = jnp.cumsum(ob.astype(jnp.int32))
            dr = obc - jnp.take(obc, jnp.clip(pstart, 0, cap - 1)) + 1
            out_sorted.append((dr.astype(physical_np(DataType.Int64)), None))
            continue
        if c.kind in SHIFTS:
            off = c.offset if c.kind == "lag" else -c.offset
            src = iota - off
            inside = (
                jnp.logical_and(src >= pstart, src < jnp.minimum(pend, n_valid))
                if c.kind == "lead"
                else (src >= pstart)
            )
            srcc = jnp.clip(src, 0, cap - 1)
            d = jnp.take(s[di], srcc)
            v = inside
            if vi is not None:
                v = jnp.logical_and(v, jnp.take(s[vi], srcc) > 0)
            out_sorted.append((d, v))
            continue
        if c.kind in ("sum", "count", "avg"):
            if c.kind == "count" and di is None:
                ok = sel_s
            else:
                ok = sel_s if vi is None else jnp.logical_and(sel_s, s[vi] > 0)
            # i32 count scans: cap < 2^31 always; the UInt64 output
            # dtype is a cast at the write (i64 scans + i64 gathers are
            # emulated multi-pass on the 32-bit VPU — measured ~2-4x)
            ok_i32 = ok.astype(jnp.int32)
            cnt_c = jnp.cumsum(ok_i32)
            if c.frame is not None:
                # explicit ROWS frame: windowed difference of inclusive
                # cumsums over [lo_idx, hi_idx] clipped to the partition.
                # Every per-row stream sampled at the two endpoints rides
                # ONE stacked [n, C] row gather per endpoint (a C-lane
                # row gather costs ~1 lane, PERFLOG r4.8) instead of C
                # scalar gathers at ~7 ns/elem each.
                lo_off, hi_off = c.frame
                last = jnp.clip(jnp.minimum(pend, n_valid) - 1, 0, cap - 1)
                lo_idx = (
                    pstart if lo_off is None else jnp.maximum(pstart, iota + lo_off)
                )
                hi_idx = last if hi_off is None else jnp.minimum(last, iota + hi_off)
                nonempty = hi_idx >= lo_idx
                lo_c = jnp.clip(lo_idx, 0, cap - 1)
                hi_c = jnp.clip(hi_idx, 0, cap - 1)

                acc_dt = None
                is_f32 = False
                incl: list[jax.Array] = [cnt_c]  # i32 lanes (f32 bitcast)
                excl: list[jax.Array] = [cnt_c - ok_i32]
                if c.kind != "count":
                    acc_dt = (
                        s[di].dtype
                        if jnp.issubdtype(s[di].dtype, jnp.floating)
                        else physical_np(DataType.Int64)
                    )
                    contrib = jnp.where(
                        ok, s[di], jnp.zeros((), s[di].dtype)
                    ).astype(acc_dt)
                    is_f32 = contrib.dtype == jnp.float32
                    if jnp.issubdtype(contrib.dtype, jnp.floating):
                        finite = jnp.isfinite(contrib)
                        fin = jnp.where(
                            finite, contrib, jnp.zeros((), contrib.dtype)
                        )
                        nan_i = jnp.isnan(contrib).astype(jnp.int32)
                        pos_i = (contrib == jnp.inf).astype(jnp.int32)
                        neg_i = (contrib == -jnp.inf).astype(jnp.int32)
                        streams = [
                            (jnp.cumsum(fin), fin),
                            (jnp.cumsum(nan_i), nan_i),
                            (jnp.cumsum(pos_i), pos_i),
                            (jnp.cumsum(neg_i), neg_i),
                        ]
                    else:
                        streams = [(jnp.cumsum(contrib), contrib)]
                    for arr_c, arr in streams:
                        if is_f32:
                            incl.append(
                                lax.bitcast_convert_type(arr_c, jnp.int32)
                                if arr_c.dtype == jnp.float32
                                else arr_c
                            )
                            excl.append(
                                lax.bitcast_convert_type(
                                    arr_c - arr, jnp.int32
                                )
                                if arr_c.dtype == jnp.float32
                                else arr_c - arr
                            )
                        else:
                            incl.append(arr_c)
                            excl.append(arr_c - arr)

                def _sample(cols, idx):
                    if all(a.dtype == jnp.int32 for a in cols) and len(cols) > 1:
                        mat = jnp.stack(cols, axis=1)
                        rows = jnp.take(mat, idx, axis=0)
                        return [rows[:, j] for j in range(len(cols))]
                    return [jnp.take(a, idx) for a in cols]

                hi_v = _sample(incl, hi_c)
                lo_v = _sample(excl, lo_c)
                w_cnt = hi_v[0] - lo_v[0]
                if c.kind == "count":
                    d = jnp.where(nonempty, w_cnt, 0)
                    out_sorted.append(
                        (d.astype(physical_np(DataType.UInt64)), None)
                    )
                    continue

                def _unbits(x, dt):
                    if is_f32 and dt == jnp.float32 and x.dtype == jnp.int32:
                        return lax.bitcast_convert_type(x, jnp.float32)
                    return x

                if jnp.issubdtype(acc_dt, jnp.floating):
                    w_sum = _unbits(hi_v[1], acc_dt) - _unbits(lo_v[1], acc_dt)
                    n_nan = hi_v[2] - lo_v[2]
                    n_pos = hi_v[3] - lo_v[3]
                    n_neg = hi_v[4] - lo_v[4]
                    w_sum = jnp.where(
                        n_pos > 0, jnp.asarray(jnp.inf, acc_dt), w_sum
                    )
                    w_sum = jnp.where(
                        n_neg > 0, jnp.asarray(-jnp.inf, acc_dt), w_sum
                    )
                    w_sum = jnp.where(
                        (n_nan > 0) | ((n_pos > 0) & (n_neg > 0)),
                        jnp.asarray(jnp.nan, acc_dt),
                        w_sum,
                    )
                else:
                    w_sum = hi_v[1] - lo_v[1]
                if c.kind == "avg":
                    d = w_sum.astype(physical_np(DataType.Float64))
                    d = d / jnp.maximum(w_cnt, 1)
                else:
                    d = w_sum.astype(s[di].dtype)
                out_sorted.append((d, jnp.logical_and(nonempty, w_cnt > 0)))
                continue

            # ---- running / whole-partition: GATHER-FREE ----------------
            # "value at my partition's start" never needs a random
            # gather: exclusive count/pos-sum cumsums are NON-DECREASING
            # (neg-sums non-increasing), so the boundary sample forward-
            # fills with a plain cummax (cummin); non-finite presence is
            # a latest-indicator-position cummax compared against
            # pstart. The previous take()-based formulation paid ~10
            # scalar gathers at 33.5M rows ≈ 7.5 s on chip (c6 profile).
            def _ffill_inc(vals, ident):
                return lax.cummax(jnp.where(pb, vals, ident))

            def _ffill_dec(vals, ident):
                return lax.cummin(jnp.where(pb, vals, ident))

            pe = jnp.roll(pb, -1).at[-1].set(True)  # partition-end rows

            def _bfill_inc(vals, ident):
                # value at my partition's END row, for a stream
                # non-decreasing within the partition
                r = jnp.where(pe, vals, ident)
                return jnp.flip(lax.cummin(jnp.flip(r)))

            cnt_first = _ffill_inc(cnt_c - ok_i32, jnp.iinfo(jnp.int32).min)
            run_c = cnt_c - cnt_first
            if not has_order:  # whole partition: count at partition end
                run_c = _bfill_inc(cnt_c, jnp.iinfo(jnp.int32).max) - cnt_first
            if c.kind == "count":
                out_sorted.append(
                    (run_c.astype(physical_np(DataType.UInt64)), None)
                )
                continue
            acc_dt = (
                s[di].dtype
                if jnp.issubdtype(s[di].dtype, jnp.floating)
                else physical_np(DataType.Int64)
            )
            contrib = jnp.where(ok, s[di], jnp.zeros((), s[di].dtype)).astype(acc_dt)
            floating = jnp.issubdtype(acc_dt, jnp.floating)
            fin = (
                jnp.where(jnp.isfinite(contrib), contrib, jnp.zeros((), acc_dt))
                if floating
                else contrib
            )
            pos_p = jnp.maximum(fin, jnp.zeros((), acc_dt))
            neg_p = jnp.minimum(fin, jnp.zeros((), acc_dt))
            c_pos = jnp.cumsum(pos_p)
            c_neg = jnp.cumsum(neg_p)
            if floating:
                top = jnp.asarray(jnp.inf, acc_dt)
            else:
                top = jnp.asarray(jnp.iinfo(acc_dt).max, acc_dt)
            f_pos = _ffill_inc(c_pos - pos_p, -top)
            f_neg = _ffill_dec(c_neg - neg_p, top)
            if has_order:
                run_s = (c_pos - f_pos) + (c_neg - f_neg)
            else:
                run_s = (_bfill_inc(c_pos, top) - f_pos) + (
                    jnp.flip(lax.cummax(jnp.flip(jnp.where(pe, c_neg, -top))))
                    - f_neg
                )
            if floating:
                # window contains a non-finite value iff the latest
                # occurrence at/before me (or anywhere in my partition,
                # whole-partition case) is ≥ my partition's start
                def _has(flag):
                    latest = _first_pos(flag, iota)
                    if not has_order:
                        # value at MY partition's end row = the NEAREST
                        # end row at/after me: reverse cumMIN (latest[]
                        # is globally non-decreasing, so a reverse
                        # cummax would pick the LAST partition's end —
                        # reporting other partitions' non-finites; the
                        # dark-corner fuzzer caught exactly that)
                        latest = jnp.flip(
                            lax.cummin(
                                jnp.flip(jnp.where(pe, latest, cap))
                            )
                        )
                    return latest >= pstart

                has_nan = _has(jnp.isnan(contrib))
                has_pos = _has(contrib == jnp.inf)
                has_neg = _has(contrib == -jnp.inf)
                run_s = jnp.where(has_pos, jnp.asarray(jnp.inf, acc_dt), run_s)
                run_s = jnp.where(has_neg, jnp.asarray(-jnp.inf, acc_dt), run_s)
                run_s = jnp.where(
                    has_nan | (has_pos & has_neg),
                    jnp.asarray(jnp.nan, acc_dt),
                    run_s,
                )
            if c.kind == "avg":
                d = run_s.astype(physical_np(DataType.Float64))
                d = d / jnp.maximum(run_c, 1)
            else:
                d = run_s.astype(s[di].dtype)
            out_sorted.append((d, run_c > 0))
            continue
        if c.kind in ("min", "max") and has_order and c.frame != (None, None):
            # running extreme: segmented scan — (value, boundary) pairs
            # under the associative op "right boundary resets"
            # (lax.associative_scan, log-depth on device)
            ok = sel_s if vi is None else jnp.logical_and(sel_s, s[vi] > 0)
            # scan on the sortable int image: raw-float jnp.minimum
            # propagates NaN into MIN, diverging from the grouped
            # aggregate convention (NaN sorts past +inf: MIN ignores it
            # unless all-NaN, MAX reports it) — aggregate.py
            # to_sortable_int is the one total order every path shares
            from datafusion_tpu.ops.aggregate import (
                from_sortable_int,
                to_sortable_int,
            )

            img = to_sortable_int(s[di])
            info = jnp.iinfo(img.dtype)
            ident = jnp.asarray(
                info.max if c.kind == "min" else info.min, img.dtype
            )
            vals = jnp.where(ok, img, ident)
            ext = jnp.minimum if c.kind == "min" else jnp.maximum

            def seg_op(a, b, ext=ext):
                v = jnp.where(b[1], b[0], ext(a[0], b[0]))
                return (v, jnp.logical_or(a[1], b[1]))

            run_v, _ = lax.associative_scan(seg_op, (vals, pb))
            run_v = from_sortable_int(run_v, s[di].dtype)
            # validity: any valid argument so far in the partition
            okc = jnp.cumsum(ok.astype(jnp.int32))
            ok_first = jnp.take(okc, jnp.clip(pstart, 0, cap - 1)) - jnp.take(
                ok.astype(jnp.int32), jnp.clip(pstart, 0, cap - 1)
            )
            out_sorted.append((run_v, (okc - ok_first) > 0))
            continue
        if c.kind in ("first_value", "last_value"):
            # default: whole-partition semantics (documented deviation:
            # standard LAST_VALUE's default frame ends at the current
            # row). An explicit ROWS frame is honored exactly.
            if c.frame is not None:
                lo_off, hi_off = c.frame
                last = jnp.clip(jnp.minimum(pend, n_valid) - 1, 0, cap - 1)
                lo_idx = (
                    pstart if lo_off is None else jnp.maximum(pstart, iota + lo_off)
                )
                hi_idx = last if hi_off is None else jnp.minimum(last, iota + hi_off)
                nonempty = hi_idx >= lo_idx
                pos = jnp.clip(
                    lo_idx if c.kind == "first_value" else hi_idx, 0, cap - 1
                )
                d = jnp.take(s[di], pos)
                v = nonempty
                if vi is not None:
                    v = jnp.logical_and(v, jnp.take(s[vi], pos) > 0)
                out_sorted.append((d, v))
                continue
            pos = (
                jnp.clip(pstart, 0, cap - 1)
                if c.kind == "first_value"
                else jnp.clip(jnp.minimum(pend, n_valid) - 1, 0, cap - 1)
            )
            d = jnp.take(s[di], pos)
            v = None if vi is None else jnp.take(s[vi], pos) > 0
            out_sorted.append((d, v))
            continue
        if c.kind == "ntile":
            nt = max(int(c.offset), 1)
            psize = jnp.maximum(jnp.minimum(pend, n_valid) - pstart, 1)
            rn0 = iota - pstart
            tile = (rn0 * nt) // psize + 1
            out_sorted.append((tile.astype(physical_np(DataType.Int64)), None))
            continue
        if c.kind in ("min", "max"):
            # dedicated sub-spec: the argument rides as the ORDER BY key
            # (ascending for MIN, descending for MAX, NULLs last either
            # way), so the extreme is the value at the partition start.
            # The KEY is the sortable int image, not the raw float:
            # lax.sort's comparator puts NaN last in BOTH directions,
            # which would make MAX skip NaN and diverge from the grouped
            # aggregate convention (NaN past +inf ⇒ MAX reports NaN)
            from datafusion_tpu.ops.aggregate import to_sortable_int

            arg_d, arg_v = c.arg
            key_cv = (to_sortable_int(arg_d), arg_v)
            (sub,) = window_spec(
                part_keys,
                [(key_cv, c.kind == "min")],
                [WindowCall("first_in_partition", c.arg)],
                sel,
            )
            out_sorted.append(("__READY__", sub))  # already in source order
            continue
        if c.kind == "first_in_partition":
            # internal: value of the argument at the partition start (the
            # caller ordered the spec so this is the MIN or MAX)
            st = jnp.clip(pstart, 0, cap - 1)
            d = jnp.take(s[di], st)
            v = None if vi is None else jnp.take(s[vi], st) > 0
            out_sorted.append((d, v))
            continue
        raise NotImplementedError_(f"window function '{c.kind}' is not supported")

    # ---- ride results back to original row order -------------------------
    back_ops: list[jax.Array] = [rowid]
    back_plan: list[tuple[Optional[int], Optional[int], Optional[ColVal]]] = []
    for d, v in out_sorted:
        if isinstance(d, str):  # min/max computed in their own spec sort,
            back_plan.append((None, None, v))  # already in original order
            continue
        di2 = len(back_ops)
        back_ops.append(d)
        vi2 = None
        if v is not None:
            vi2 = len(back_ops)
            back_ops.append(v.astype(jnp.int8))
        back_plan.append((di2, vi2, None))
    if len(back_ops) > 1:
        b = lax.sort(back_ops, num_keys=1)
    out: list[ColVal] = []
    for di2, vi2, ready in back_plan:
        if ready is not None:
            out.append(ready)
            continue
        out.append(
            (b[di2], None if vi2 is None else b[vi2].astype(jnp.bool_))
        )
    return out
