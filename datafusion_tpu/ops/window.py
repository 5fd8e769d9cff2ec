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


def _sum_limbs(fin: jax.Array, cap: int):
    """Exact windowed-sum machinery for f32 contributions.

    A plain f32 cumsum difference is catastrophically wrong at scale:
    the global prefix's ULP (256 at 33.5M rows of ~50-magnitude
    values) dwarfs partition-local sums — measured rel error up to 3.0
    on chip (r5). Fix: quantize at 2³⁶/max|v| (the f32 product rounds
    relative to each element) and decompose into limbs of `bits` where
    `cap · 2^(bits) ≤ 2³⁰` — so even a FULL-capacity partition cannot
    overflow a limb's i32 prefix: the limb cumsums are exact AND
    monotone (every limb non-negative), which lets endpoint samples
    ride shifts + cummax/cummin partition fills instead of gathers.
    Only the TOP limb is signed; it shifts non-negative by 2^(bits−1)
    in INTEGER space (an f32 `q + 2³⁶` shift would round away the low
    bits), and window sums subtract `count × 2^(bits−1)` from the top
    limb IN i32 before assembly.

    Returns (limbs, weights, top_shift) where limbs are non-negative
    i32 streams high→low and weights[j] converts limb-j window sums
    back to value units (f32, includes C·2⁻³⁶)."""
    import math

    bits = max(30 - math.ceil(math.log2(max(cap, 2))), 2)
    nlimbs = math.ceil(38 / bits)
    C = jnp.max(jnp.abs(fin)) + jnp.float32(1.0)
    S = jnp.exp2(jnp.float32(36.0)) / C
    q = fin * S  # signed, |q| ≤ 2^36, f32 element-rounded
    scale_top = 2.0 ** (bits * (nlimbs - 1))
    l_top = jnp.floor(q * jnp.float32(1.0 / scale_top))  # |.| ≤ 2^(bits-1)
    rem = q - l_top * jnp.float32(scale_top)  # in [0, scale_top)
    top_shift = 1 << (bits - 1)
    limbs = [(l_top + jnp.float32(top_shift)).astype(jnp.int32)]
    weights = [jnp.float32(scale_top) * C * jnp.float32(2.0**-36)]
    for j in reversed(range(nlimbs - 1)):
        scale = 2.0 ** (bits * j)
        l = jnp.floor(rem * jnp.float32(1.0 / scale))
        rem = rem - l * jnp.float32(scale)
        limbs.append(l.astype(jnp.int32))
        weights.append(jnp.float32(scale) * C * jnp.float32(2.0**-36))
    return limbs, weights, top_shift


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
            pe = jnp.roll(pb, -1).at[-1].set(True)  # partition-end rows
            imax = jnp.iinfo(jnp.int32).max
            imin = jnp.iinfo(jnp.int32).min

            def _ffill_inc(vals):
                # value at my partition's START row (stream must be
                # non-decreasing: the boundary sample forward-fills
                # with a plain cummax)
                return lax.cummax(jnp.where(pb, vals, imin))

            def _bfill_inc(vals):
                # value at my partition's END row (non-decreasing
                # stream: nearest end row = reverse cummin)
                return jnp.flip(lax.cummin(jnp.flip(jnp.where(pe, vals, imax))))

            def _shifted(arr, off, pad):
                if off == 0:
                    return arr
                r = jnp.roll(arr, -off)
                okr = jnp.logical_and(iota + off >= 0, iota + off < cap)
                return jnp.where(okr, r, pad)

            lo_off = hi_off = None
            framed = c.frame is not None
            if framed:
                lo_off, hi_off = c.frame
                last = jnp.clip(jnp.minimum(pend, n_valid) - 1, 0, cap - 1)
                lo_idx = (
                    pstart if lo_off is None else jnp.maximum(pstart, iota + lo_off)
                )
                hi_idx = last if hi_off is None else jnp.minimum(last, iota + hi_off)
                nonempty = hi_idx >= lo_idx
                width = hi_idx - lo_idx + 1
            elif has_order:
                width = iota - pstart + 1
            else:
                last = jnp.clip(jnp.minimum(pend, n_valid) - 1, 0, cap - 1)
                width = last - pstart + 1

            def _win(inc_c, per_row):
                """Windowed difference of a NON-DECREASING i32 cumsum
                `inc_c` (per-row contribution `per_row`) over the
                call's window — framed [lo, hi], running [pstart, i],
                or whole-partition [pstart, last] — sampled entirely
                with shifts + partition fills (indices are iota+static
                offsets clamped to the partition: a clamped sample of a
                monotone stream is the min/max of the shifted stream
                and the partition-boundary fill). No gathers."""
                excl = inc_c - per_row
                if framed:
                    hi_v = _bfill_inc(inc_c)
                    if hi_off is not None:
                        hi_v = jnp.minimum(_shifted(inc_c, hi_off, imax), hi_v)
                    lo_v = _ffill_inc(excl)
                    if lo_off is not None:
                        lo_v = jnp.maximum(_shifted(excl, lo_off, imin), lo_v)
                    return hi_v - lo_v
                if has_order:
                    return inc_c - _ffill_inc(excl)
                return _bfill_inc(inc_c) - _ffill_inc(excl)

            w_cnt = _win(cnt_c, ok_i32)
            if c.kind == "count":
                d = w_cnt
                if framed:
                    d = jnp.where(nonempty, d, 0)
                out_sorted.append((d.astype(physical_np(DataType.UInt64)), None))
                continue

            acc_dt = (
                s[di].dtype
                if jnp.issubdtype(s[di].dtype, jnp.floating)
                else physical_np(DataType.Int64)
            )
            contrib = jnp.where(ok, s[di], jnp.zeros((), s[di].dtype)).astype(acc_dt)
            if contrib.dtype == jnp.float32:
                # exact limb path (see _sum_limbs: a raw f32 cumsum
                # difference measured rel error up to 3.0 at 33.5M rows
                # — the global prefix's ULP dwarfs partition sums)
                fin = jnp.where(
                    jnp.isfinite(contrib), contrib, jnp.zeros((), jnp.float32)
                )
                limbs, weights, top_shift = _sum_limbs(fin, cap)
                w_sum = jnp.zeros((cap,), jnp.float32)
                for j, (l, w) in enumerate(zip(limbs, weights)):
                    part = _win(jnp.cumsum(l), l)
                    if j == 0:
                        # every row's top limb carries +top_shift; the
                        # window contains `width` rows — subtract in
                        # i32 BEFORE assembly (an f32 subtraction of
                        # count*2^36 would cancel catastrophically)
                        part = part - width * jnp.int32(top_shift)
                    w_sum = w_sum + part.astype(jnp.float32) * w
                # IEEE restore from non-finite presence in the window
                nan_i = jnp.isnan(contrib).astype(jnp.int32)
                pos_i = (contrib == jnp.inf).astype(jnp.int32)
                neg_i = (contrib == -jnp.inf).astype(jnp.int32)
                n_nan = _win(jnp.cumsum(nan_i), nan_i)
                n_pos = _win(jnp.cumsum(pos_i), pos_i)
                n_neg = _win(jnp.cumsum(neg_i), neg_i)
                w_sum = jnp.where(n_pos > 0, jnp.asarray(jnp.inf, jnp.float32), w_sum)
                w_sum = jnp.where(n_neg > 0, jnp.asarray(-jnp.inf, jnp.float32), w_sum)
                w_sum = jnp.where(
                    (n_nan > 0) | ((n_pos > 0) & (n_neg > 0)),
                    jnp.asarray(jnp.nan, jnp.float32),
                    w_sum,
                )
            else:
                # f64 (CPU x64 parity: cumsum differences are exact to
                # ~1e-13 there) and integer accumulators (exact mod
                # 2^32 under the engine's physical int width): the
                # pos/neg monotone split keeps the samples gather-free
                fin = (
                    jnp.where(
                        jnp.isfinite(contrib), contrib, jnp.zeros((), acc_dt)
                    )
                    if jnp.issubdtype(acc_dt, jnp.floating)
                    else contrib
                )
                pos_p = jnp.maximum(fin, jnp.zeros((), fin.dtype))
                neg_p = jnp.minimum(fin, jnp.zeros((), fin.dtype))
                if jnp.issubdtype(fin.dtype, jnp.floating):
                    top = jnp.asarray(jnp.inf, fin.dtype)
                else:
                    top = jnp.asarray(jnp.iinfo(fin.dtype).max, fin.dtype)

                def _win_t(inc_c, per_row, t):
                    # _win generalized to the stream's own dtype idents
                    excl = inc_c - per_row

                    def ff(v):
                        return lax.cummax(jnp.where(pb, v, -t))

                    def bf(v):
                        return jnp.flip(
                            lax.cummin(jnp.flip(jnp.where(pe, v, t)))
                        )

                    if framed:
                        hi_v = bf(inc_c)
                        if hi_off is not None:
                            hi_v = jnp.minimum(_shifted(inc_c, hi_off, t), hi_v)
                        lo_v = ff(excl)
                        if lo_off is not None:
                            lo_v = jnp.maximum(_shifted(excl, lo_off, -t), lo_v)
                        return hi_v - lo_v
                    if has_order:
                        return inc_c - ff(excl)
                    return bf(inc_c) - ff(excl)

                w_sum = _win_t(jnp.cumsum(pos_p), pos_p, top) + (
                    -_win_t(jnp.cumsum(-neg_p), -neg_p, top)
                )
                if jnp.issubdtype(acc_dt, jnp.floating):
                    nan_i = jnp.isnan(contrib).astype(jnp.int32)
                    pos_i = (contrib == jnp.inf).astype(jnp.int32)
                    neg_i = (contrib == -jnp.inf).astype(jnp.int32)
                    n_nan = _win(jnp.cumsum(nan_i), nan_i)
                    n_pos = _win(jnp.cumsum(pos_i), pos_i)
                    n_neg = _win(jnp.cumsum(neg_i), neg_i)
                    w_sum = jnp.where(n_pos > 0, jnp.asarray(jnp.inf, acc_dt), w_sum)
                    w_sum = jnp.where(
                        n_neg > 0, jnp.asarray(-jnp.inf, acc_dt), w_sum
                    )
                    w_sum = jnp.where(
                        (n_nan > 0) | ((n_pos > 0) & (n_neg > 0)),
                        jnp.asarray(jnp.nan, acc_dt),
                        w_sum,
                    )

            if c.kind == "avg":
                d = w_sum.astype(physical_np(DataType.Float64))
                d = d / jnp.maximum(w_cnt, 1)
            else:
                d = w_sum.astype(s[di].dtype)
            v_out = w_cnt > 0
            if framed:
                v_out = jnp.logical_and(nonempty, v_out)
            out_sorted.append((d, v_out))
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
