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

import os
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from datafusion_tpu.errors import NotImplementedError_
from datafusion_tpu.types import DataType, physical_np

ColVal = tuple[jax.Array, Optional[jax.Array]]


def segmented_reduce_sorted_import():
    from datafusion_tpu.ops.pallas.segreduce import segmented_reduce_sorted

    return segmented_reduce_sorted


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

    func: str  # min | max | sum | count | avg | median | percentile
    arg: ColVal
    out_dtype: DataType
    q: float = 0.5  # percentile fraction (median = 0.5)
    # compiler-probed ingest statistic: the argument is a pure scanned,
    # non-nullable float column whose buffer (padding included) holds no
    # NaN/±inf — SUM/AVG may skip the zero-sanitize and the whole
    # ieee_sum_cond pre-scan + conditional exact path
    finite_arg: bool = False


# Non-finite float SUM inputs cannot ride the kernels' one-hot dot
# products (0 * NaN = NaN poisons whole accumulator windows — PERFLOG
# r3.4), so kernel sum rows carry ZERO-sanitized values (exact when the
# column is all-finite) and ieee_sum_cond restores full IEEE-754
# semantics: a fused any-non-finite pre-scan routes columns that DO
# contain NaN/±inf to an exact scatter segment_sum over the raw values,
# executed only then (lax.cond). This replaces r3's single-marker
# NANSAFE_K encoding, whose decode collapsed +inf/-inf/NaN to NaN and
# misread legitimate |sum| >= 2^95 (VERDICT r3 weak #3 / next #4):
# float SUM semantics are now path-independent and match the XLA
# fallback bit-for-bit on the rare special-containing columns.


def sanitize_nonfinite(data: jax.Array) -> jax.Array:
    return jnp.where(
        jnp.isfinite(data), data, jnp.zeros((), data.dtype)
    )


def ieee_sum_cond(
    kernel_sum: jax.Array,
    data: jax.Array,
    mask: jax.Array,
    seg_ids: jax.Array,
) -> jax.Array:
    """kernel_sum[g] holds the zero-sanitized kernel reduction; return
    the IEEE sum per group. Cheap pre-scan (one fused reduce over a
    column the sanitize pass already reads) + conditional exact path:
    jax scatter-add propagates NaN/inf per IEEE (inf + -inf = NaN, any
    NaN wins), and out-of-range seg_ids (unselected rows) drop."""
    has = jnp.any(jnp.logical_and(mask, jnp.logical_not(jnp.isfinite(data))))

    def exact():
        # seg_ids may be a zero-arg thunk: tracing it HERE keeps its
        # cumsum inside the rarely-executed branch (the packed pallas
        # path derives ids in-kernel and never pays it otherwise)
        ids = seg_ids() if callable(seg_ids) else seg_ids
        return jax.ops.segment_sum(
            jnp.where(mask, data, jnp.zeros((), data.dtype)),
            ids,
            num_segments=int(kernel_sum.shape[0]),
        ).astype(kernel_sum.dtype)

    return lax.cond(has, exact, lambda: kernel_sum)


def limb_prefix_group_sums(
    contrib: jax.Array, ends: jax.Array, capacity: int
) -> jax.Array:
    """Exact-class scatter-free f32 group sums over SORTED rows.

    `contrib` must be masked (invalid rows zero) and finite (non-finite
    restore is the caller's ieee_sum_cond). Each value is quantized at
    2⁴⁸/max|v| — the product f32-rounds RELATIVE TO THE ELEMENT (6e-8),
    so precision matches a per-element f32 reduction; elements below
    max|v|·2⁻²⁵ quantize with negligible absolute error (≤ max·2⁻⁴⁹).
    The integer-valued f32 q decomposes EXACTLY into four 12-bit limbs;
    each limb cumsums in i32 (prefixes wrap, but per-group differences
    are exact mod 2³² while the largest group is < 2¹⁹ rows — the
    caller guards oversized groups). Groups tile the sorted rows
    contiguously, so the four limb streams sample with ONE [n, 4] row
    gather at the group ends; the exclusive start is the previous
    group's end (PERFLOG r5: each scalar 2M-from-33.5M take costs
    ~23 ms; segment_sum's scatter 293 ms; an i32 cumsum 7.7 ms).

    Returns f32 sums per group (0 for empty groups)."""
    C = jnp.max(jnp.abs(contrib)) + jnp.float32(1.0)
    S = jnp.exp2(jnp.float32(48.0)) / C
    q = contrib * S  # f32-rounded per element, |q| ≤ 2^48, integer-valued
    # exact 12-bit limb decomposition of an integer-valued f32
    l3 = jnp.floor(q * jnp.float32(2.0**-36))
    r3 = q - l3 * jnp.float32(2.0**36)
    l2 = jnp.floor(r3 * jnp.float32(2.0**-24))
    r2 = r3 - l2 * jnp.float32(2.0**24)
    l1 = jnp.floor(r2 * jnp.float32(2.0**-12))
    l0 = r2 - l1 * jnp.float32(2.0**12)
    incl = jnp.stack(
        [jnp.cumsum(l.astype(jnp.int32)) for l in (l3, l2, l1, l0)], axis=1
    )
    idx = jnp.clip(ends - 1, 0, capacity - 1)
    ge = jnp.where(
        (ends > 0)[:, None], jnp.take(incl, idx, axis=0), jnp.int32(0)
    )
    gp = jnp.concatenate(
        [jnp.zeros((1, 4), jnp.int32), ge[:-1]], axis=0
    )
    d = (ge - gp).astype(jnp.float32)
    inv = C * jnp.float32(2.0**-48)
    return (
        d[:, 0] * (inv * jnp.float32(2.0**36))
        + d[:, 1] * (inv * jnp.float32(2.0**24))
        + d[:, 2] * (inv * jnp.float32(2.0**12))
        + d[:, 3] * inv
    )


def _sentinel(dtype, minimum: bool):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(-jnp.inf if minimum else jnp.inf, dtype)
    if jnp.dtype(dtype) == jnp.dtype(jnp.bool_):
        # MIN/MAX over Boolean (false < true): the neutral element
        return jnp.asarray(not minimum, jnp.bool_)
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
        if spec.func in ("count_distinct", "sum_distinct", "avg_distinct"):
            # sort values (masked rows last); distinct = run starts
            nm = jnp.logical_not(mask).astype(jnp.int8)
            sres = lax.sort([nm, data], num_keys=2)
            vs = sres[1]
            cap = int(sel.shape[0])
            io = lax.broadcasted_iota(jnp.int32, (cap,), 0)
            msorted = io < n
            first = jnp.logical_and(
                msorted, jnp.logical_or(io == 0, vs != jnp.roll(vs, 1))
            )
            cnt = jnp.sum(first)
            if spec.func == "count_distinct":
                outs.append((cnt.astype(physical_np(spec.out_dtype)), None))
                continue
            f64 = physical_np(DataType.Float64)
            sd = jnp.sum(jnp.where(first, vs, jnp.zeros((), vs.dtype)).astype(f64))
            if spec.func == "avg_distinct":
                sd = sd / jnp.maximum(cnt, 1).astype(f64)
            outs.append((sd.astype(physical_np(spec.out_dtype)), cnt > 0))
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
        elif spec.func in ("var_pop", "var_samp", "stddev_pop", "stddev_samp"):
            # two-pass: mean first, then squared deviations — stable
            # where E[x²]−E[x]² cancels (stddev ≪ mean)
            xm = jnp.where(mask, data, jnp.zeros((), data.dtype))
            nn = jnp.maximum(n, 1).astype(data.dtype)
            mean = jnp.sum(xm) / nn
            dev = jnp.where(mask, data - mean, jnp.zeros((), data.dtype))
            ss = jnp.sum(dev * dev)
            if spec.func.endswith("_pop"):
                r = ss / nn
                ok = n > 0
            else:
                r = ss / jnp.maximum(n - 1, 1).astype(data.dtype)
                ok = n > 1
            if spec.func.startswith("stddev"):
                r = jnp.sqrt(r)
            outs.append((r.astype(physical_np(spec.out_dtype)), ok))
            continue
        elif spec.func in (
            "median", "percentile", "percentile_disc", "percentile_disc_desc"
        ):
            # sort valid values to the front; CONT linear-interpolates at
            # the fractional rank, DISC picks the first value whose
            # cumulative fraction reaches q (ceil(q*n) - 1); DISC over a
            # DESC ordering is the ascending position n - ceil(q*n)
            # (NOT the q -> 1-q flip, which is off by one on boundaries)
            nm = jnp.logical_not(mask).astype(jnp.int8)
            img = to_sortable_int(data)
            vs = lax.sort([nm, img], num_keys=2)[1]
            f64 = physical_np(DataType.Float64)
            cap = int(sel.shape[0])
            if spec.func in ("percentile_disc", "percentile_disc_desc"):
                pos = jnp.ceil(n.astype(f64) * spec.q).astype(jnp.int32)
                pos = jnp.clip(pos, 1, jnp.maximum(n, 1))
                if spec.func == "percentile_disc_desc":
                    pos = n - pos
                else:
                    pos = pos - 1
                pos = jnp.clip(pos, 0, jnp.maximum(n - 1, 0))
                r = from_sortable_int(
                    jnp.take(vs, jnp.clip(pos, 0, cap - 1)), data.dtype
                ).astype(f64)
            else:
                rank = (n - 1).astype(f64) * spec.q
                lo = jnp.floor(rank).astype(jnp.int32)
                hi = jnp.ceil(rank).astype(jnp.int32)
                v_lo = from_sortable_int(
                    jnp.take(vs, jnp.clip(lo, 0, cap - 1)), data.dtype
                ).astype(f64)
                v_hi = from_sortable_int(
                    jnp.take(vs, jnp.clip(hi, 0, cap - 1)), data.dtype
                ).astype(f64)
                r = v_lo + (v_hi - v_lo) * (rank - lo.astype(f64))
        else:
            raise NotImplementedError_(f"aggregate function {spec.func}")
        outs.append((r.astype(physical_np(spec.out_dtype)), n > 0))
    return outs


def to_sortable_int(x: jax.Array) -> jax.Array:
    """Order-preserving bijection float32 → int32 (sign-magnitude to
    two's-complement trick), enabling GROUP BY on float keys — the
    reference's GroupByScalar had no float variant (aggregate.rs:66-76).
    NaNs map to the top of the order. Identity for integer inputs."""
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return x
    if x.dtype == jnp.float64:  # CPU/x64 path keeps full f64 key precision
        bits = lax.bitcast_convert_type(x, jnp.int64)
        int_min = jnp.int64(-(2**63))
    else:
        bits = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
        int_min = jnp.int32(-2147483648)
    return jnp.where(bits < 0, int_min - bits, bits)  # self-inverse


def from_sortable_int(bits: jax.Array, dtype) -> jax.Array:
    """Inverse of to_sortable_int."""
    if not jnp.issubdtype(jnp.dtype(dtype), jnp.floating):
        return bits
    if bits.dtype == jnp.int64:
        orig = jnp.where(bits < 0, jnp.int64(-(2**63)) - bits, bits)
        return lax.bitcast_convert_type(orig, jnp.float64).astype(dtype)
    orig = jnp.where(bits < 0, jnp.int32(-2147483648) - bits, bits)
    return lax.bitcast_convert_type(orig, jnp.float32).astype(dtype)


def _key_sort_operands(key_cols, sel):
    """Leading sort operands: not-selected flag then null-first key parts.
    Float keys ride their order-preserving int32 image."""
    skeys = []
    for kd, kv in key_cols:
        if kv is not None:
            skeys.append(jnp.logical_not(kv).astype(jnp.int8))
        skeys.append(to_sortable_int(kd))
    notsel = jnp.logical_not(sel).astype(jnp.int8)
    return notsel, skeys


DENSE_MAX_GROUPS = 2047  # domain + NULL slot must fit the W=2048 window


def dense_pack_gid(key_cols, domain_size, key_offset):
    """Mixed-radix pack of small-domain keys into a dense group id.
    Multiple keys pack major-to-minor (group order = key order); a
    nullable key gets an extra radix slot (NULL sorts after its values).
    `key_offset[i]` shifts raw integer keys in [offset, offset+domain)
    onto [0, domain) — the compiler probes scanned key columns' min/max.
    Returns (gid [cap] i32 in [0, nslots), doms, offs, radices, strides,
    nslots)."""
    doms = (
        [int(domain_size)]
        if isinstance(domain_size, int)
        else [int(d) for d in domain_size]
    )
    offs = (
        [int(key_offset)]
        if isinstance(key_offset, int)
        else [int(o) for o in key_offset]
    )
    # radix per key (decided at trace time: nullable keys carry a NULL
    # slot after their value codes)
    radices = [
        d + (1 if kv is not None else 0)
        for (kd, kv), d in zip(key_cols, doms)
    ]
    nslots = 1
    for r in radices:
        nslots *= r
    strides = []
    acc = nslots
    for r in radices:
        acc //= r
        strides.append(acc)
    capacity = int(key_cols[0][0].shape[0])
    gid = jnp.zeros((capacity,), jnp.int32)
    for (kd, kv), d, off, r in zip(key_cols, doms, offs, radices):
        code = kd if off == 0 else kd - jnp.asarray(off, kd.dtype)
        code = code.astype(jnp.int32) if code.dtype != jnp.int32 else code
        code = jnp.clip(code, 0, d - 1)
        if kv is not None:
            code = jnp.where(kv, code, d)
        gid = gid * r + code
    return gid, doms, offs, radices, strides, nslots


def dense_window_aggregate(
    key_cols: Sequence[ColVal],
    specs: Sequence[AggSpec],
    sel: jax.Array,
    domain_size,
    key_offset,
    run_kernel,
    slot_gid=None,
    out_slots: int | None = None,
    ieee_fix=None,
):
    """Shared dense-window GROUP BY machinery: pack the group id, build
    the per-op (op, value, mask) rows, hand them to `run_kernel`, and
    decode the returned windows into the grouped_aggregate contract.

    run_kernel(gid, sel, k_ops, k_vals, k_masks, nslots) -> per-op slot
    arrays of length `out_slots` — the single-chip version reduces on
    the segreduce dense kernel; the distributed version routes rows over
    ICI and folds inside the exchange (ops/pallas/ragged_shuffle.py
    ragged_exchange_fold). `slot_gid[i]` maps output slot i back to its
    packed gid for key decoding (default: identity; the distributed
    fold's device d holds gids {w*n_dev + d}).

    ieee_fix(kernel_sum, data, mask, gid_routed) restores IEEE float SUM
    semantics for special-containing columns (default: the local
    ieee_sum_cond; distributed callers supply a globally-reduced
    variant whose collectives stay OUTSIDE the conditional).

    Returns (out_keys, out_aggs, out_sel, n_slots_i32)."""
    gid, doms, offs, radices, strides, nslots = dense_pack_gid(
        key_cols, domain_size, key_offset
    )
    kd = key_cols[0][0]  # for the exists-count value row below
    base_mask = sel

    k_ops = ["count"]  # group-existence counts (also validity/avg)
    k_vals = [kd.astype(jnp.float32)]
    k_masks = [base_mask]
    k_slots: list = [("exists", None)]
    counted: dict = {}
    _mask_cache: dict = {}  # id(valid) -> one shared mask array (specs
    # sharing a validity share one mask object: fewer kernel one-hots,
    # fewer packed mask bits on the bigdense path)

    def _mask_for(valid):
        if valid is None:
            return base_mask
        if id(valid) not in _mask_cache:
            _mask_cache[id(valid)] = jnp.logical_and(base_mask, valid)
        return _mask_cache[id(valid)]

    _enc_cache: dict = {}  # id(data) -> zero-sanitized values

    def _encoded(data):
        # non-finite values POISON the kernels' one-hot sum products
        # (0 * NaN = NaN spreads across the whole window/placement
        # block): they ride zero-sanitized; ieee_fix restores the IEEE
        # result for the (rare) special-containing columns at decode
        if id(data) not in _enc_cache:
            _enc_cache[id(data)] = sanitize_nonfinite(data)
        return _enc_cache[id(data)]

    nansafe_sums: set = set()  # spec indices whose sum rode sanitized

    for si, spec in enumerate(specs):
        data, valid = spec.arg
        data = jnp.broadcast_to(data, sel.shape) if jnp.ndim(data) == 0 else data
        mask = _mask_for(valid)
        if spec.func in ("sum", "avg"):
            if jnp.issubdtype(data.dtype, jnp.floating) and not spec.finite_arg:
                k_vals.append(_encoded(data))
                nansafe_sums.add(si)
            else:
                # int sums, or float args compiler-probed all-finite
                # (ingest statistics): no sanitize pass, no ieee cond
                k_vals.append(data)
            k_ops.append("sum")
            k_masks.append(mask)
            k_slots.append(("agg", si))
        elif spec.func in ("min", "max"):
            k_ops.append(spec.func)
            k_vals.append(data)
            k_masks.append(mask)
            k_slots.append(("agg", si))
        if spec.func == "count" or spec.func == "avg" or valid is not None:
            ck = id(mask)
            if ck not in counted:
                counted[ck] = True
                k_ops.append("count")
                k_vals.append(data.astype(jnp.float32))
                k_masks.append(mask)
                k_slots.append(("cnt", id(mask)))

    kinds = tuple(slot[0] for slot in k_slots)
    try:
        # implementations that understand slot kinds (bigdense: 0/1
        # special indicators ride gid bits, not slab columns)
        outs = run_kernel(
            gid, sel, k_ops, k_vals, k_masks, nslots, k_kinds=kinds
        )
    except TypeError:
        outs = run_kernel(gid, sel, k_ops, k_vals, k_masks, nslots)
    if ieee_fix is None:
        gid_routed = jnp.where(sel, gid, jnp.asarray(nslots, jnp.int32))

        def ieee_fix(kernel_sum, data_, mask_, gidr=gid_routed):
            return ieee_sum_cond(kernel_sum, data_, mask_, gidr)
    else:
        _gid_routed = jnp.where(sel, gid, jnp.asarray(nslots, jnp.int32))
        _user_fix = ieee_fix

        def ieee_fix(kernel_sum, data_, mask_, gidr=None):
            return _user_fix(kernel_sum, data_, mask_, _gid_routed)

    results: dict = {}
    counts: dict = {}
    exists_cnt = None
    for (kind, ident), o in zip(k_slots, outs):
        if kind == "exists":
            exists_cnt = o.astype(jnp.int32)
        elif kind == "agg":
            if ident in nansafe_sums:
                sdata, svalid = specs[ident].arg
                sdata = (
                    jnp.broadcast_to(sdata, sel.shape)
                    if jnp.ndim(sdata) == 0
                    else sdata
                )
                o = ieee_fix(o, sdata, _mask_for(svalid))
            results[ident] = o
        else:
            counts[ident] = o.astype(jnp.int32)

    if slot_gid is None:
        slot_gid = lax.broadcasted_iota(jnp.int32, (int(exists_cnt.shape[0]),), 0)
    out_sel = jnp.logical_and(exists_cnt > 0, slot_gid < nslots)
    # decode each key from the slot id; per-key code d is its NULL slot
    out_keys = []
    for (kd_i, kv_i), d, off, r, stride in zip(
        key_cols, doms, offs, radices, strides
    ):
        code_i = (slot_gid // stride) % r
        okd = (jnp.clip(code_i, 0, d - 1) + off).astype(kd_i.dtype)
        out_keys.append((okd, None if kv_i is None else code_i < d))

    out_aggs = []
    for si, spec in enumerate(specs):
        data, valid = spec.arg
        data = jnp.broadcast_to(data, sel.shape) if jnp.ndim(data) == 0 else data
        # _mask_for returns the SAME object registered above, so the
        # per-mask count lookup actually hits (a fresh logical_and here
        # would silently fall back to the group-existence count)
        mask = _mask_for(valid)
        cnt = counts.get(id(mask), exists_cnt)
        if spec.func == "count":
            out_aggs.append((cnt.astype(physical_np(spec.out_dtype)), None))
            continue
        r = results[si]
        if spec.func == "avg":
            r = r / jnp.maximum(cnt, 1).astype(r.dtype)
        validity = None if valid is None and spec.func != "avg" else cnt > 0
        out_aggs.append((r.astype(physical_np(spec.out_dtype)), validity))

    n_out = out_slots if out_slots is not None else nslots + 1
    return out_keys, out_aggs, out_sel, jnp.asarray(n_out, jnp.int32)


def grouped_aggregate_dense(
    key_cols: Sequence[ColVal],
    specs: Sequence[AggSpec],
    sel: jax.Array,
    domain_size,
    key_offset=0,
):
    """Sort-free GROUP BY for dense int key domains of statically known
    size: the (mixed-radix packed) key IS the group id — one pallas pass
    over the unsorted rows, no lax.sort at all (dense_window_aggregate
    over the segreduce dense kernel). Returns the grouped_aggregate
    contract: (out_keys, out_aggs, out_sel, n_groups)."""
    segred = segmented_reduce_sorted_import()

    def run_kernel(gid, sel_, k_ops, k_vals, k_masks, nslots):
        # slot layout: [0, nslots) = packed key codes (incl. per-key
        # NULL slots); slot nslots = unselected rows
        gcap = nslots + 1
        gid_routed = jnp.where(sel_, gid, gcap)
        interp = jax.devices()[0].platform not in ("tpu", "axon")
        # f32 min/max reduce on the order-preserving int image (NaN
        # ordering consistent with the value-sort path: NaNs past +inf);
        # counts ship NO value stream
        vals = []
        img = []
        for op, v in zip(k_ops, k_vals):
            if op == "count":
                vals.append(None)
                img.append(False)
            elif op in ("min", "max") and v.dtype == jnp.float32:
                vals.append(to_sortable_int(v))
                img.append(True)
            else:
                vals.append(v)
                img.append(False)
        outs = segred(
            gid_routed,
            tuple(vals),
            tuple(k_masks),
            ops=tuple(k_ops),
            num_groups=gcap,
            interpret=interp,
            dense=True,
            block=1024,  # dense contract: num_groups <= 1024 + block
        )
        return tuple(
            from_sortable_int(o, jnp.float32) if im else o
            for o, im in zip(outs, img)
        )

    # n_groups reported as the domain size — always <= the compiled
    # capacity, so the overflow-retry loop never fires on this path
    return dense_window_aggregate(
        key_cols, specs, sel, domain_size, key_offset, run_kernel
    )


# packed-gid sort path cap. The packed SORT pays at any domain size
# (the packed id is one i32 operand regardless); the only size-bound
# resource is the reduce kernel's VMEM accumulator tables, and those
# self-gate per query (segreduce.accum_fits_vmem — the XLA segment
# ops take over past the budget while the sort keeps its packed head).
# Raised 2^19 -> 2^22 (r3) -> 2^26 (r4): sparse SCANNED-RANGE domains
# like TPC-H orderkey at SF1 span [1, 6M] with only 1.5M live keys —
# the packed head must accept the RANGE, not the live count, for join
# outputs carrying propagated key bounds to stay packed. Hard limit is
# int32 packing (< 2^31); 2^26 leaves 5 bits of mixed-radix headroom.
PACKED_MAX_GROUPS = 1 << 26

# bigdense (slab-partition) path: domains past the dense window, up to
# the largest bucket count the remote Mosaic compiler accepts for the
# slab kernel — probed on chip (PERFLOG r3): n_buckets <= 8 compiles,
# >= 16 crashes the remote tpu_compile_helper (opaque HTTP 500; the
# placement sub-kernel alone compiles at every size, so the trigger is
# the combined kernel — unresolvable through this toolchain's opaque
# remote compile). 8 windows = 16384 slots, an 8x extension of the
# dense cap; the windowed reduce itself compiles to 64k+.
BIGDENSE_MAX_GROUPS = 8 * 2048 - 1


def grouped_aggregate_bigdense(
    key_cols: Sequence[ColVal],
    specs: Sequence[AggSpec],
    sel: jax.Array,
    domain_size,
    key_offset=0,
):
    """Sort-free GROUP BY for probed int/dict key domains PAST the dense
    window (2047 < nslots <= BIGDENSE_MAX_GROUPS): rows are compacted
    bucket-major into per-block slabs by an MXU one-hot permutation
    (ops/pallas/partition.py slab_partition — no lax.sort, no data-
    dependent DMA), then reduced by the windowed kernel with full-table
    VMEM accumulators (every 256-row slab chunk touches one 2048-slot
    window). VERDICT r2 next #3.

    Payload encoding: validity masks pack into the gid's high bits (one
    bit per distinct mask — including the special-count masks
    dense_window_aggregate adds for NaN-exact float sums, whose values
    arrive pre-sanitized). f32 MIN/MAX columns ride SANITIZED (a non-
    finite operand in the one-hot placement product would poison its
    whole 128-destination block) with a 2-bit special-class code; the
    exact value (specials restored) is rebuilt post-slab and feeds the
    order-preserving int image, so MIN/MAX keep the packed path's exact
    NaN/inf ordering. i32 args ride as two exact-f32 16-bit halves.

    Caller contract (checked by the compiler gate): specs limited to
    SUM/AVG (f32), MIN/MAX (f32/i32), COUNT; capacity % 1024 == 0; id
    bits + mask bits + special bits stay below 2^23; accumulators fit
    VMEM (segreduce.accum_fits_vmem)."""
    from datafusion_tpu.ops.pallas.partition import (
        SENTINEL,
        WINDOW,
        pick_pblock,
        slab_partition,
        windowed_reduce,
    )

    interp = jax.devices()[0].platform not in ("tpu", "axon")

    def run_kernel(gid, sel_, k_ops, k_vals, k_masks, nslots, k_kinds=None):
        n = int(sel_.shape[0])
        kinds = k_kinds or ("",) * len(k_ops)
        pblock = pick_pblock(n)
        gcap = nslots + 1  # slot nslots holds unselected rows
        id_mod = 1 << (gcap - 1).bit_length()
        nbits = id_mod.bit_length() - 1
        gid_routed = jnp.where(sel_, gid, jnp.asarray(nslots, jnp.int32))
        packed = gid_routed

        def take_bit():
            nonlocal nbits
            b = nbits
            nbits += 1
            return b

        # mask bits: ops whose mask IS the base selection need no bit
        mask_bit: dict[int, int] = {}
        for m in k_masks:
            if m is sel_ or id(m) in mask_bit:
                continue
            mask_bit[id(m)] = take_bit()
            packed = packed + (m.astype(jnp.int32) << mask_bit[id(m)])

        # payload columns: dedupe by array identity; COUNT slots ship no
        # value; min/max f32 ships sanitized + a 2-bit special code
        # (bit0: NaN or -inf; bit1: any inf); other f32 ships as-is
        # (sum values arrive pre-sanitized); i32 ships split in halves
        col_plan: list = []  # ("none",)|("bit", b)|("f32", i)|("mmx", i, bit)|("i32", hi, lo)
        cols: list = []
        seen: dict[tuple, tuple] = {}
        for op, v, kind in zip(k_ops, k_vals, kinds):
            if op == "count":
                col_plan.append(("none",))
                continue
            if kind == "spcnt":
                # 0/1 non-finite indicator: one gid bit, not a column
                b = take_bit()
                packed = packed + (v.astype(jnp.int32) << b)
                col_plan.append(("bit", b))
                continue
            minmax = op in ("min", "max") and v.dtype == jnp.float32
            key = (id(v), minmax)
            if key in seen:
                col_plan.append(seen[key])
                continue
            if minmax:
                b0 = take_bit()
                b1 = take_bit()
                isnan = jnp.isnan(v)
                isinf = jnp.isinf(v)
                code0 = jnp.logical_or(isnan, jnp.logical_and(isinf, v < 0))
                packed = packed + (code0.astype(jnp.int32) << b0)
                packed = packed + (isinf.astype(jnp.int32) << b1)
                plan = ("mmx", len(cols), b0)
                cols.append(
                    jnp.where(jnp.isfinite(v), v, jnp.zeros((), v.dtype))
                )
            elif v.dtype == jnp.float32:
                plan = ("f32", len(cols))
                cols.append(v)
            else:
                vi = v.astype(jnp.int32)
                plan = ("i32", len(cols), len(cols) + 1)
                cols.append((vi >> 16).astype(jnp.float32))
                cols.append((vi & 0xFFFF).astype(jnp.float32))
            seen[key] = plan
            col_plan.append(plan)
        assert 1 << nbits <= SENTINEL, "gid+mask+special bits exceed 2^23"

        n_buckets = -(-gcap // WINDOW)
        parts = slab_partition(
            packed.astype(jnp.float32),
            tuple(cols),
            n_buckets=n_buckets,
            id_mod=id_mod,
            pblock=pblock,
            interpret=interp,
        )
        pg = parts[0].astype(jnp.int32)
        is_sent = pg >= jnp.int32(SENTINEL)
        gid_k = jnp.where(is_sent, jnp.int32(SENTINEL), pg & (id_mod - 1))
        base_mask = jnp.logical_not(is_sent)

        def bit_of(b):
            return ((pg >> b) & 1).astype(jnp.bool_)

        pm = {
            mid: jnp.logical_and(base_mask, bit_of(b))
            for mid, b in mask_bit.items()
        }

        # post-slab value prep (XLA fuses into one pass over the slab)
        vals_k: list = []
        masks_k: list = []
        img_ops: list[bool] = []
        prepared: dict[tuple, jax.Array] = {}
        ninf = jnp.float32(jnp.inf)
        for (op, m), plan in zip(zip(k_ops, k_masks), col_plan):
            if plan[0] == "none":
                vals_k.append(pg)  # count reads only its mask
                img_ops.append(False)
            elif plan[0] == "bit":
                vals_k.append(bit_of(plan[1]).astype(jnp.float32))
                img_ops.append(False)
            else:
                if plan not in prepared:
                    if plan[0] == "f32":
                        prepared[plan] = parts[1 + plan[1]]
                    elif plan[0] == "mmx":
                        clean = parts[1 + plan[1]]
                        b0 = bit_of(plan[2])
                        b1 = bit_of(plan[2] + 1)
                        exact = jnp.where(
                            b1, jnp.where(b0, -ninf, ninf), clean
                        )
                        exact = jnp.where(
                            jnp.logical_and(b0, jnp.logical_not(b1)),
                            jnp.float32(jnp.nan),
                            exact,
                        )
                        prepared[plan] = to_sortable_int(exact)
                    else:
                        hi = parts[1 + plan[1]].astype(jnp.int32)
                        lo = parts[1 + plan[2]].astype(jnp.int32)
                        prepared[plan] = hi * 65536 + lo
                vals_k.append(prepared[plan])
                img_ops.append(plan[0] == "mmx")
            if m is sel_:
                masks_k.append(base_mask)
            else:
                masks_k.append(pm[id(m)])

        outs = windowed_reduce(
            gid_k,
            tuple(vals_k),
            tuple(masks_k),
            ops=tuple(k_ops),
            num_groups=gcap,
            interpret=interp,
        )
        return tuple(
            from_sortable_int(o, jnp.float32) if im else o
            for o, im in zip(outs, img_ops)
        )

    return dense_window_aggregate(
        key_cols, specs, sel, domain_size, key_offset, run_kernel
    )


def grouped_aggregate(
    key_cols: Sequence[ColVal],
    specs: Sequence[AggSpec],
    sel: jax.Array,
    group_capacity: int | None = None,
    dense_domain=None,
    dense_offset=None,
):
    """GROUP BY aggregation. Returns (out_keys, out_aggs, out_sel,
    n_groups); output arrays have length group_capacity. If the true
    group count exceeds group_capacity the surplus groups are dropped and
    the returned n_groups (> group_capacity) lets the caller recompile
    bigger (the fixed-capacity + valid-count idiom, SURVEY.md §7).

    dense_domain/dense_offset (compiler-probed per-key int domains, same
    contract as grouped_aggregate_dense) enable the PACKED sort path:
    (sel, all group keys) mixed-radix-pack into ONE dense i32 that is the
    single sort key — the notsel/per-key operands and the iota tie-break
    all drop out of the main co-sort, which is the aggregate's dominant
    cost at scale. Group keys decode arithmetically from the packed id,
    so they never ride the sort as payloads either.
    """
    capacity = int(sel.shape[0])
    gcap = capacity if group_capacity is None else min(int(group_capacity), capacity)
    iota = lax.broadcasted_iota(jnp.int32, (capacity,), 0)
    giota = lax.broadcasted_iota(jnp.int32, (gcap,), 0)

    use_packed = dense_domain is not None
    if use_packed:
        gid_raw, p_doms, p_offs, p_radices, p_strides, p_nslots = dense_pack_gid(
            key_cols, dense_domain, dense_offset
        )
        assert p_nslots <= PACKED_MAX_GROUPS
        packed0 = jnp.where(sel, gid_raw, jnp.asarray(p_nslots, jnp.int32))
        sort_head: list = [packed0]
    else:
        notsel, skeys = _key_sort_operands(key_cols, sel)
        sort_head = [notsel, *skeys]

    # ---- choose a value-ordered sort arg for MIN/MAX --------------------
    # The arg referenced by the most MIN/MAX specs rides the main sort as
    # extra sort keys (after the group keys, before the iota tie-break):
    # rows within each group become value-ordered, so the group MIN is the
    # value at the group's first row and the MAX at row start+count-1 —
    # two tiny gathers instead of per-row reduce work. A nullable arg gets
    # a not-valid flag key first so NULLs sink to the group's tail.
    mm_votes: dict[int, int] = {}
    mm_args: dict[int, ColVal] = {}
    for spec in specs:
        data, valid = spec.arg
        if spec.func in ("min", "max") and jnp.ndim(data) != 0:
            mm_votes[id(data)] = mm_votes.get(id(data), 0) + 1
            mm_args[id(data)] = (data, valid)
        elif spec.func in (
            "median", "percentile", "percentile_disc", "percentile_disc_desc"
        ):
            if jnp.ndim(data) == 0:
                raise NotImplementedError_(
                    f"{spec.func} of a literal is not supported"
                )
            # medians REQUIRE the value-ordered ride (min/max have kernel
            # fallbacks) — give them a dominating vote
            mm_votes[id(data)] = mm_votes.get(id(data), 0) + 1000
            mm_args[id(data)] = (data, valid)
    chosen_vid: Optional[int] = (
        max(mm_votes, key=lambda i: mm_votes[i]) if mm_votes else None
    )

    # ---- main co-sort: keys + iota + every distinct payload ------------
    payload_plan: list[int] = []  # operand index per spec (data)
    vpayload_plan: list[Optional[int]] = []  # operand index per spec (validity)
    operands = list(sort_head)
    vsort_idx: Optional[int] = None
    seen: dict[int, int] = {}
    if chosen_vid is not None:
        vdata, vvalid = mm_args[chosen_vid]
        if vvalid is not None:
            operands.append(jnp.logical_not(vvalid).astype(jnp.int8))
        vimage = to_sortable_int(vdata)
        vsort_idx = len(operands)
        operands.append(vimage)
        if vimage is vdata:  # ints pass through — payloads can reuse it
            seen[id(vdata)] = vsort_idx
    # NO iota tie-break operand on either path: lax.sort is STABLE by
    # default (is_stable=True), so within-group row order is preserved
    # without paying an i32 operand through every sort pass — stability
    # is load-bearing for the CPU bit-exact row-order float sums; do not
    # pass is_stable=False here.
    num_keys = len(operands)
    raw_payload: dict[int, jax.Array] = {}  # spec idx -> unsorted arg
    for si_, spec in enumerate(specs):
        data, valid = spec.arg
        data = jnp.broadcast_to(data, sel.shape) if jnp.ndim(data) == 0 else data
        key_id = id(data)
        if spec.func in (
            "count", "count_distinct", "sum_distinct", "avg_distinct"
        ):
            # plain COUNT never reads its argument's values (only the
            # validity mask); the *_distinct family re-sorts the RAW
            # argument in its own secondary sort. Neither needs the
            # argument riding the dominant main co-sort as a payload —
            # dropping it saves a full f32 operand (measured ~25-30 ms
            # at 33.5M rows on v5e).
            raw_payload[si_] = data
            payload_plan.append(None)
            if valid is not None:
                vid = id(valid)
                if vid not in seen:
                    seen[vid] = len(operands)
                    operands.append(valid.astype(jnp.int8))
                vpayload_plan.append(seen[vid])
            else:
                vpayload_plan.append(None)
            continue
        handled_by_vsort = (
            key_id == chosen_vid and spec.func in ("min", "max")
        )
        if key_id not in seen:
            if handled_by_vsort:
                # float chosen arg: its sortable image already rides as a
                # key; MIN/MAX recover through from_sortable_int, so the
                # raw column need not be moved again — unless another spec
                # references it, which registers it below on its own turn
                payload_plan.append(vsort_idx)
            else:
                seen[key_id] = len(operands)
                operands.append(data)
                payload_plan.append(seen[key_id])
        else:
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
    if use_packed:
        # the packed id encodes (sel, keys): unselected rows hold nslots
        # and sort after every valid group
        sel_sorted = sorted_ops[0] < p_nslots
        sorted_keys = [sorted_ops[0]]
    else:
        sel_sorted = jnp.logical_not(sorted_ops[0].astype(jnp.bool_))
        # group boundaries come from the GROUP-key operands only — the
        # value-order keys (and iota) must not split groups
        sorted_keys = sorted_ops[1 : 1 + len(skeys)]

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
    def gid_arr() -> jax.Array:
        """Compacted group ids — cumsum of boundaries, LAZY: the pallas
        path derives ids IN-KERNEL from the boundary flags (prefix
        mode), so the full-length cumsum only materializes for the XLA
        consumers (ieee exact branch, var/stddev, *_distinct, fallback
        segment ops) that actually reference it (~7 ms at 33.5M rows,
        PERFLOG r4.6). NOT memoized: callers sit in different trace
        scopes (the ieee cond branch vs the main pipeline) and a cached
        tracer would leak across them; XLA CSE dedups same-scope
        copies. Both branches clamp to gcap: unselected rows route to
        the drop slot, and selected rows past the compiled capacity
        collapse onto it too — the surplus groups drop either way (the
        overflow retry recompiles bigger), but an UNclamped id would
        push the pallas kernel's dynamic accumulator-window write past
        its padded table: a TPU worker crash, not a graceful overflow
        (PERFLOG r4.4)."""
        g = jnp.cumsum(boundary.astype(jnp.int32)) - 1
        return jnp.where(sel_sorted, jnp.minimum(g, gcap), gcap)

    # lazy: in packed mode with the kernel active, the distinct-group
    # count derives from the kernel's per-slot sizes (a gcap-scale
    # reduce) instead of this 33.5M boundary reduce; packed mode cannot
    # overflow (distinct ≤ nslots ≤ gcap), so the overflow-retry
    # contract is unaffected. Holder pattern: the kernel block installs
    # the cheap version after it runs.
    _ng_holder: dict = {}

    def n_groups_of() -> jax.Array:
        if "ng" not in _ng_holder:
            _ng_holder["ng"] = jnp.sum(boundary.astype(jnp.int32))
        return _ng_holder["ng"]

    n_sel = jnp.sum(sel_sorted.astype(jnp.int32))

    # compact boundary positions to the front: starts[g] = first row of
    # group g in the sorted order (tiny 2-operand sort, no scatter).
    # Computed lazily — the pallas path usually doesn't need extents.
    _extents: dict = {}

    def extents():
        if not _extents:
            comp = lax.sort(
                [jnp.logical_not(boundary).astype(jnp.int8), iota], num_keys=1
            )
            starts_full = jnp.concatenate(
                [comp[1], jnp.zeros((1,), jnp.int32)]  # pad for the +1 slice
            )
            starts = lax.slice(starts_full, (0,), (gcap,))
            ends = jnp.where(
                giota + 1 < n_groups_of(),
                lax.slice(starts_full, (1,), (gcap + 1,)),
                n_sel,
            )
            _extents["starts"] = starts
            _extents["ends"] = ends
            _extents["sizes"] = jnp.where(giota < n_groups_of(), ends - starts, 0)
        return _extents

    def at_starts(arr):
        return jnp.take(arr, jnp.clip(extents()["starts"], 0, capacity - 1))

    def at_ends(arr):
        return jnp.take(arr, jnp.clip(extents()["ends"] - 1, 0, capacity - 1))

    # ---- TPU fast path setup -------------------------------------------
    # one pallas pass over the sorted gids computes every eligible
    # reduction AND the representative group keys (ops/pallas/segreduce.py)
    # — no scatters, no secondary sorts, no extents. CPU/parity path keeps
    # XLA ops (bit-exact row-order float sums).
    from datafusion_tpu.ops.pallas.segreduce import pick_block

    _seg_block = pick_block(capacity)
    use_pallas = _pallas_enabled() and capacity % _seg_block == 0 and gcap >= 1

    # NOTE — slot-routed packed mode (kernel slots addressed by packed
    # id directly, skipping the gid cumsum) was built and REVERTED in
    # r5: the segreduce kernel's dynamic accumulator window advances at
    # most BLOCK slots per chunk, an invariant compact (cumsum) gids
    # guarantee and sparse packed ids violate — slot jumps past W inside
    # one chunk silently contaminate neighboring groups (caught by
    # test_bigdense_matches_packed on a filtered 5k-domain query).
    k_ops: list[str] = []
    k_vals: list[jax.Array] = []
    k_masks: list[jax.Array] = []
    k_finite: list[bool] = []  # per op: value stream probed all-finite
    k_slots: list[tuple] = []  # (kind, index) kind in {agg, cnt}
    pallas_results: dict[int, jax.Array] = {}
    pallas_counts: dict[int, jax.Array] = {}
    img_slots: set[int] = set()  # f32 min/max reduced on the int image

    _spec_mask_cache: dict = {}

    def _spec_mask(vpi):
        if vpi is None:
            return sel_sorted
        # memoized per validity operand: ops sharing a validity must get
        # the SAME array object so kernel mask slots / count lookups
        # dedupe on id() (a fresh logical_and per call silently missed)
        if vpi not in _spec_mask_cache:
            _spec_mask_cache[vpi] = jnp.logical_and(
                sel_sorted, sorted_ops[vpi].astype(jnp.bool_)
            )
        return _spec_mask_cache[vpi]

    def _kernel_mask(vpi):
        """Mask stream for the segreduce kernel: None when the mask is
        the base selection — that's already encoded in the id routing
        (unselected rows carry gid == gcap, a dropped slot), so no i8
        stream ships and the kernel skips its per-chunk mask ops."""
        return None if vpi is None else _spec_mask(vpi)

    def _handled(spec) -> bool:
        return (
            chosen_vid is not None
            and spec.func in ("min", "max")
            and id(spec.arg[0]) == chosen_vid
        )

    if use_pallas:
        counted: dict = {}  # mask key -> kernel slot (counts are
        # value-independent, so every op sharing a mask shares one slot;
        # key None = the base selection, which ships NO mask stream)
        sp_of: dict[int, bool] = {}  # spec idx -> sum rode zero-sanitized
        # spec idx -> (sorted values, validity operand idx, finite):
        # f32 sums computed by limb prefixes off the count cumsum
        prefix_sums: dict[int, tuple] = {}

        def _ensure_count(vpi) -> None:
            ck = vpi  # None = base selection
            if ck not in counted:
                counted[ck] = len(k_ops)
                k_ops.append("count")
                k_vals.append(None)  # count reads only its mask: no
                # value stream ships into the kernel (saves an [n] f32
                # HBM materialization + DMA per distinct count mask)
                k_masks.append(_kernel_mask(vpi))
                k_finite.append(True)  # counts read no value stream
                k_slots.append(("cnt", ck))

        # group sizes drive the extents (starts = exclusive cumsum), the
        # out_sel mask, and every non-null valid count — always computed
        _ensure_count(None)
        for si, (spec, pi, vpi) in enumerate(zip(specs, payload_plan, vpayload_plan)):
            d_sorted = sorted_ops[pi] if pi is not None else None
            if _handled(spec):
                if vpi is not None:
                    _ensure_count(vpi)  # max needs the valid count
                continue
            if d_sorted is None:  # COUNT / *_distinct: no sorted payload
                if spec.func == "count":
                    _ensure_count(vpi)
                continue
            eligible = d_sorted.dtype in (jnp.float32, jnp.int32)
            if spec.func in ("sum", "avg") and d_sorted.dtype == jnp.float32:
                if os.environ.get("DFTPU_SUM_PREFIX", "0") == "1":
                    # OPT-IN ablation (default OFF — measured on chip:
                    # c2 179.6 -> 211.8 ms; the kernel's sum dot
                    # overlaps the pipeline while these scans
                    # serialize): f32 sums skip the kernel and ride
                    # limb_prefix_group_sums off the count slot's
                    # cumulative sizes. The same machinery IS the
                    # default on the no-kernel fallback, where it beats
                    # segment_sum's scatter 293 -> ~40 ms.
                    prefix_sums[si] = (d_sorted, vpi, spec.finite_arg)
                    if spec.func == "avg" or vpi is not None:
                        _ensure_count(vpi)
                    continue
                # non-finite values POISON the kernel's one-hot sum dot
                # (0 * NaN = NaN spreads across the whole W-window,
                # contaminating NEIGHBORING groups). They ride zero-
                # sanitized; ieee_sum_cond restores the IEEE result for
                # special-containing columns at decode (lax.cond — the
                # exact scatter path only executes when the pre-scan
                # finds a NaN/±inf). Zero extra kernel work (the r2
                # special-count slot cost a full extra factored HIGHEST
                # dot, ~20 ms on c2 — PERFLOG r3.6).
                k_ops.append("sum")
                k_vals.append(d_sorted)  # RAW: the kernel zero-
                # sanitizes f32 sum rows internally (saves the XLA
                # sanitize pass's [n] materialization)
                k_masks.append(_kernel_mask(vpi))
                k_slots.append(("agg", si))
                k_finite.append(spec.finite_arg)
                if not spec.finite_arg:
                    sp_of[si] = True
            elif spec.func in ("min", "max") and eligible:
                k_ops.append(spec.func)
                if d_sorted.dtype == jnp.float32:
                    # reduce on the order-preserving int image: NaNs
                    # sort past +inf (MIN skips them, MAX surfaces
                    # them) — the same ordering the value-sort path
                    # uses, so MIN/MAX semantics no longer depend on
                    # which argument won the value-sort ride
                    k_vals.append(to_sortable_int(d_sorted))
                    img_slots.add(si)
                else:
                    k_vals.append(d_sorted)
                k_masks.append(_kernel_mask(vpi))
                k_finite.append(False)
                k_slots.append(("agg", si))
            # counts: explicit COUNT, AVG denominators, and validity for
            # NULLABLE args; non-null args are valid wherever the group
            # exists, so the group-sizes count covers them
            needs_cnt = spec.func == "count" or spec.func == "avg" or (
                vpi is not None and spec.func in ("min", "max", "sum")
            )
            if needs_cnt:
                _ensure_count(vpi)

        from datafusion_tpu.ops.pallas.segreduce import accum_fits_vmem

        # VMEM budget: the kernel keeps every accumulator table resident
        # (~4 B/slot/op). Wide packed domains × many ops would fail
        # Mosaic compile on chip — decline and fall back to XLA segment
        # ops below (ADVICE r2: invisible to interpret-mode CPU tests).
        if k_ops and accum_fits_vmem(gcap, len(k_ops)):
            interp = jax.devices()[0].platform not in ("tpu", "axon")
            # PREFIX mode (DFTPU_SEG_PREFIX=1, default OFF): ship the
            # boundary flags with each block's global base count encoded
            # into element 0; the kernel materializes group ids itself.
            # Measured NEGATIVE on v5e (c2 186.9 -> 198.7 ms: the
            # in-kernel [8,128] shift-prefix costs more per step than
            # the XLA cumsum it removes — PERFLOG r4.7), kept as a
            # validated ablation surface.
            if os.environ.get("DFTPU_SEG_PREFIX", "0") == "1":
                _BK = _seg_block
                nblocks = capacity // _BK
                b2 = boundary.astype(jnp.int32).reshape(nblocks, _BK)
                bsum = jnp.sum(b2, axis=1)
                block_base = jnp.cumsum(bsum) - bsum
                first_col = (block_base[:, None] << 1) | lax.slice(
                    b2, (0, 0), (nblocks, 1)
                )
                kernel_gid = jnp.concatenate(
                    [first_col, lax.slice(b2, (0, 1), (nblocks, _BK))], axis=1
                ).reshape(capacity)
                use_prefix = True
            else:
                kernel_gid = gid_arr()
                use_prefix = False
            outs = segmented_reduce_sorted_import()(
                kernel_gid,
                tuple(k_vals),
                tuple(k_masks),
                ops=tuple(k_ops),
                num_groups=gcap,
                interpret=interp,
                prefix=use_prefix,
                finite_ops=tuple(k_finite),
                block=_seg_block,
            )
            cnt_by_mask = {}
            for (kind, ident), o in zip(k_slots, outs):
                if kind == "agg":
                    if ident in img_slots:
                        o = from_sortable_int(o, jnp.float32)
                    elif ident in sp_of:
                        o = ieee_sum_cond(
                            o,
                            sorted_ops[payload_plan[ident]],
                            _spec_mask(vpayload_plan[ident]),
                            gid_arr,
                        )
                    pallas_results[ident] = o
                else:
                    cnt_by_mask[ident] = o.astype(jnp.int32)
            for si, (spec, pi, vpi) in enumerate(
                zip(specs, payload_plan, vpayload_plan)
            ):
                if vpi in cnt_by_mask:
                    pallas_counts[si] = cnt_by_mask[vpi]
            # group extents for free: sizes → exclusive-cumsum starts.
            # Replaces the boundary-compaction sort on this path.
            sizes_p = cnt_by_mask[None]
            if use_packed and "ng" not in _ng_holder:
                # packed-mode distinct count from the kernel's slot
                # sizes: a gcap-scale reduce replaces the 33.5M-row
                # boundary reduce (safe: packed mode cannot overflow)
                _ng_holder["ng"] = jnp.sum((sizes_p > 0).astype(jnp.int32))
            starts_p = jnp.cumsum(sizes_p) - sizes_p
            _extents["starts"] = starts_p
            _extents["ends"] = starts_p + sizes_p
            _extents["sizes"] = sizes_p
            max_size_p = jnp.max(sizes_p)
            for si_p, (vals_p, vpi_p, finite_p) in prefix_sums.items():
                msk_p = _spec_mask(vpi_p)
                contrib_p = jnp.where(
                    jnp.logical_and(msk_p, jnp.isfinite(vals_p)),
                    vals_p,
                    jnp.float32(0.0),
                )
                s_p = limb_prefix_group_sums(
                    contrib_p, _extents["ends"], capacity
                )

                def _exact_p(contrib_p=contrib_p):
                    return jax.ops.segment_sum(
                        contrib_p, gid_arr(), num_segments=gcap
                    )

                # limb wraparound is only exact while the largest group
                # has < 2^19 rows — oversized groups take the scatter
                s_p = lax.cond(
                    max_size_p >= (1 << 19), _exact_p, lambda s_p=s_p: s_p
                )
                if not finite_p:
                    s_p = ieee_sum_cond(s_p, vals_p, msk_p, gid_arr)
                pallas_results[si_p] = s_p

    # ---- group key outputs ---------------------------------------------
    # every operand sampled at the group STARTS rides ONE stacked
    # [n, C] row gather (each scalar 2M-from-33.5M take costs ~23 ms on
    # chip; C lanes ≈ one lane): the packed id (key decode) + the
    # value-sort image (handled MIN). Registered lazily; flushed on
    # first read.
    _starts_stack: dict = {"req": [], "out": None}

    def _at_starts_stacked(arr: jax.Array):
        for a, _ in _starts_stack["req"]:
            if a is arr:
                break
        else:
            _starts_stack["req"].append((arr, len(_starts_stack["req"])))

        def read(arr=arr):
            if _starts_stack["out"] is None:
                arrs = [a for a, _ in _starts_stack["req"]]
                if len(arrs) == 1:
                    _starts_stack["out"] = [at_starts(arrs[0])]
                else:
                    mat = jnp.stack(arrs, axis=1)
                    rows = jnp.take(
                        mat,
                        jnp.clip(extents()["starts"], 0, capacity - 1),
                        axis=0,
                    )
                    _starts_stack["out"] = [
                        rows[:, j] for j in range(len(arrs))
                    ]
            for i, (a, _) in enumerate(_starts_stack["req"]):
                if a is arr:
                    return _starts_stack["out"][i]
            raise AssertionError("unregistered starts sample")

        return read

    _read_packed = None
    _read_minvs = None
    if use_packed:
        _read_packed = _at_starts_stacked(sorted_ops[0])
    if chosen_vid is not None and any(
        _handled(spec) and spec.func == "min" for spec in specs
    ):
        _read_minvs = _at_starts_stacked(sorted_ops[vsort_idx])

    out_keys = []
    if use_packed:
        # decode each key arithmetically from the group's packed id (one
        # tiny gather total, vs one per key operand on the generic path)
        packed_at_start = _read_packed()
        for (kd, kv), d, off, r, stride in zip(
            key_cols, p_doms, p_offs, p_radices, p_strides
        ):
            code_i = (packed_at_start // stride) % r
            okd = (jnp.clip(code_i, 0, d - 1) + off).astype(kd.dtype)
            out_keys.append((okd, None if kv is None else code_i < d))
    else:
        ki = 1
        for kidx, (kd, kv) in enumerate(key_cols):
            if kv is not None:
                knull = at_starts(sorted_ops[ki]).astype(jnp.bool_)
                kvalid = jnp.logical_not(knull)
                ki += 1
            else:
                kvalid = None
            raw = at_starts(sorted_ops[ki])
            # float keys were grouped via their order-preserving int image
            out_keys.append((from_sortable_int(raw, kd.dtype), kvalid))
            ki += 1

    # cache secondary value-sorts per (arg operand index) so MIN and MAX
    # of the same argument share one sort
    minmax_cache: dict[int, jax.Array] = {}

    def minmax_sorted(pi: int) -> jax.Array:
        if pi not in minmax_cache:
            vops = lax.sort(
                [*sort_head, operands[pi]], num_keys=len(sort_head) + 1
            )
            minmax_cache[pi] = vops[-1]
        return minmax_cache[pi]

    out_aggs = []
    for si, (spec, pi, vpi) in enumerate(zip(specs, payload_plan, vpayload_plan)):
        d_sorted = sorted_ops[pi] if pi is not None else None
        if spec.func in (
            "median", "percentile", "percentile_disc", "percentile_disc_desc"
        ):
            if id(spec.arg[0]) != chosen_vid:
                raise NotImplementedError_(
                    "only one distinct MEDIAN/PERCENTILE argument per "
                    "aggregate is supported (it must ride the value sort)"
                )
            vs = sorted_ops[vsort_idx]
            if vpi is None:
                cnt = extents()["sizes"]
            elif si in pallas_counts:
                cnt = pallas_counts[si]
            else:
                cnt = jax.ops.segment_sum(
                    _spec_mask(vpi).astype(jnp.int32), gid_arr(),
                    num_segments=gcap,
                )
            f64 = physical_np(DataType.Float64)
            starts = extents()["starts"]
            src_dt = mm_args[chosen_vid][0].dtype
            if spec.func in ("percentile_disc", "percentile_disc_desc"):
                pos = jnp.ceil(cnt.astype(f64) * spec.q).astype(jnp.int32)
                pos = jnp.clip(pos, 1, jnp.maximum(cnt, 1))
                if spec.func == "percentile_disc_desc":
                    pos = cnt - pos
                else:
                    pos = pos - 1
                pos = jnp.clip(pos, 0, jnp.maximum(cnt - 1, 0))
                r = from_sortable_int(
                    jnp.take(vs, jnp.clip(starts + pos, 0, capacity - 1)),
                    src_dt,
                ).astype(f64)
            else:
                rank = jnp.maximum(cnt - 1, 0).astype(f64) * spec.q
                lo = jnp.floor(rank).astype(jnp.int32)
                hi = jnp.ceil(rank).astype(jnp.int32)
                v_lo = from_sortable_int(
                    jnp.take(vs, jnp.clip(starts + lo, 0, capacity - 1)), src_dt
                ).astype(f64)
                v_hi = from_sortable_int(
                    jnp.take(vs, jnp.clip(starts + hi, 0, capacity - 1)), src_dt
                ).astype(f64)
                r = v_lo + (v_hi - v_lo) * (rank - lo.astype(f64))
            out_aggs.append((r.astype(physical_np(spec.out_dtype)), cnt > 0))
            continue
        if _handled(spec):
            # value-ordered main sort: the group MIN is the value at the
            # group's first row, the MAX at start + valid_count - 1
            # (NULLs sink to each group's tail via the not-valid key)
            vs = sorted_ops[vsort_idx]
            if vpi is None:
                cnt = extents()["sizes"]
            elif si in pallas_counts:
                cnt = pallas_counts[si]
            else:
                cnt = jax.ops.segment_sum(
                    _spec_mask(vpi).astype(jnp.int32), gid_arr(),
                    num_segments=gcap,
                )
            if spec.func == "min" and _read_minvs is not None:
                raw = _read_minvs()  # shares the stacked starts gather
            else:
                pos = extents()["starts"] if spec.func == "min" else (
                    extents()["starts"] + cnt - 1
                )
                raw = jnp.take(vs, jnp.clip(pos, 0, capacity - 1))
            r = from_sortable_int(raw, mm_args[chosen_vid][0].dtype)
            out_aggs.append((r.astype(physical_np(spec.out_dtype)), cnt > 0))
            continue
        if si in pallas_results and spec.func != "avg" and vpi is None:
            # non-null args: valid wherever the group exists (out_sel
            # masks nonexistent groups) — no count needed
            out_aggs.append(
                (pallas_results[si].astype(physical_np(spec.out_dtype)), None)
            )
            continue
        if si in pallas_counts:
            mask = None
            valid_cnt = pallas_counts[si]
        elif vpi is None:
            mask = sel_sorted
            valid_cnt = extents()["sizes"]
        else:
            mask = jnp.logical_and(sel_sorted, sorted_ops[vpi].astype(jnp.bool_))
            # exact scatter-free count: i32 cumsum differences at the
            # group extents (wraparound-safe — counts < 2^31)
            mi = mask.astype(jnp.int32)
            mpref = jnp.cumsum(mi)
            vc_end = at_ends(mpref)  # contiguous groups: prev end = excl start
            vc_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), vc_end[:-1]])
            valid_cnt = jnp.where(giota < n_groups_of(), vc_end - vc_prev, 0)
        if spec.func == "count":
            out_aggs.append((valid_cnt.astype(physical_np(spec.out_dtype)), None))
            continue
        if spec.func in ("var_pop", "var_samp", "stddev_pop", "stddev_samp"):
            # two-pass per group: segment mean, gather it back per row,
            # then segment-sum the squared deviations — stable where the
            # single-pass E[x²]−E[x]² form cancels (stddev ≪ mean)
            if mask is None:
                mask = sel_sorted if vpi is None else jnp.logical_and(
                    sel_sorted, sorted_ops[vpi].astype(jnp.bool_)
                )
            xm = jnp.where(mask, d_sorted, jnp.zeros((), d_sorted.dtype))
            gsum = jax.ops.segment_sum(xm, gid_arr(), num_segments=gcap)
            nn = jnp.maximum(valid_cnt, 1).astype(d_sorted.dtype)
            gmean = gsum / nn
            mean_row = jnp.take(gmean, jnp.clip(gid_arr(), 0, gcap - 1))
            dev = jnp.where(
                mask, d_sorted - mean_row, jnp.zeros((), d_sorted.dtype)
            )
            ss = jax.ops.segment_sum(dev * dev, gid_arr(), num_segments=gcap)
            if spec.func.endswith("_pop"):
                r = ss / nn
                ok = valid_cnt > 0
            else:
                r = ss / jnp.maximum(valid_cnt - 1, 1).astype(d_sorted.dtype)
                ok = valid_cnt > 1
            if spec.func.startswith("stddev"):
                r = jnp.sqrt(r)
            out_aggs.append((r.astype(physical_np(spec.out_dtype)), ok))
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
        if spec.func in ("count_distinct", "sum_distinct", "avg_distinct"):
            # value-co-sort per group (valid rows first within the group);
            # distinct values are runs — count/sum the run-START rows via
            # exact prefix differences over the group extents
            operands_cd = list(sort_head)
            if vpi is not None:
                operands_cd.append(
                    (1 - operands[vpi].astype(jnp.int8))
                )
            operands_cd.append(raw_payload[si])
            vres = lax.sort(operands_cd, num_keys=len(operands_cd))
            vs = vres[-1]
            flag = jnp.logical_and(
                sel_sorted, jnp.logical_or(boundary, vs != jnp.roll(vs, 1))
            )
            if vpi is not None:
                flag = jnp.logical_and(flag, vres[-2] == 0)  # valid rows only
            ex = extents()
            starts, ends = ex["starts"], ex["ends"]

            def seg_diff(pref, zero):
                p_end = jnp.take(pref, jnp.clip(ends - 1, 0, capacity - 1))
                p_before = jnp.where(
                    starts > 0,
                    jnp.take(pref, jnp.clip(starts - 1, 0, capacity - 1)),
                    zero,
                )
                return jnp.where(giota < n_groups_of(), p_end - p_before, zero)

            cntd = seg_diff(jnp.cumsum(flag.astype(jnp.int32)), 0)
            if spec.func == "count_distinct":
                out_aggs.append((cntd.astype(physical_np(spec.out_dtype)), None))
                continue
            f64 = physical_np(DataType.Float64)
            contrib = jnp.where(flag, vs, jnp.zeros((), vs.dtype)).astype(f64)
            if contrib.dtype == jnp.float32:
                # physical f64 IS f32 on TPU: a global f32 prefix
                # difference loses catastrophically at scale (the
                # window-sum bug class, PERFLOG r5.8) — route through
                # the exact fixed-point limb prefixes. Non-finite
                # distinct values restore via the ieee cond scatter
                # over the run-start rows.
                fin = jnp.where(
                    jnp.isfinite(contrib), contrib, jnp.zeros((), jnp.float32)
                )
                sumd = limb_prefix_group_sums(fin, ex["ends"], capacity)
                sumd = jnp.where(
                    giota < n_groups_of(), sumd, jnp.zeros((), jnp.float32)
                )

                def _exact_d(fin=fin):
                    return jax.ops.segment_sum(
                        fin, gid_arr(), num_segments=gcap
                    )

                # limb wraparound bound: largest group < 2^19 rows
                sumd = lax.cond(
                    jnp.max(ex["sizes"]) >= (1 << 19),
                    _exact_d,
                    lambda sumd=sumd: sumd,
                )
                sumd = ieee_sum_cond(sumd, vs, flag, gid_arr)
            else:
                sumd = seg_diff(jnp.cumsum(contrib), jnp.zeros((), f64))
            if spec.func == "avg_distinct":
                sumd = sumd / jnp.maximum(cntd, 1).astype(f64)
            out_aggs.append(
                (sumd.astype(physical_np(spec.out_dtype)), cntd > 0)
            )
            continue
        if spec.func in ("min", "max") and vpi is None:
            # value-co-sorted path: min at group start, max at group end
            vs = minmax_sorted(pi)
            r = at_starts(vs) if spec.func == "min" else at_ends(vs)
        elif spec.func == "min":
            r = jax.ops.segment_min(
                jnp.where(mask, d_sorted, _sentinel(d_sorted.dtype, False)),
                gid_arr(),
                num_segments=gcap,
            )
        elif spec.func == "max":
            r = jax.ops.segment_max(
                jnp.where(mask, d_sorted, _sentinel(d_sorted.dtype, True)),
                gid_arr(),
                num_segments=gcap,
            )
        elif spec.func in ("sum", "avg"):
            contrib = jnp.where(mask, d_sorted, jnp.zeros((), d_sorted.dtype))
            if (
                jax.devices()[0].platform in ("tpu", "axon")
                and d_sorted.dtype == jnp.float32
            ):
                # Scatter-free f32 sum for the wide-domain fallback
                # (TPU: segment_sum's 33.5M-row scatter costs 293 ms on
                # chip; an i32 cumsum costs 7.7 — PERFLOG r5). A raw
                # f32 cumsum-difference is NOT usable: global-prefix
                # cancellation was measured at up to 9% relative error;
                # see limb_prefix_group_sums for the fixed-point limb
                # scheme (exact integer prefixes, per-element-relative
                # f32 precision). Oversized groups (≥ 2^19 rows — limb
                # wraparound bound) and non-finite values restore via
                # lax.cond exact-scatter branches (devices agree: both
                # are data-broadcast scalars; collectives stay outside,
                # mirroring ieee_sum_cond).
                fin = jnp.where(
                    jnp.isfinite(contrib), contrib, jnp.zeros((), jnp.float32)
                )
                s = limb_prefix_group_sums(fin, extents()["ends"], capacity)
                s = jnp.where(giota < n_groups_of(), s, jnp.float32(0.0))
                max_size = jnp.max(extents()["sizes"])

                def exact_scatter():
                    return jax.ops.segment_sum(
                        contrib, gid_arr(), num_segments=gcap
                    ).astype(s.dtype)

                s = lax.cond(
                    max_size >= (1 << 19), exact_scatter, lambda: s
                )
                s = ieee_sum_cond(s, d_sorted, mask, gid_arr)
            else:
                # exact row-order accumulation (parity: aggregate.rs:1126)
                s = jax.ops.segment_sum(contrib, gid_arr(), num_segments=gcap)
            if spec.func == "avg":
                r = s / jnp.maximum(valid_cnt, 1).astype(s.dtype)
            else:
                r = s
        else:
            raise NotImplementedError_(f"aggregate function {spec.func}")
        out_aggs.append((r.astype(physical_np(spec.out_dtype)), valid_cnt > 0))

    out_sel = giota < n_groups_of()
    return out_keys, out_aggs, out_sel, n_groups_of()
