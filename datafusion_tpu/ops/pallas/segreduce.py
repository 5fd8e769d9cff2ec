"""Pallas TPU kernel: segmented reductions over SORTED group ids.

After the grouped-aggregate main sort (ops/aggregate.py), group ids are
ascending. That makes every reduction windowed: a block of B rows can
only touch group slots [gid[first], gid[first] + B] — each row advances
the group id by at most one. A sequential grid walks the blocks with the
full accumulator table in VMEM and combines each block's contribution
into a tile-aligned window:

  * sum/count: one-hot [SUB, W] matmuls on the MXU
  * min/max:   masked [SUB, W] reduces on the VPU

vs ~7 ns/row for XLA's scatter-based segment ops — and it replaces the
secondary value-sorts for MIN/MAX too.

TPU alignment: dynamic VMEM offsets must be multiples of the (8,128)
tile = 1024 f32 elements, so the update window starts at
align_down(gid[first], 1024) and spans W = 2048 ≥ 1024 + BLOCK slots.
Row blocks are processed in SUB-row chunks to bound the [SUB, W]
intermediates (~2 MB each).

Accumulator identities make cross-block combining exact for count/min/
max; float sums combine partials in block order (deterministic, fixed
shape) — the engine keeps XLA segment_sum where bit-exact row-order sums
are required (CPU parity path) and uses this kernel on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# rows per grid step. The grid is SEQUENTIAL (accumulator carry), so
# per-step latency multiplies by n/BLOCK. Larger blocks amortize the
# per-step window read-modify-write: c2 query on v5e measured 186.1 ms
# at 1024 -> 182.4 @2048 -> 180.3 @4096 -> 179.7 @8192 (r4 sweep), so
# callers pass the LARGEST power-of-two divisor of their capacity up to
# BLOCK_MAX (tables pad to 1024-row units, so 1024 always divides).
# DFTPU_SEG_BLOCK overrides the default for experiments.
BLOCK = int(_os.environ.get("DFTPU_SEG_BLOCK", "1024"))
BLOCK_MAX = int(_os.environ.get("DFTPU_SEG_BLOCK_MAX", "8192"))


def pick_block(capacity: int) -> int:
    """Largest power-of-two block <= BLOCK_MAX dividing `capacity`
    (>= the 1024-row table padding unit when capacity allows)."""
    b = BLOCK
    while b * 2 <= BLOCK_MAX and capacity % (b * 2) == 0:
        b *= 2
    return b
# rows per in-kernel chunk: bounds the [SUB, W]-scale intermediates and
# the per-chunk VREG working set (DFTPU_SEG_SUB for on-chip experiments)
SUB = int(_os.environ.get("DFTPU_SEG_SUB", "256"))
ALIGN = 1024  # f32 VMEM tile alignment, elements
W = ALIGN + BLOCK  # update-window width (multiple of ALIGN)


# The whole accumulator table is VMEM-resident (out BlockSpec maps every
# grid step to block 0): ~4 B per slot per op. Past the budget the
# Mosaic compile fails on real chips (opaque remote-compile HTTP 500,
# invisible to CPU interpret-mode tests), so callers must check this
# before invoking the kernel and fall back to the XLA segment ops.
# Budget calibration (v5e, r4 probes — do NOT trust standalone kernel
# probes here):
#   * Hard compile wall IN-PIPELINE: XLA's 16 MiB scoped-vmem stack —
#     a single 16.01 MiB table fails by 20 KiB ("Ran out of memory in
#     memory space vmem ... scoped").
#   * Soft perf wall BELOW that: at ~12 MB of tables (1.5M-group 2-op,
#     the TPC-H Q18 shape) the pipeline compiles but the scheduler
#     HBM-backs the block-0-mapped outputs and Mosaic streams the FULL
#     table every grid step — measured 1.46 s vs 0.81 s for the XLA
#     segment-op fallback on the same query. Standalone probes of the
#     bare kernel compiled and ran 67 MB tables at full speed, which
#     is exactly why they mislead.
# 8 MiB keeps every admitted shape in true VMEM residency with margin
# for the [SUB, W]-scale intermediates; wider GROUP BYs take the XLA
# segment ops (~7 ns/row) behind the same gate.
ACCUM_VMEM_BUDGET = 8 * 1024 * 1024


def accum_fits_vmem(num_groups: int, n_ops: int) -> bool:
    """Would the kernel's VMEM-resident accumulator tables fit?
    Conservative against the widest selectable block's window."""
    w = ALIGN + BLOCK_MAX
    out_pad = ((num_groups + w) + ALIGN - 1) // ALIGN * ALIGN
    return out_pad * 4 * max(n_ops, 1) <= ACCUM_VMEM_BUDGET


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


def _kernel(
    ops, mask_map, val_map, n_vals, n_masks, dense, has_ends, sum_split,
    prefix, num_groups, variant, finite_ops, BLOCK, W, gid_ref, *refs
):
    # NOTE: BLOCK/W parameters shadow the module defaults — every use
    # below is the per-call block size and its ALIGN + BLOCK window.
    uval_refs = refs[:n_vals]
    val_refs = [
        None if vm is None else uval_refs[vm] for vm in val_map
    ]
    umask_refs = refs[n_vals : n_vals + n_masks]
    rest = refs[n_vals + n_masks :]
    # mask_map entries of None mean "no mask stream": every row
    # contributes to its own slot, and invalid rows carry an id >=
    # num_groups whose (padded-table) slot is sliced off at return —
    # zero-neutral sum/count self-absorb there, so the i8 stream, its
    # DMA, and the per-chunk mask ops all drop out (c2: the selection
    # is already encoded in the packed id routing).
    end_ref = rest[0] if has_ends else None
    out_refs = rest[1 if has_ends else 0 :]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for a, op in enumerate(ops):
            out_refs[a][:] = jnp.full(
                out_refs[a].shape, _identity(op, out_refs[a].dtype)
            )

    if prefix:
        # gid_ref carries BOUNDARY flags with the block's global base
        # count ENCODED into element 0 ((base << 1) | flag — no extra
        # input, no SMEM-derived offsets); group ids materialize
        # IN-KERNEL as base + within-block inclusive prefix, so the
        # full-length XLA cumsum (+ its HBM materialization) drops out
        # of the pipeline (~7 ms at 33.5M rows, PERFLOG r4.6). The
        # prefix runs on the [BLOCK/128, 128] tile image: 7 doubling
        # lane-shift adds (pad+static-slice; offsets < 128 lanes lower
        # fine) + a tiny lower-triangular MXU dot for the row offsets.
        raw = gid_ref[:]  # [BLOCK] int32
        first = lax.broadcasted_iota(jnp.int32, (BLOCK,), 0) == 0
        base = raw[0] >> 1
        bnd = jnp.where(first, raw & 1, raw)
        SL = BLOCK // 128
        b2 = bnd.reshape(SL, 128)  # T(1024) -> T(8,128): free
        acc = b2
        shift = 1
        while shift < 128:
            acc = acc + lax.slice(
                jnp.pad(acc, ((0, 0), (shift, 0))), (0, 0), (SL, 128)
            )
            shift *= 2
        rowsum = jnp.sum(b2, axis=1, keepdims=True)  # [SL, 1]
        r_i = lax.broadcasted_iota(jnp.int32, (SL, SL), 0)
        c_i = lax.broadcasted_iota(jnp.int32, (SL, SL), 1)
        lt = (c_i < r_i).astype(jnp.float32)
        rs2 = jnp.broadcast_to(rowsum, (SL, 128)).astype(jnp.float32)
        offs = jnp.dot(
            lt, rs2, preferred_element_type=jnp.float32
        ).astype(jnp.int32)  # [SL, 128]: exclusive row prefix, exact < 2^24
        gid2 = base + offs + acc - 1
        # overflow clamp (r4.5): ids past the compiled capacity must not
        # push the accumulator-window write past the padded table
        gid2 = jnp.minimum(gid2, jnp.int32(num_groups))
        gid = gid2.reshape(BLOCK)
    else:
        gid = gid_ref[:]  # [BLOCK] int32; ascending unless dense mode
    if dense:
        # dense mode: every group id fits the [0, W) window — no sort
        # needed upstream, ids may arrive in any order
        abase = 0
        local = gid
    else:
        base0 = gid[0]
        abase = pl.multiple_of((base0 // ALIGN) * ALIGN, ALIGN)
        local = gid - abase  # in [0, ALIGN + BLOCK) = [0, W) for valid rows
    in_window = jnp.logical_and(local >= 0, local < W)
    local_w_full = jnp.where(in_window, local, W)
    cols = lax.broadcasted_iota(jnp.int32, (SUB, W), 1)

    # fold each mask into the int32 index: masked rows get local = W,
    # which matches no window column (Mosaic can't broadcast-insert minor
    # dims on sub-32-bit types, so no 2-D bool masks). One-hots are built
    # per distinct mask and shared by every op using it.
    lmasks: list = []
    ms = []
    for u in range(n_masks):
        m = jnp.logical_and(umask_refs[u][:].astype(jnp.int32) != 0, in_window)
        lmasks.append(jnp.where(m, local, W))
        ms.append(m)
    mask_key_of = list(mask_map)

    def _m(a):
        mk = mask_key_of[a]
        return in_window if mk is None else ms[mk]

    def _lm(a):
        mk = mask_key_of[a]
        return local_w_full if mk is None else lmasks[mk]

    # segmented scans: per-mask run-min/run-max of each f32 min/max op,
    # evaluated at run ends — placement then becomes an MXU matmul of a
    # single-contributor one-hot (exact for one nonzero per column)
    # instead of a [SUB, W] VPU reduce. int32 min/max keeps the VPU cell
    # path (f32 matmul placement is only exact to 2^24 for ints).
    # NOTE: shift-right via zero-pad + offset-0 slice, not pltpu.roll —
    # Mosaic lowers pltpu.roll to tpu.dynamic_rotate, which rejects 1-D
    # vectors ("Unsupported 1D shape"); rows < shift are masked anyway so
    # the pad fill never matters.
    def _shift_right(v, shift):
        return lax.slice(jnp.pad(v, (shift, 0)), (0,), (BLOCK,))

    def seg_scan(v, gid_arr, combine):
        out = v
        shift = 1
        while shift < BLOCK:
            prev = _shift_right(out, shift)
            same = gid_arr == _shift_right(gid_arr, shift)
            row = lax.broadcasted_iota(jnp.int32, (BLOCK,), 0)
            ok = jnp.logical_and(same, row >= shift)
            out = jnp.where(ok, combine(out, prev), out)
            shift *= 2
        return out

    # run-end flags come in precomputed (negative shifts don't lower on
    # 1-D Mosaic vectors; XLA computes them outside the kernel for free)
    is_end = end_ref[:].astype(jnp.int32) != 0 if has_ends else None

    contribs: list = []
    scanned: dict[int, jax.Array] = {}
    for a, op in enumerate(ops):
        dt = jnp.float32 if op in ("sum", "count") else val_refs[a].dtype
        init = _identity(op, dt)
        contribs.append(jnp.full((W,), init, dt))
        if (
            op in ("min", "max")
            and val_refs[a].dtype == jnp.float32
            and not dense
            and has_ends
        ):
            v = val_refs[a][:]
            m = _m(a)
            big = _identity(op, v.dtype)
            vm = jnp.where(m, v, big)  # masked rows are neutral in the scan
            comb = jnp.minimum if op == "min" else jnp.maximum
            # scan within equal-gid runs (requires sorted gids — not dense)
            scanned[a] = seg_scan(vm, gid, comb)

    # placement one-hot for scanned ops uses the raw (unmasked) local
    # index: the run-end row itself may be masked, but it still carries
    # the run's scanned value
    need_local_oh = bool(scanned)
    # factored one-hot (sum/count only, no scanned/min-max cell users of
    # the full [SUB, W] one-hot): split local = hi*128 + lo and scatter
    # via (hi_ohT * row) @ lo_oh — a [W/128, SUB] x [SUB, 128] dot whose
    # (W/128, 128) product reshapes FREE to the 1-D [W] window (T(8,128)
    # on (16,128) is bit-identical to T(1024) on [2048]). Building the
    # hi one-hot TRANSPOSED directly and weighting the SMALL side are
    # both measured wins (62 → 38 → 20 ms/op at 33.5M rows on v5e); the
    # full [SUB, W] one-hot path was 2048 compares/row and a transposed
    # stacked dot.
    factored = not need_local_oh and all(op in ("sum", "count") for op in ops)
    HI, LO = W // 128, 128
    hi_rows = lax.broadcasted_iota(jnp.int32, (HI, SUB), 0)
    lo_cols = lax.broadcasted_iota(jnp.int32, (SUB, LO), 1)
    for s in range(BLOCK // SUB):
        sl = slice(s * SUB, (s + 1) * SUB)
        local_w = local_w_full
        _oh_cache: dict = {}

        def _oh(mk, sl=sl, _oh_cache=_oh_cache):
            # [SUB, W] one-hot for mask slot mk (None = window-only)
            if mk not in _oh_cache:
                lm = local_w if mk is None else lmasks[mk]
                _oh_cache[mk] = (lm[sl][:, None] == cols).astype(jnp.float32)
            return _oh_cache[mk]

        oh_local = _oh(None) if need_local_oh else None
        # ---- sum/count: ONE stacked dot per mask ----------------------
        # the MXU pads M up to a full sublane tile, so stacking every
        # sum/count op that shares a mask into one [A, SUB] @ [SUB, W]
        # product costs the same as a single row — and the whole stack
        # shares the multi-pass f32 product (DEFAULT precision rounds the
        # f32 value operand to bf16 in the MXU: measured ~0.4% relative
        # error in grouped SUM on real v5e hardware; 0/1 count rows are
        # exact at any precision).
        by_mask: dict[int, list[int]] = {}
        for a, op in enumerate(ops):
            if op in ("sum", "count"):
                by_mask.setdefault(mask_key_of[a], []).append(a)
        # Exact sum rows WITHOUT Precision.HIGHEST: split each f32 value
        # row into three bf16-exact parts (Veltkamp-style: r0 = bf16(v),
        # r1 = bf16(v - r0), r2 = the 8-bit tail — all three round-trip
        # bf16 losslessly, and the one-hot side is 0/1 which is bf16-
        # exact too), so THREE default-precision MXU passes reproduce
        # HIGHEST bit-for-bit while fusing into the same stacked dot as
        # the count rows. HIGHEST costs 6 passes because XLA must split
        # BOTH operands; we know one side is exact. Measured on v5e:
        # the c2 sum dot was 53 ms of the 58 ms above the sort floor
        # (benchmarks/profile_c2.py, PERFLOG r4.1).
        def _sum_parts(row):
            if not sum_split:  # DFTPU_SUM_SPLIT=0: single pass, value
                return (row,)  # operand rounds to bf16 in the MXU (perf
                # probe / lossy fast mode — NOT parity-safe)
            r0 = row.astype(jnp.bfloat16).astype(jnp.float32)
            rem = row - r0
            r1 = rem.astype(jnp.bfloat16).astype(jnp.float32)
            r2 = rem - r1
            return (r0, r1, r2)

        if factored:
            # ONE mask-free one-hot pair per chunk, shared by EVERY
            # sum/count op: zero-neutral reductions fold the mask into
            # the ROW (a masked row scatters 0 into its real slot —
            # harmless), so per-mask one-hot pipelines — and their VMEM
            # traffic, the kernel's measured bottleneck (PERFLOG r4.4:
            # cost flat in SUB, weak in BLOCK, linear in op/mask count)
            # — collapse into one. Every dot operand is bf16-EXACT (0/1
            # one-hots; the bf16x3-split value parts), halving the
            # materialized bytes again; MXU accumulation stays f32.
            # Out-of-window rows carry local_w = W: hi = W//128 == HI
            # matches no hi_rows row, zeroing the product.
            f32b = "f32b" in variant
            perpart = "perpart" in variant
            lw = local_w[sl]
            hi_eq = hi_rows == (lw // LO)[None, :]
            hi_ohT = hi_eq.astype(jnp.float32 if f32b else jnp.bfloat16)
            lo_oh = ((lw % LO)[:, None] == lo_cols).astype(jnp.bfloat16)

            def _scaled(row):
                # row is bf16-exact f32; the 0/1*row product is exact in
                # f32 and round-trips the bf16 cast losslessly. f32b does
                # the sublane broadcast in f32 (32-bit broadcasts lower
                # better than sub-32-bit on some Mosaic versions) and
                # pays one extra [HI, SUB] pack-cast.
                if f32b:
                    return (hi_ohT * row[None, :]).astype(jnp.bfloat16)
                return hi_ohT * row.astype(jnp.bfloat16)[None, :]

            blocks = []
            plan = []  # (op index, number of stacked parts)
            for a, op in enumerate(ops):
                maskless = mask_key_of[a] is None
                if op == "count":
                    if maskless:
                        # every row counts 1 into its own slot (invalid
                        # rows self-absorb in the dropped slot): the
                        # block IS the shared hi one-hot, no multiply
                        blocks.append(
                            hi_ohT
                            if not f32b
                            else hi_ohT.astype(jnp.bfloat16)
                        )
                    else:
                        row = ms[mask_key_of[a]].astype(jnp.float32)[sl]
                        blocks.append(_scaled(row))
                    plan.append((a, 1))
                else:
                    v = val_refs[a][:]
                    # in-kernel zero-sanitize: NaN/±inf would poison the
                    # one-hot product; doing it here (not as an XLA
                    # pre-pass) saves an [n] f32 materialization. Ops
                    # whose stream is compiler-probed all-finite
                    # (finite_ops[a]: ingest statistics) skip it.
                    if v.dtype == jnp.float32 and not finite_ops[a]:
                        keep = (
                            jnp.isfinite(v)
                            if maskless
                            else jnp.logical_and(_m(a), jnp.isfinite(v))
                        )
                    elif maskless:
                        keep = None  # finite/int sum, no mask: raw rows
                    else:
                        keep = _m(a)
                    row = (
                        v
                        if keep is None
                        else jnp.where(keep, v, jnp.zeros((), v.dtype))
                    ).astype(jnp.float32)[sl]
                    parts = _sum_parts(row)
                    for rr in parts:
                        blocks.append(_scaled(rr))
                    plan.append((a, len(parts)))
            if perpart:
                # one dot per stacked part — isolates the concat +
                # tall-M cost of the single stacked dot (perf probe)
                prods = [
                    jnp.dot(b, lo_oh, preferred_element_type=jnp.float32)
                    for b in blocks
                ]
                off = 0
                for a, nparts in plan:
                    part = prods[off]
                    for extra in prods[off + 1 : off + nparts]:
                        part = part + extra
                    contribs[a] = contribs[a] + part.reshape(W)
                    off += nparts
                continue
            stacked = (
                jnp.concatenate(blocks, axis=0)
                if len(blocks) > 1
                else blocks[0]
            )  # [P*HI, SUB] bf16
            prod = jnp.dot(
                stacked, lo_oh, preferred_element_type=jnp.float32
            )  # [P*HI, LO] f32
            off = 0
            for a, nparts in plan:
                part = prod[off * HI : (off + nparts) * HI]
                if nparts > 1:
                    p3 = part.reshape(nparts, HI, LO)
                    part = p3[0] + p3[1] + p3[2]
                contribs[a] = contribs[a] + part.reshape(W)
                off += nparts
            continue

        for mk, idxs in by_mask.items():
            m = in_window if mk is None else ms[mk]
            oh = _oh(mk)
            rows = []
            plan = []
            for a in idxs:
                if ops[a] == "count":
                    rows.append(m.astype(jnp.float32)[sl])
                    plan.append((a, 1))
                else:
                    v = val_refs[a][:]
                    keep = (
                        jnp.logical_and(m, jnp.isfinite(v))
                        if v.dtype == jnp.float32 and not finite_ops[a]
                        else m
                    )
                    row = jnp.where(keep, v, jnp.zeros((), v.dtype)).astype(
                        jnp.float32
                    )[sl]
                    parts = _sum_parts(row)
                    rows.extend(parts)
                    plan.append((a, len(parts)))
            stacked = jnp.stack(rows, axis=0)  # [P, SUB]
            prod = jnp.dot(
                stacked, oh, preferred_element_type=jnp.float32
            )  # [P, W]
            r = 0
            for a, nparts in plan:
                part = prod[r] if nparts == 1 else prod[r] + prod[r + 1] + prod[r + 2]
                contribs[a] = contribs[a] + part
                r += nparts

        for a, op in enumerate(ops):
            if op in ("sum", "count"):
                continue  # handled by the stacked dot above
            m = _m(a)
            v = val_refs[a][:]
            oh = _oh(mask_key_of[a])
            if a in scanned:
                big = _identity(op, v.dtype)
                # place each run-end's scanned value; exactly one
                # contributor per window column ⇒ the dot IS the value.
                # fully-masked runs carry ±inf — map them to 0 and rely on
                # the presence dot to restore the identity.
                sv = scanned[a][sl]
                ev = jnp.where(is_end[sl], sv, jnp.zeros((), sv.dtype))
                ev = jnp.where(jnp.isfinite(ev), ev, jnp.zeros((), sv.dtype))
                pres = jnp.where(
                    jnp.logical_and(is_end[sl], jnp.isfinite(sv)),
                    jnp.ones((), jnp.float32),
                    jnp.zeros((), jnp.float32),
                )
                val_dot = jnp.dot(
                    ev[None, :],
                    oh_local,
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,  # carries real f32 values
                )[0]
                pres_dot = jnp.dot(
                    pres[None, :], oh_local, preferred_element_type=jnp.float32
                )[0]
                placed = jnp.where(pres_dot > 0, val_dot, big)
                contribs[a] = (
                    jnp.minimum(contribs[a], placed)
                    if op == "min"
                    else jnp.maximum(contribs[a], placed)
                )
            else:
                big = _identity(op, v.dtype)
                cell = jnp.where(oh > 0, v[sl][:, None], big)
                red = jnp.min(cell, axis=0) if op == "min" else jnp.max(cell, axis=0)
                contribs[a] = (
                    jnp.minimum(contribs[a], red)
                    if op == "min"
                    else jnp.maximum(contribs[a], red)
                )

    for a, op in enumerate(ops):
        window = out_refs[a][pl.ds(abase, W)]
        if op in ("sum", "count"):
            out_refs[a][pl.ds(abase, W)] = window + contribs[a].astype(window.dtype)
        elif op == "min":
            out_refs[a][pl.ds(abase, W)] = jnp.minimum(window, contribs[a])
        else:
            out_refs[a][pl.ds(abase, W)] = jnp.maximum(window, contribs[a])


def _segscan_enabled() -> bool:
    """Segmented-scan MXU placement for f32 MIN/MAX (v2). Off by default:
    the in-kernel log-shift scan needs 1-D shifts Mosaic currently rejects
    at larger offsets; DFTPU_SEGSCAN=1 re-enables for experiments."""
    import os

    return os.environ.get("DFTPU_SEGSCAN", "0") == "1"


def segmented_reduce_sorted(
    gid: jax.Array,
    values: tuple[jax.Array, ...],
    masks: tuple[jax.Array, ...],
    *,
    ops: tuple[str, ...],
    num_groups: int,
    interpret: bool = False,
    dense: bool = False,
    prefix: bool = False,
    finite_ops: tuple[bool, ...] | None = None,
    block: int | None = None,
):
    import os

    return _segmented_reduce_sorted(
        gid,
        values,
        masks,
        ops=ops,
        num_groups=num_groups,
        interpret=interpret,
        dense=dense,
        segscan=_segscan_enabled(),
        sum_split=os.environ.get("DFTPU_SUM_SPLIT", "1") != "0",
        prefix=prefix,
        variant=os.environ.get("DFTPU_SEG_VARIANT", ""),
        finite_ops=finite_ops if finite_ops is not None else (False,) * len(ops),
        block=block if block is not None else BLOCK,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "ops", "num_groups", "interpret", "dense", "segscan", "sum_split",
        "prefix", "variant", "finite_ops", "block",
    ),
)
def _segmented_reduce_sorted(
    gid: jax.Array,
    values: tuple[jax.Array, ...],
    masks: tuple[jax.Array, ...],
    *,
    ops: tuple[str, ...],
    num_groups: int,
    interpret: bool = False,
    dense: bool = False,
    segscan: bool = False,
    sum_split: bool = True,
    prefix: bool = False,
    variant: str = "",
    finite_ops: tuple[bool, ...] = (),
    block: int = BLOCK,
):
    """Reduce `values[a]` into per-group slots according to sorted `gid`.

    gid: [N] int32 ascending for valid rows; invalid rows must hold an id
         >= num_groups AND sort after all valid rows. With dense=True the
         ids may arrive in ANY order but must satisfy num_groups <= W
         (small dense key domains, e.g. dictionary codes) — this is the
         sort-free group-by path.
    values[a]: [N] (f32 for sum; f32/i32 for min/max) — None for COUNT
         ops (count reads only its mask; a None ships no input stream)
    masks[a]: [N] bool — row contributes to aggregate a
    Returns tuple of [num_groups] arrays (f32 for sum/count).
    """
    n = int(gid.shape[0])
    w = ALIGN + block  # per-call update-window width
    assert n % block == 0, f"input length {n} not a multiple of {block}"
    assert block % SUB == 0, f"block {block} not a multiple of SUB {SUB}"
    if dense:
        assert num_groups <= w, f"dense mode requires num_groups <= {w}"
    # window starts are tile-aligned; pad so the last window fits
    out_pad = ((num_groups + w) + ALIGN - 1) // ALIGN * ALIGN

    # dedupe mask arrays so ops sharing a mask share its one-hots.
    # None masks ship NO stream: every row contributes to its own slot
    # (callers route invalid rows to ids >= num_groups, whose padded
    # slots are sliced off at return) — valid only for zero-neutral
    # sum/count ops and min/max whose invalid rows are so routed.
    umasks: list = []
    mask_map: list = []
    seen: dict[int, int] = {}
    for m in masks:
        if m is None:
            mask_map.append(None)
            continue
        mid = id(m)
        if mid not in seen:
            seen[mid] = len(umasks)
            umasks.append(m)
        mask_map.append(seen[mid])

    # pack value streams: Nones (count ops) and duplicates ship once
    uvals: list = []
    val_map: list = []
    vseen: dict[int, int] = {}
    for v in values:
        if v is None:
            val_map.append(None)
            continue
        vid = id(v)
        if vid not in vseen:
            vseen[vid] = len(uvals)
            uvals.append(v)
        val_map.append(vseen[vid])

    # The segmented-scan min/max path needs per-block run-end flags; they
    # use shifts Mosaic can't lower on 1-D vectors, so XLA computes them
    # here (outside the kernel) and ships them in as one extra i8 input.
    has_ends = segscan and not dense and any(
        op in ("min", "max")
        and values[a] is not None
        and values[a].dtype == jnp.float32
        for a, op in enumerate(ops)
    )
    extra = []
    if has_ends:
        iota = jnp.arange(n, dtype=jnp.int32)
        nextg = jnp.concatenate([gid[1:], jnp.full((1,), -1, gid.dtype)])
        is_end = jnp.logical_or(iota % block == block - 1, gid != nextg)
        extra.append(is_end.astype(jnp.int8))

    grid = (n // block,)
    in_specs = [pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM)]
    for _ in uvals:
        in_specs.append(pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM))
    for _ in umasks:
        in_specs.append(pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM))
    for _ in extra:
        in_specs.append(pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM))

    out_shapes = []
    out_specs = []
    for a, op in enumerate(ops):
        dt = jnp.float32 if op in ("sum", "count") else values[a].dtype
        out_shapes.append(jax.ShapeDtypeStruct((out_pad,), dt))
        out_specs.append(
            pl.BlockSpec((out_pad,), lambda i: (0,), memory_space=pltpu.VMEM)
        )

    fin = tuple(finite_ops) if finite_ops else (False,) * len(ops)
    kernel = functools.partial(
        _kernel, ops, tuple(mask_map), tuple(val_map), len(uvals),
        len(umasks), dense, has_ends, sum_split, prefix, num_groups,
        variant, fin, block, w,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(gid, *uvals, *[m.astype(jnp.int8) for m in umasks], *extra)
    return tuple(o[:num_groups] for o in outs)
