"""Pallas TPU kernels: slab partition + windowed reduce — the sort-free
GROUP BY past the 2047-slot dense window (VERDICT r2 next #3).

Replaces the dominant multi-operand `lax.sort` of the packed-gid GROUP
BY (~148 ms for 3 operands at 33.5M rows on v5e) with two sort-free
passes over the data:

  KERNEL 1 — slab partition (`slab_partition`): each PBLOCK input block
  is compacted BUCKET-MAJOR (bucket = gid // WINDOW) into its own slab
  of the output, with every bucket segment aligned to SLAB_CHUNK rows.
  The compaction is an MXU one-hot permutation: destination
  d = aligned_seg_start[bucket] + rank_within_bucket, built from a
  [PSUB, B] one-hot cumsum (ranks) and placed with a factored one-hot
  matmul (hi = d//128 rows, lo = d%128 cols) at Precision.HIGHEST —
  bf16x3 recovers the full f32 mantissa and each output cell has
  exactly one contributor, so the permutation is EXACT for any f32.
  Alignment gaps hold SENTINEL group ids: the gid column is placed as
  (gid - SENTINEL) and the whole slab shifted by +SENTINEL, so
  positions with no contributor decode to SENTINEL with no extra pass.

  KERNEL 2 — windowed reduce (`windowed_reduce`): because every
  SLAB_CHUNK-aligned chunk of the slab holds rows of ONE bucket, each
  256-row chunk touches one WINDOW-wide span of the accumulator table:
  the kernel keeps the FULL table VMEM-resident (the caller checks
  segreduce.accum_fits_vmem) and updates one dynamic W-window per
  chunk — sum/count as factored one-hot MXU dots, min/max as masked
  [PSUB, W] VPU cell reduces. No ordering assumptions anywhere.

Everything is static BlockSpec I/O — no DMAs, no semaphores. An earlier
design appended ragged segments to globally bucket-contiguous regions
with chunked DMAs at precomputed offsets; it is unimplementable on this
toolchain: Mosaic (jax 0.9.0, remote-compile) crashes on any DMA whose
offset derives from an SMEM-read value (probed on chip: loop-induction
offsets compile, SMEM-value offsets HTTP-500 — PERFLOG r3). The slab
layout needs no cross-block coordination at all, so the histogram /
prefix-base / wipe machinery disappears with the DMAs.

Payload encoding (caller contract, see ops/aggregate.py bigdense):
  * every payload column rides the placement as f32; values must be
    exactly representable (f32 raw is — HIGHEST placement is exact;
    int32 splits into two 16-bit halves when it can exceed 2^24).
  * the gid column packs selection/validity mask bits above the group
    id: gid_packed = gid + mask_bits * id_mod, everything < 2^23 so
    the f32 ride stays exact (id_mod a power of two).

The reference's aggregate hash map (aggregate.rs:548-952 FnvHashMap) is
the role model: this is its TPU realization for wide key domains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 2048  # slots per bucket = the reduce window width
PBLOCK = 8192  # input rows per partition grid step
SLAB_CHUNK = 256  # bucket-segment alignment inside a block slab
PSUB = 256  # rows per in-kernel chunk
ALIGN = 1024  # f32 VMEM tile alignment (dynamic-offset granularity)
SENTINEL = 1 << 23  # gid for alignment gaps; > any id_mod << masks


def slab_capacity(pblock: int, n_buckets: int) -> int:
    """Static slab rows per input block: data + per-bucket alignment,
    rounded to ALIGN so 1-D blocks match XLA's T(1024) layout."""
    cap = pblock + n_buckets * SLAB_CHUNK
    return -(-cap // ALIGN) * ALIGN


def pick_pblock(n: int) -> int | None:
    """Largest supported grid block dividing the row count (capacities
    are 1024-padded engine-wide)."""
    for p in (8192, 4096, 2048, 1024):
        if n % p == 0:
            return p
    return None


def _prefix_rows(x):
    """Inclusive prefix sum along axis 0 via log-shift pad+slice
    (jnp.cumsum does not lower in Mosaic on this toolchain)."""
    rows = x.shape[0]
    out = x
    shift = 1
    while shift < rows:
        prev = lax.slice(
            jnp.pad(out, ((shift, 0), (0, 0))), (0, 0), (rows, x.shape[1])
        )
        out = out + prev
        shift *= 2
    return out


def _prefix_lanes(x):
    """Inclusive prefix sum along axis 1 via log-shift pad+slice."""
    lanes = x.shape[1]
    out = x
    shift = 1
    while shift < lanes:
        prev = lax.slice(
            jnp.pad(out, ((0, 0), (shift, 0))), (0, 0), (x.shape[0], lanes)
        )
        out = out + prev
        shift *= 2
    return out


def _slab_kernel(n_buckets, n_cols, id_mod, pblock, scap, *refs):
    """One grid step: compact a PBLOCK input block bucket-major into its
    slab with SLAB_CHUNK-aligned segments."""
    val_refs = refs[:n_cols]  # f32 columns; col 0 is the packed gid
    out_refs = refs[n_cols : 2 * n_cols]  # [scap] slab per column

    gid = (
        val_refs[0][:].astype(jnp.int32) & jnp.int32(id_mod - 1)
    ) // WINDOW  # bucket per row

    # ---- within-block rank + aligned segment starts -------------------
    # two passes, the one-hots recomputed in pass 2 rather than retained
    # (keeping 32 x [PSUB, nbp] one-hots live was ~4 MB of VMEM pressure)
    nbp = -(-n_buckets // 128) * 128
    cols = lax.broadcasted_iota(jnp.int32, (PSUB, nbp), 1)
    running = jnp.zeros((1, nbp), jnp.float32)
    for s in range(pblock // PSUB):
        sl = slice(s * PSUB, (s + 1) * PSUB)
        oh = (gid[sl][:, None] == cols).astype(jnp.float32)
        running = running + jnp.sum(oh, axis=0, keepdims=True)
    counts = running  # [1, nbp]
    aligned = (
        jnp.ceil(counts / SLAB_CHUNK) * SLAB_CHUNK
    )  # exact in f32 (counts <= pblock << 2^24)
    seg2d = _prefix_lanes(aligned) - aligned  # exclusive, [1, nbp]

    ds = []
    running2 = jnp.zeros((1, nbp), jnp.float32)
    for s in range(pblock // PSUB):
        sl = slice(s * PSUB, (s + 1) * PSUB)
        oh = (gid[sl][:, None] == cols).astype(jnp.float32)
        cum = _prefix_rows(oh) + running2  # inclusive per-bucket rank
        rank = jnp.sum(oh * cum, axis=1) - 1.0
        seg = jnp.sum(oh * seg2d, axis=1)
        ds.append((seg + rank).astype(jnp.int32))
        running2 = running2 + jnp.sum(oh, axis=0, keepdims=True)

    # ---- MXU placement ------------------------------------------------
    HI, LO = scap // 128, 128
    hi_rows = lax.broadcasted_iota(jnp.int32, (HI, PSUB), 0)
    lo_cols = lax.broadcasted_iota(jnp.int32, (PSUB, LO), 1)
    accs = [jnp.zeros((HI, LO), jnp.float32) for _ in range(n_cols)]
    sent = jnp.float32(SENTINEL)
    for s in range(pblock // PSUB):
        sl = slice(s * PSUB, (s + 1) * PSUB)
        dd = ds[s]
        hi_ohT = (hi_rows == (dd // LO)[None, :]).astype(jnp.float32)
        lo_oh = ((dd % LO)[:, None] == lo_cols).astype(jnp.float32)
        for c in range(n_cols):
            v = val_refs[c][sl]
            if c == 0:
                # gid rides shifted by -SENTINEL: positions with no
                # contributor stay 0 and decode to SENTINEL after the
                # +SENTINEL below — gaps need no separate wipe
                v = v - sent
            accs[c] = accs[c] + jnp.dot(
                hi_ohT * v[None, :],
                lo_oh,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,  # exact f32 permutation
            )
    for c in range(n_cols):
        flat = accs[c].reshape(scap)
        out_refs[c][:] = flat + sent if c == 0 else flat


@functools.partial(
    jax.jit,
    static_argnames=("n_buckets", "n_cols", "id_mod", "pblock", "interpret"),
)
def _slab_partition(
    gidf: jax.Array,
    cols: tuple,
    *,
    n_buckets: int,
    n_cols: int,
    id_mod: int,
    pblock: int,
    interpret: bool = False,
):
    n = int(gidf.shape[0])
    scap = slab_capacity(pblock, n_buckets)
    nblocks = n // pblock
    ins = [gidf] + list(cols)
    outs = pl.pallas_call(
        functools.partial(
            _slab_kernel, n_buckets, n_cols, id_mod, pblock, scap
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((pblock,), lambda i: (i,), memory_space=pltpu.VMEM)
            for _ in ins
        ],
        out_specs=tuple(
            pl.BlockSpec((scap,), lambda i: (i,), memory_space=pltpu.VMEM)
            for _ in range(n_cols)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * scap,), jnp.float32)
            for _ in range(n_cols)
        ),
        interpret=interpret,
    )(*ins)
    return outs


def slab_partition(
    gidf: jax.Array,
    cols: tuple,
    *,
    n_buckets: int,
    id_mod: int,
    pblock: int = PBLOCK,
    interpret: bool = False,
):
    """Bucket-major slab compaction (kernel 1 above).

    Returns a tuple of [n_blocks * slab_capacity] f32 arrays: index 0
    the slab-ordered (mask-packed) gid column — alignment gaps hold
    SENTINEL — and 1.. the payload columns. Every SLAB_CHUNK-aligned
    chunk of the output holds rows of ONE bucket."""
    assert id_mod & (id_mod - 1) == 0, "id_mod must be a power of two"
    cols = tuple(cols)
    pad = 1 + len(cols) == 3
    if pad:
        # the remote Mosaic compiler crashes (opaque HTTP 500) on this
        # kernel at EXACTLY three in/out columns — 1, 2, 4 and 5 all
        # compile (probed on chip, PERFLOG r3). Pad with a dummy column
        # and drop its output.
        cols = cols + (gidf,)
    outs = _slab_partition(
        gidf,
        cols,
        n_buckets=n_buckets,
        n_cols=1 + len(cols),
        id_mod=id_mod,
        pblock=pblock,
        interpret=interpret,
    )
    return outs[:-1] if pad else outs


# ---------------------------------------------------------------------------
# Kernel 2: windowed reduce over the slab
# ---------------------------------------------------------------------------

RBLOCK = 1024  # slab rows per reduce grid step
W = WINDOW  # update-window width (multiple of ALIGN)


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


def _windowed_kernel(ops, mask_map, n_masks, out_pad, gid_ref, *refs):
    nags = len(ops)
    val_refs = refs[:nags]
    umask_refs = refs[nags : nags + n_masks]
    out_refs = refs[nags + n_masks :]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for a, op in enumerate(ops):
            out_refs[a][:] = jnp.full(
                out_refs[a].shape, _identity(op, out_refs[a].dtype)
            )

    # every PSUB chunk holds one bucket (slab contract): reduce it into
    # its own dynamically-based W-window of the full accumulator table
    for s in range(RBLOCK // PSUB):
        sl = slice(s * PSUB, (s + 1) * PSUB)
        gid = gid_ref[sl]  # [PSUB] int32 (SENTINEL for gaps)
        gmin = jnp.min(gid)
        abase = (gmin // W) * W
        abase = jnp.minimum(abase, out_pad - W)  # all-sentinel chunks clamp
        abase = pl.multiple_of(abase, ALIGN)
        local = gid - abase
        in_window = jnp.logical_and(local >= 0, local < W)
        cols = lax.broadcasted_iota(jnp.int32, (PSUB, W), 1)

        lmasks = []
        ms = []
        for u in range(n_masks):
            m = jnp.logical_and(
                umask_refs[u][sl].astype(jnp.int32) != 0, in_window
            )
            lmasks.append(jnp.where(m, local, W))
            ms.append(m)

        # sum/count: ONE factored one-hot dot per mask group (the MXU
        # pads M to a sublane tile, so stacking ops that share a mask
        # costs the same as one row — see segreduce.py)
        HI, LO = W // 128, 128
        hi_rows = lax.broadcasted_iota(jnp.int32, (HI, PSUB), 0)
        lo_cols = lax.broadcasted_iota(jnp.int32, (PSUB, LO), 1)
        by_mask: dict[int, list[int]] = {}
        for a, op in enumerate(ops):
            if op in ("sum", "count"):
                by_mask.setdefault(mask_map[a], []).append(a)
        for mk, idxs in by_mask.items():
            lm = lmasks[mk]  # masked rows hold W: hi = W/128 matches nothing
            hi_ohT = (hi_rows == (lm // LO)[None, :]).astype(jnp.float32)
            lo_oh = ((lm % LO)[:, None] == lo_cols).astype(jnp.float32)
            for a in idxs:
                if ops[a] == "count":
                    row = ms[mask_map[a]].astype(jnp.float32)
                    prec = None  # 0/1 operands exact at default
                else:
                    v = val_refs[a][sl]
                    row = jnp.where(
                        ms[mask_map[a]], v, jnp.zeros((), v.dtype)
                    ).astype(jnp.float32)
                    prec = lax.Precision.HIGHEST
                prod = jnp.dot(
                    hi_ohT * row[None, :],
                    lo_oh,
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ).reshape(W)
                win = out_refs[a][pl.ds(abase, W)]
                out_refs[a][pl.ds(abase, W)] = win + prod

        # min/max: masked [PSUB, W] cell reduce on the VPU
        for a, op in enumerate(ops):
            if op in ("sum", "count"):
                continue
            v = val_refs[a][sl]
            big = _identity(op, v.dtype)
            oh = lmasks[mask_map[a]][:, None] == cols
            cell = jnp.where(oh, v[:, None], big)
            red = (
                jnp.min(cell, axis=0) if op == "min" else jnp.max(cell, axis=0)
            )
            win = out_refs[a][pl.ds(abase, W)]
            out_refs[a][pl.ds(abase, W)] = (
                jnp.minimum(win, red) if op == "min" else jnp.maximum(win, red)
            )


@functools.partial(
    jax.jit, static_argnames=("ops", "num_groups", "interpret")
)
def windowed_reduce(
    gid: jax.Array,
    values: tuple[jax.Array, ...],
    masks: tuple[jax.Array, ...],
    *,
    ops: tuple[str, ...],
    num_groups: int,
    interpret: bool = False,
):
    """Reduce slab rows into per-group slots (kernel 2 above).

    gid: [N] int32; rows may arrive in ANY order, but every PSUB-aligned
         chunk must share one WINDOW (slab_partition's contract); gap /
         invalid rows hold an id >= num_groups whose window lies outside
         every real group (SENTINEL).
    Returns tuple of [num_groups] arrays (f32 for sum/count; value dtype
    for min/max)."""
    n = int(gid.shape[0])
    assert n % RBLOCK == 0
    out_pad = ((num_groups + W) + ALIGN - 1) // ALIGN * ALIGN

    umasks: list = []
    mask_map: list[int] = []
    seen: dict[int, int] = {}
    for m in masks:
        if id(m) not in seen:
            seen[id(m)] = len(umasks)
            umasks.append(m)
        mask_map.append(seen[id(m)])

    in_specs = [
        pl.BlockSpec((RBLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)
    ]
    for _ in values:
        in_specs.append(
            pl.BlockSpec((RBLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)
        )
    for _ in umasks:
        in_specs.append(
            pl.BlockSpec((RBLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)
        )

    out_shapes = []
    out_specs = []
    for a, op in enumerate(ops):
        dt = jnp.float32 if op in ("sum", "count") else values[a].dtype
        out_shapes.append(jax.ShapeDtypeStruct((out_pad,), dt))
        out_specs.append(
            pl.BlockSpec((out_pad,), lambda i: (0,), memory_space=pltpu.VMEM)
        )

    outs = pl.pallas_call(
        functools.partial(
            _windowed_kernel, ops, tuple(mask_map), len(umasks), out_pad
        ),
        grid=(n // RBLOCK,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(gid, *values, *[m.astype(jnp.int8) for m in umasks])
    return tuple(o[:num_groups] for o in outs)
