"""Ragged all-to-all shuffle: per-chip histogram → offsets → chunked RDMA.

The flagship distributed-exchange kernel (SURVEY.md §7 "Ragged
all-to-all shuffle with overlap"), realizing the worker exchange the
reference only roadmapped (reference ROADMAP.md:44-56 — hash-partitioned
tables + worker exchange over a network; here the "network" is the TPU
ICI fabric driven by Pallas remote DMA).

Contrast with the fixed-slab `lax.all_to_all` path
(parallel/shuffle.py): that exchange moves `n_dev * split_cap` rows per
chip regardless of the true histogram, fully serialized with compute.
This kernel moves only `ceil(count/CHUNK) * CHUNK` rows per destination
(wire bytes track the actual histogram), issues every chunk as an
independent async remote DMA so transfers to different neighbors ride
different ICI links concurrently, and exposes the chunk arrival
protocol that the fused exchange+fold variant (see
`ragged_exchange_fold`) overlaps with aggregation compute.

Layout contract (both directions):
  * arrays are 1-D `[n_dev * split_cap]`, region `d` = rows
    `[d*split_cap, d*split_cap + counts[d])` — the send side builds this
    with the same sort-by-destination + ascending-gather pass as the
    fixed path; the receive side's region `j` holds the rows device `j`
    sent me, valid prefix `sizes[j, me]`.
  * `sizes[j, i]` = rows device j sends device i (all_gather'd counts —
    the "per-chip histogram → offsets" step; a [n_dev, n_dev] int32
    matrix in SMEM).

Chunks are `CHUNK` rows (a power of two dividing split_cap) so every
DMA offset is chunk-aligned; the last chunk of a region over-sends up
to CHUNK-1 padding rows that stay inside the region and are masked by
the receive validity.

Validated in Pallas interpret mode on the 8-virtual-device CPU mesh
(tests/test_ragged_shuffle.py) — real multi-chip hardware is not
available in this environment; the single-device degenerate kernel
(local DMA path) runs on the real chip via scripts/validate_tpu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from datafusion_tpu.parallel.mesh import AXIS


def pick_chunk(split_cap: int) -> int | None:
    """Largest power-of-two chunk (<= 1024 rows, >= 128) dividing the
    region capacity. 1024 f32 rows = 4 KiB per DMA and keeps dynamic
    offsets 1024-element-aligned (the Mosaic constraint observed for
    dynamic VMEM offsets; HBM DMA offsets follow the same discipline)."""
    for c in (1024, 512, 256, 128):
        if split_cap % c == 0:
            return c
    return None


def _exchange_kernel(
    sizes_ref,  # SMEM [n_dev, n_dev] int32
    *refs,
    n_dev: int,
    n_arrs: int,
    split_cap: int,
    chunk: int,
):
    ins = refs[:n_arrs]
    outs = refs[n_arrs : 2 * n_arrs]
    send_sem, recv_sem, local_sem = refs[2 * n_arrs :]
    me = lax.axis_index(AXIS)
    max_chunks = split_cap // chunk

    def nchunks(cnt):
        # ceil(cnt / chunk), clamped to the region (overflow rows beyond
        # split_cap are dropped exactly as the fixed-slab path drops
        # them — the caller's max_split overflow retry recompiles bigger)
        return jnp.minimum((cnt + (chunk - 1)) // chunk, max_chunks)

    if n_dev > 1:
        # barrier: a peer must not RDMA into my output buffer before my
        # kernel is live (guide pattern: barrier semaphore, all peers)
        barrier = pltpu.get_barrier_semaphore()
        for r in range(1, n_dev):
            pltpu.semaphore_signal(
                barrier,
                inc=1,
                device_id=lax.rem(me + r, jnp.int32(n_dev)),
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
        pltpu.semaphore_wait(barrier, n_dev - 1)

    # my own region moves with a local async DMA (full region: static
    # size, garbage tail masked by the receive validity)
    for a in range(n_arrs):
        pltpu.make_async_copy(
            ins[a].at[pl.ds(me * split_cap, split_cap)],
            outs[a].at[pl.ds(me * split_cap, split_cap)],
            local_sem,
        ).start()

    def send_chunk(d, k, a, sem):
        return pltpu.make_async_remote_copy(
            src_ref=ins[a].at[pl.ds(d * split_cap + k * chunk, chunk)],
            dst_ref=outs[a].at[pl.ds(me * split_cap + k * chunk, chunk)],
            send_sem=sem,
            recv_sem=recv_sem,
            device_id=d,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    # start every outbound chunk: transfers to distinct neighbors ride
    # distinct ICI links in parallel; the DMA engines pipeline the rest
    for r in range(1, n_dev):
        d = lax.rem(me + r, jnp.int32(n_dev))
        nch = nchunks(sizes_ref[me, d])

        def start_body(k, _, d=d):
            for a in range(n_arrs):
                send_chunk(d, k, a, send_sem).start()
            return 0

        lax.fori_loop(0, nch, start_body, 0)

    # drain: wait local copies, all sends, then all receives
    for a in range(n_arrs):
        pltpu.make_async_copy(
            ins[a].at[pl.ds(me * split_cap, split_cap)],
            outs[a].at[pl.ds(me * split_cap, split_cap)],
            local_sem,
        ).wait()
    for r in range(1, n_dev):
        d = lax.rem(me + r, jnp.int32(n_dev))
        nch = nchunks(sizes_ref[me, d])

        def wait_body(k, _, d=d):
            for a in range(n_arrs):
                send_chunk(d, k, a, send_sem).wait_send()
            return 0

        lax.fori_loop(0, nch, wait_body, 0)
    for r in range(1, n_dev):
        j = lax.rem(me + n_dev - r, jnp.int32(n_dev))
        nch = nchunks(sizes_ref[j, me])

        def recv_body(k, _, j=j):
            for a in range(n_arrs):
                # mirror descriptor: wait_recv only consumes the dst
                # side (shape = semaphore byte count)
                pltpu.make_async_remote_copy(
                    src_ref=ins[a].at[pl.ds(j * split_cap + k * chunk, chunk)],
                    dst_ref=outs[a].at[pl.ds(j * split_cap + k * chunk, chunk)],
                    send_sem=send_sem,
                    recv_sem=recv_sem,
                    device_id=j,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                ).wait_recv()
            return 0

        lax.fori_loop(0, nch, recv_body, 0)


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


_SUB = 256  # fold rows per in-kernel step (bounds [SUB, W] intermediates)


def _fold_sub(ops, mask_map, w_pad, gid_sub, val_subs, mask_subs, acc_refs):
    """Fold one SUB-row slice into the dense accumulator windows.

    Same math as the dense branch of ops/pallas/segreduce.py _kernel
    (factored hi/lo one-hot MXU dots for sum/count — see PERFLOG 08-19
    (2) for the measured derivation — and masked [SUB, W] VPU cell
    reduces for min/max), restated over VMEM-staged exchange chunks.
    gid_sub holds the receiver-local window id; masked rows hold w_pad
    (matches no window column)."""
    hi_rows = lax.broadcasted_iota(jnp.int32, (w_pad // 128, _SUB), 0)
    lo_cols = lax.broadcasted_iota(jnp.int32, (_SUB, 128), 1)
    cols = lax.broadcasted_iota(jnp.int32, (_SUB, w_pad), 1)

    lms = [
        jnp.where(m, gid_sub, w_pad) for m in mask_subs
    ]  # per unique mask: masked-out rows match nothing
    by_mask: dict[int, list[int]] = {}
    for a, op in enumerate(ops):
        if op in ("sum", "count"):
            by_mask.setdefault(mask_map[a], []).append(a)
    for mk, idxs in by_mask.items():
        lm = lms[mk]
        hi_ohT = (hi_rows == (lm // 128)[None, :]).astype(jnp.float32)
        lo_oh = ((lm % 128)[:, None] == lo_cols).astype(jnp.float32)
        for a in idxs:
            if ops[a] == "count":
                row = mask_subs[mk].astype(jnp.float32)
                prec = None  # 0/1 operands are exact at default precision
            else:
                v = val_subs[a]
                row = jnp.where(mask_subs[mk], v, jnp.zeros((), v.dtype)).astype(
                    jnp.float32
                )
                prec = lax.Precision.HIGHEST
            prod = jnp.dot(
                hi_ohT * row[None, :],
                lo_oh,
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # [W/128, 128] reshapes FREE to the 1-D window
            acc_refs[a][:] = acc_refs[a][:] + prod.reshape(w_pad)
    for a, op in enumerate(ops):
        if op in ("sum", "count"):
            continue
        v = val_subs[a]
        big = _identity(op, v.dtype)
        oh = (lms[mask_map[a]][:, None] == cols).astype(jnp.float32)
        cell = jnp.where(oh > 0, v[:, None], big)
        red = jnp.min(cell, axis=0) if op == "min" else jnp.max(cell, axis=0)
        acc_refs[a][:] = (
            jnp.minimum(acc_refs[a][:], red)
            if op == "min"
            else jnp.maximum(acc_refs[a][:], red)
        )


def _exchange_fold_kernel(
    sizes_ref,  # SMEM [n_dev, n_dev] int32
    *refs,
    ops: tuple[str, ...],
    mask_map: tuple[int, ...],
    n_masks: int,
    n_dev: int,
    split_cap: int,
    chunk: int,
    w_pad: int,
):
    """Ragged exchange fused with the dense aggregate fold — the
    overlap realization of SURVEY.md §7's flagship: while later senders'
    chunks are still in flight on ICI, already-arrived regions stream
    HBM→VMEM on a double-buffered local DMA and fold into the group
    windows on the MXU/VPU. The three latencies (remote DMA, staging
    DMA, fold compute) pipeline against each other; nothing waits for
    the full exchange before computing.

    Input refs: gid + len(ops) values + n_masks mask arrays, all region
    layout. Output refs: per-op [w_pad] accumulators, then the recv
    regions (RDMA landing buffers; not consumed by the caller)."""
    n_arrs = 1 + len(ops) + n_masks
    ins = refs[:n_arrs]
    accs = refs[n_arrs : n_arrs + len(ops)]
    outs = refs[n_arrs + len(ops) : n_arrs + len(ops) + n_arrs]
    scratch = refs[2 * n_arrs + len(ops) :]
    send_sem, recv_sem, local_sem = scratch[0], scratch[1], scratch[2]
    # two statically-indexed staging buffer banks (Mosaic rejects
    # dynamic slot slices of a [2, n_arrs, chunk] VMEM buffer: non-minor
    # dims carry the (8,128) tiling); slot s array a = stages[s][a]
    stages = (scratch[3 : 3 + n_arrs], scratch[3 + n_arrs :])
    me = lax.axis_index(AXIS)
    max_chunks = split_cap // chunk

    for a in range(len(ops)):
        accs[a][:] = jnp.full((w_pad,), _identity(ops[a], accs[a].dtype))

    def nchunks(cnt):
        return jnp.minimum((cnt + (chunk - 1)) // chunk, max_chunks)

    if n_dev > 1:
        barrier = pltpu.get_barrier_semaphore()
        for r in range(1, n_dev):
            pltpu.semaphore_signal(
                barrier,
                inc=1,
                device_id=lax.rem(me + r, jnp.int32(n_dev)),
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
        pltpu.semaphore_wait(barrier, n_dev - 1)

    def chunk_desc(sender, peer, src_region, dst_region, k, a):
        # the RDMA between (sender, receiver): src region = receiver's
        # slot in the sender's send buffer, dst region = sender's slot
        # in the receiver's recv buffer. recv_sem is indexed by SENDER:
        # the fold waits receives region-by-region, so sender j's
        # arrivals must not satisfy a wait for sender j' (a single
        # shared recv semaphore would — semaphores count bytes, not
        # origins). Both parties build the same-shape descriptor; the
        # sender .start()s it, the receiver .wait_recv()s its mirror.
        return pltpu.make_async_remote_copy(
            src_ref=ins[a].at[pl.ds(src_region * split_cap + k * chunk, chunk)],
            dst_ref=outs[a].at[pl.ds(dst_region * split_cap + k * chunk, chunk)],
            send_sem=send_sem,
            recv_sem=recv_sem.at[sender],
            device_id=peer,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def send_chunk(d, k, a):
        return chunk_desc(me, d, d, me, k, a)

    def recv_mirror(j, k, a):
        return chunk_desc(j, j, me, j, k, a)

    # 1) launch the full outbound schedule up front
    for r in range(1, n_dev):
        d = lax.rem(me + r, jnp.int32(n_dev))
        nch = nchunks(sizes_ref[me, d])

        def start_body(k, _, d=d):
            for a in range(n_arrs):
                send_chunk(d, k, a).start()
            return 0

        lax.fori_loop(0, nch, start_body, 0)

    # 2) stream regions through VMEM and fold, double-buffered. Region
    #    sources: my own rows come straight from `ins`; peer rows from
    #    the recv buffer once their chunks land.
    def stage_dma(src_is_in, j, k, slot, a):
        # per-BANK staging semaphore: both banks' DMAs are in flight
        # together, and a shared counter would let bank-1 completions
        # satisfy a bank-0 wait (same hazard as the per-sender recv_sem)
        src = ins[a] if src_is_in else outs[a]
        return pltpu.make_async_copy(
            src.at[pl.ds(j * split_cap + k * chunk, chunk)],
            stages[slot][a],
            local_sem.at[slot],
        )

    def fold_bank(slot, rows_valid):
        # everything rides the exchange as int32 BITS (bit-exact for f32
        # and i32 alike); reinterpret here, never convert
        bank = stages[slot]
        gid = bank[0][:]
        vals = [
            bank[1 + a][:]
            if accs[a].dtype == jnp.int32
            else lax.bitcast_convert_type(bank[1 + a][:], accs[a].dtype)
            for a in range(len(ops))
        ]
        riota = lax.broadcasted_iota(jnp.int32, (chunk,), 0)
        rv = riota < rows_valid
        # mask index 0 is the IMPLICIT all-valid mask (just the region's
        # row-validity — costs no wire bytes); exchanged masks follow
        msks = [rv] + [
            jnp.logical_and(bank[1 + len(ops) + u][:] != 0, rv)
            for u in range(n_masks)
        ]
        for s in range(chunk // _SUB):
            sl = slice(s * _SUB, (s + 1) * _SUB)
            gsl = jnp.clip(gid[sl], 0, w_pad - 1)
            _fold_sub(
                ops,
                mask_map,
                w_pad,
                gsl,
                [v[sl] for v in vals],
                [m[sl] for m in msks],
                accs,
            )

    def process_region(src_is_in, j, cnt):
        # software-pipelined double buffer over the two static banks:
        # the fold of chunk k always runs while chunk k+1's staging DMA
        # is in flight, and the inter-chip RDMAs for later regions are
        # in flight throughout. Region j's arrivals are drained in full
        # before its first fold: recv semaphores count bytes, not chunk
        # identities, so per-chunk waits could pass on out-of-order
        # arrivals — region granularity keeps the cross-region overlap
        # (the dominant term) and stays exact.
        nch = nchunks(cnt)

        if not src_is_in:
            def drain(k, _):
                for a in range(n_arrs):
                    recv_mirror(j, k, a).wait_recv()
                return 0

            lax.fori_loop(0, nch, drain, 0)

        def prep(k, slot):
            for a in range(n_arrs):
                stage_dma(src_is_in, j, k, slot, a).start()

        def wait_bank(k, slot):
            for a in range(n_arrs):
                stage_dma(src_is_in, j, k, slot, a).wait()

        @pl.when(nch > 0)
        def _():
            prep(0, 0)

        def body(k2, _):
            k0, k1 = 2 * k2, 2 * k2 + 1
            wait_bank(k0, 0)

            @pl.when(k1 < nch)
            def _():
                prep(k1, 1)

            fold_bank(0, cnt - k0 * chunk)  # overlaps bank-1 staging

            @pl.when(k1 < nch)
            def _():
                wait_bank(k1, 1)

                @pl.when(k1 + 1 < nch)
                def _():
                    prep(k1 + 1, 0)

                fold_bank(1, cnt - k1 * chunk)  # overlaps bank-0 staging

            return 0

        lax.fori_loop(0, (nch + 1) // 2, body, 0)

    process_region(True, me, sizes_ref[me, me])
    for r in range(1, n_dev):
        j = lax.rem(me + jnp.int32(n_dev - r), jnp.int32(n_dev))
        process_region(False, j, sizes_ref[j, me])

    # 3) drain sends before exit (src buffers must stay safe to free)
    for r in range(1, n_dev):
        d = lax.rem(me + r, jnp.int32(n_dev))
        nch = nchunks(sizes_ref[me, d])

        def wait_body(k, _, d=d):
            for a in range(n_arrs):
                send_chunk(d, k, a).wait_send()
            return 0

        lax.fori_loop(0, nch, wait_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ops", "mask_map", "n_dev", "split_cap", "chunk", "num_groups",
        "interpret",
    ),
)
def ragged_exchange_fold(
    gid: jax.Array,
    vals,
    masks,
    sizes: jax.Array,
    *,
    ops: tuple[str, ...],
    mask_map: tuple[int, ...],
    n_dev: int,
    split_cap: int,
    chunk: int,
    num_groups: int,
    interpret: bool = False,
):
    """Fused repartition + dense grouped aggregation: rows leave as
    RDMA chunks and arrive as per-group partial windows — no
    materialized post-exchange batch, no lax.sort, and the fold compute
    overlaps the in-flight exchange (module docstring / SURVEY §7).

    gid:   [n_dev*split_cap] int32 region layout — RECEIVER-local window
           ids (< num_groups), i.e. global_gid // n_dev when routing by
           global_gid % n_dev.
    vals:  per-op value arrays (f32 for sum/count; f32/i32 min/max).
    masks: deduped per-op row masks (int8/bool/int32 nonzero=true).
    mask_map[a]: op a's mask — 0 = the implicit all-valid mask (region
           row-validity only, no wire bytes), 1+u = masks[u].
    Returns per-op [num_groups] windows (sum/count f32; min/max carry
    their identities for empty groups — mask with an exists count)."""
    assert num_groups <= 2048, "dense fold window is capped at 2048 slots"
    w_pad = -(-num_groups // 1024) * 1024
    n_arrs = 1 + len(vals) + len(masks)

    def as_bits(x):  # int32 bit-image: DMA-exact for f32 and i32 alike
        if x.dtype == jnp.int32:
            return x
        if x.dtype == jnp.float32:
            return lax.bitcast_convert_type(x, jnp.int32)
        return x.astype(jnp.int32)

    arrs = (gid.astype(jnp.int32),) + tuple(as_bits(v) for v in vals) + tuple(
        m.astype(jnp.int32) for m in masks
    )
    kern = functools.partial(
        _exchange_fold_kernel,
        ops=ops,
        mask_map=mask_map,
        n_masks=len(masks),
        n_dev=n_dev,
        split_cap=split_cap,
        chunk=chunk,
        w_pad=w_pad,
    )
    acc_dts = [
        jnp.float32 if op in ("sum", "count") else vals[a].dtype
        for a, op in enumerate(ops)
    ]
    outs = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_arrs,
        out_specs=tuple(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ops)
            + [pl.BlockSpec(memory_space=pl.ANY)] * n_arrs
        ),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((w_pad,), dt) for dt in acc_dts]
            + [
                jax.ShapeDtypeStruct((n_dev * split_cap,), jnp.int32)
                for _ in range(n_arrs)
            ]
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((n_dev,)),  # per-SENDER recv slots
            pltpu.SemaphoreType.DMA((2,)),  # per-BANK staging sems
        ]
        + [pltpu.VMEM((chunk,), jnp.int32) for _ in range(2 * n_arrs)],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=8
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(sizes, *arrs)
    return tuple(outs[a][:num_groups] for a in range(len(ops)))


@functools.partial(
    jax.jit, static_argnames=("n_dev", "split_cap", "chunk", "interpret")
)
def ragged_exchange(
    arrs,
    sizes: jax.Array,
    *,
    n_dev: int,
    split_cap: int,
    chunk: int,
    interpret: bool = False,
):
    """Exchange region-layout arrays (see module docstring). `arrs` is a
    flat tuple of 1-D [n_dev*split_cap] arrays that ride the same chunk
    schedule; `sizes` the all_gather'd [n_dev, n_dev] count matrix.
    Returns the received region-layout arrays (tails uninitialized —
    mask with the per-region valid prefix `sizes[j, me]`)."""
    n_arrs = len(arrs)
    kern = functools.partial(
        _exchange_kernel,
        n_dev=n_dev,
        n_arrs=n_arrs,
        split_cap=split_cap,
        chunk=chunk,
    )
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_arrs,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in arrs),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_dev * split_cap,), a.dtype) for a in arrs
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(sizes, *arrs)
