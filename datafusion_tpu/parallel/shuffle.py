"""Hash repartitioning (shuffle) across the device mesh.

The distributed-join exchange the reference only roadmapped
(ROADMAP.md 0.8-1.0: hash-partitioned tables + worker exchange). Rows
are routed to `hash(key) % n_dev` over ICI:

  1. co-sort local rows by destination device (one lax.sort)
  2. lay the sorted runs into a fixed [n_dev, S] padded send buffer via
     an ascending gather (no scatter)
  3. exchange — one of two strategies (DFTPU_SHUFFLE):
       fixed  (default): lax.all_to_all of the full padded slabs
       ragged: the Pallas chunked-RDMA kernel
               (ops/pallas/ragged_shuffle.py) — wire bytes track the
               true per-destination histogram, per-chunk async DMAs
               pipeline across ICI links
  4. the receive side flattens [n_dev, S] into a local batch + validity

S is a static per-destination capacity; the true per-destination maxima
ride the totals/caps machinery so skewed keys trigger a recompile with a
bigger S (moderate skew); heavy-hitter salting handles pathological
skew (hash_keys_to_device salt_r).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from datafusion_tpu.parallel.mesh import AXIS

ColVal = tuple[jax.Array, Optional[jax.Array]]


def shuffle_strategy() -> str:
    return os.environ.get("DFTPU_SHUFFLE", "fixed")


def hash_keys_to_device(
    keys, n_dev: int, *, salt_r: int = 1, salt: Optional[jax.Array] = None
) -> jax.Array:
    """Route multi-column keys: mix each column and combine — avoids any
    need for exact width-packing (collisions only affect balance, not
    correctness, since both sides hash identically).

    Skew salting (salt_r > 1): a key's rows spread over salt_r distinct
    devices {(h*salt_r + j) % n_dev : j in [0, salt_r)}. Probe rows pass
    salt = row % salt_r; the build side replicates each row once per j so
    every probe replica still sees every matching build row exactly once
    (SURVEY.md §7 skew-aware repartitioning)."""
    h = None
    for k in keys:
        m = k.astype(jnp.uint32) * jnp.uint32(2654435761)
        m = m ^ (m >> 16)
        h = m if h is None else (h * jnp.uint32(31) + m)
    h = h ^ (h >> 13)
    if salt_r > 1:
        s = jnp.uint32(0) if salt is None else salt.astype(jnp.uint32)
        h = h * jnp.uint32(salt_r) + s
    return (h % jnp.uint32(n_dev)).astype(jnp.int32)


def build_regions(
    cols: Sequence[ColVal],
    dst: jax.Array,
    sel: jax.Array,
    n_dev: int,
    split_cap: int,
):
    """Steps 1-2 of the shuffle: per-chip histogram + region layout.
    Co-sorts selected rows by destination and lays the runs into the
    padded [n_dev, split_cap] send buffer (ascending gather, no
    scatter). Returns (send_cols, send_valid, counts, max_split)."""
    from datafusion_tpu.ops.sort import sort_batch

    local_cap = int(sel.shape[0])

    # 1) co-sort by destination (selected rows first)
    sorted_cols, n_sel = sort_batch(
        [((dst, None), True)], list(cols) + [(dst, None)], sel
    )
    payload_sorted = sorted_cols[:-1]
    dst_sorted = sorted_cols[-1][0]
    iota = lax.broadcasted_iota(jnp.int32, (local_cap,), 0)
    sel_sorted_mask = iota < n_sel  # selected rows sort to the front

    # per-destination counts among selected rows (n_dev segments — tiny)
    dst_masked = jnp.where(sel_sorted_mask, dst_sorted, n_dev)
    counts = jax.ops.segment_sum(
        sel_sorted_mask.astype(jnp.int32), dst_masked, num_segments=n_dev + 1
    )[:n_dev]
    starts = jnp.cumsum(counts) - counts
    max_split = jnp.max(counts)

    # 2) ascending gather into the padded [n_dev, split_cap] send layout
    slot = lax.broadcasted_iota(jnp.int32, (n_dev * split_cap,), 0)
    d_of_slot = slot // split_cap
    r_of_slot = slot % split_cap
    src = jnp.take(starts, d_of_slot) + r_of_slot
    send_valid = r_of_slot < jnp.take(counts, d_of_slot)
    src = jnp.clip(src, 0, local_cap - 1)

    def build_send(col: ColVal):
        data, valid = col
        d = jnp.take(data, src)
        v = None if valid is None else jnp.take(valid, src)
        return d, v

    send_cols = [build_send(c) for c in payload_sorted]
    return send_cols, send_valid, counts, max_split


def repartition(
    cols: Sequence[ColVal],
    dst: jax.Array,
    sel: jax.Array,
    n_dev: int,
    split_cap: int,
):
    """Exchange rows so each lands on device `dst[row]`.

    Returns (new_cols, new_sel, max_split) where new arrays have local
    capacity n_dev * split_cap and max_split is the largest true
    per-destination count (> split_cap ⇒ caller must recompile bigger).
    """
    send_cols, send_valid, counts, max_split = build_regions(
        cols, dst, sel, n_dev, split_cap
    )

    # 3) exchange: piece i of the send buffer goes to device i
    if shuffle_strategy() == "ragged":
        from datafusion_tpu.ops.pallas.ragged_shuffle import pick_chunk

        chunk = pick_chunk(split_cap)
        if chunk is not None:
            return _exchange_ragged(send_cols, counts, n_dev, split_cap, chunk) + (
                max_split,
            )

    def a2a(x):
        return lax.all_to_all(
            x.reshape(n_dev, split_cap, *x.shape[1:]),
            AXIS,
            split_axis=0,
            concat_axis=0,
            tiled=False,
        ).reshape(n_dev * split_cap, *x.shape[1:])

    new_cols: list[ColVal] = []
    for d, v in send_cols:
        nd = a2a(d)
        nv = None if v is None else a2a(v)
        new_cols.append((nd, nv))
    new_sel = a2a(send_valid)
    return new_cols, new_sel, max_split


def _exchange_ragged(send_cols, counts, n_dev: int, split_cap: int, chunk: int):
    """Chunked-RDMA exchange of the region-layout send buffer (step 3,
    DFTPU_SHUFFLE=ragged). Validity needs no wire bytes at all: region
    j's valid prefix on the receiver IS sizes[j, me]."""
    from datafusion_tpu.ops.pallas.ragged_shuffle import ragged_exchange

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    sizes = lax.all_gather(counts.astype(jnp.int32), AXIS)  # [n_dev, n_dev]

    flat: list[jax.Array] = []
    spec: list[tuple[bool, object]] = []  # (had_valid, bool_dtype_or_None)
    for d, v in send_cols:
        flat.append(d.astype(jnp.int8) if d.dtype == jnp.bool_ else d)
        spec.append((v is not None, d.dtype if d.dtype == jnp.bool_ else None))
        if v is not None:
            flat.append(v.astype(jnp.int8) if v.dtype == jnp.bool_ else v)

    out = ragged_exchange(
        tuple(flat),
        sizes,
        n_dev=n_dev,
        split_cap=split_cap,
        chunk=chunk,
        interpret=interpret,
    )

    me = lax.axis_index(AXIS)
    recv_counts = lax.dynamic_index_in_dim(sizes.T, me, 0, keepdims=False)
    slot = lax.broadcasted_iota(jnp.int32, (n_dev * split_cap,), 0)
    new_sel = (slot % split_cap) < jnp.take(recv_counts, slot // split_cap)

    new_cols: list[ColVal] = []
    it = iter(out)
    for had_valid, bool_dt in spec:
        d = next(it)
        if bool_dt is not None:
            d = d != 0
        v = None
        if had_valid:
            v = next(it) != 0
        new_cols.append((d, v))
    return new_cols, new_sel
