"""Hash repartitioning (shuffle) across the device mesh.

The distributed-join exchange the reference only roadmapped
(ROADMAP.md 0.8-1.0: hash-partitioned tables + worker exchange). Rows
are routed to `hash(key) % n_dev` with an XLA `all_to_all` over ICI:

  1. co-sort local rows by destination device (one lax.sort)
  2. lay the sorted runs into a fixed [n_dev, S] padded send buffer via
     an ascending gather (no scatter)
  3. lax.all_to_all exchanges the per-destination slabs
  4. the receive side flattens [n_dev, S] into a local batch + validity

S is a static per-destination capacity; the true per-destination maxima
ride the totals/caps machinery so skewed keys trigger a recompile with a
bigger S (moderate skew) — heavy-hitter salting is the planned upgrade.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from datafusion_tpu.parallel.mesh import AXIS

ColVal = tuple[jax.Array, Optional[jax.Array]]


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

    # 3) exchange: piece i of the send buffer goes to device i
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
