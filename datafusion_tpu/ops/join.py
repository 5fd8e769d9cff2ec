"""Equi-join — the reference's 0.7.0 roadmap item (ROADMAP.md:33),
implemented here as a vectorized sort + binary-search join.

Shape discipline: XLA needs static shapes, so the output has a static
`out_capacity`; the kernel also returns the true match count so the
caller can detect overflow on the host and recompile with a larger
capacity (the fixed-capacity + valid-count idiom, SURVEY.md §7).

Duplicate keys on the build side are handled by ranged matches: for each
probe row, [start, end) over the sorted build side; output slot k maps
back to its probe row by searching the running offsets.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

ColVal = tuple[jax.Array, Optional[jax.Array]]


def _pack_keys(
    keys: Sequence[jax.Array], key_maxes: Optional[Sequence[Optional[int]]] = None
) -> jax.Array:
    """Combine up to two key columns into one sortable integer.

    Single keys pass through. Two keys pack into int64 when 64-bit mode
    is available; otherwise (TPU benches run with x64 off, where int64
    silently narrows to int32) they pack into int32 — which requires
    statically known non-negative key bounds (`key_maxes`, e.g.
    dictionary vocabulary sizes) whose bit widths sum to ≤ 31.
    """
    if len(keys) == 1:
        return keys[0]
    if len(keys) != 2:
        raise NotImplementedError("joins on >2 key columns not yet supported")
    import jax as _jax

    if _jax.config.jax_enable_x64:
        a = keys[0].astype(jnp.int64)
        b = keys[1].astype(jnp.int64)
        return (a << 32) | (b & 0xFFFFFFFF)
    maxes = list(key_maxes) if key_maxes else [None, None]
    if maxes[0] is None or maxes[1] is None:
        raise NotImplementedError(
            "two-column joins without 64-bit support need statically "
            "bounded keys (e.g. dictionary-coded strings)"
        )
    bits_b = max(int(maxes[1]).bit_length(), 1)
    bits_a = max(int(maxes[0]).bit_length(), 1)
    if bits_a + bits_b > 31:
        raise NotImplementedError(
            f"two-column join key domains too large to pack into int32 "
            f"({bits_a}+{bits_b} bits)"
        )
    return (keys[0] << bits_b) | keys[1]


def inner_join_indices(
    probe_keys: Sequence[jax.Array],
    probe_sel: jax.Array,
    build_keys: Sequence[jax.Array],
    build_sel: jax.Array,
    out_capacity: int,
):
    """Inner equi-join gather indices. Returns (probe_idx, build_idx,
    out_sel, total); see join_indices."""
    p, b, s, m, t = join_indices(
        probe_keys, probe_sel, build_keys, build_sel, out_capacity,
        keep_unmatched_probe=False,
    )
    return p, b, s, t


def join_indices(
    probe_keys: Sequence[jax.Array],
    probe_sel: jax.Array,
    build_keys: Sequence[jax.Array],
    build_sel: jax.Array,
    out_capacity: int,
    *,
    keep_unmatched_probe: bool = False,
    key_maxes: Optional[Sequence[Optional[int]]] = None,
):
    """Compute gather indices realizing an equi-join.

    keep_unmatched_probe=True gives LEFT-OUTER semantics: probe rows with
    no build match emit one output row whose build side is NULL.

    Returns (probe_idx, build_idx, out_sel, matched, total) — arrays of
    length out_capacity; `matched` flags slots with a real build match;
    `total` is the exact output row count (may exceed out_capacity, in
    which case the caller must recompile bigger).
    """
    p_cap = int(probe_sel.shape[0])
    b_cap = int(build_sel.shape[0])

    pkey = _pack_keys(probe_keys, key_maxes)
    bkey = _pack_keys(build_keys, key_maxes)

    # sort build side by key, unselected rows last via a +inf-like sentinel
    b_sentinel = jnp.asarray(jnp.iinfo(bkey.dtype).max, bkey.dtype)
    bkey_m = jnp.where(build_sel, bkey, b_sentinel)
    b_iota = lax.broadcasted_iota(jnp.int32, (b_cap,), 0)
    bkey_sorted, b_perm = lax.sort([bkey_m, b_iota], num_keys=1)
    n_build = jnp.sum(build_sel.astype(jnp.int32))

    # ranged match per probe row (mask out probe rows not selected)
    start = jnp.searchsorted(bkey_sorted, pkey, side="left").astype(jnp.int32)
    end = jnp.searchsorted(bkey_sorted, pkey, side="right").astype(jnp.int32)
    end = jnp.minimum(end, n_build)  # sentinel rows never match real keys,
    start = jnp.minimum(start, end)  # but guard against key == sentinel
    match_counts = jnp.where(probe_sel, end - start, 0)
    if keep_unmatched_probe:
        counts = jnp.where(probe_sel, jnp.maximum(match_counts, 1), 0)
    else:
        counts = match_counts

    offsets = jnp.cumsum(counts) - counts  # exclusive prefix
    total = jnp.sum(counts)

    out_iota = lax.broadcasted_iota(jnp.int32, (out_capacity,), 0)
    # map each output slot to its probe row: last row whose offset <= k
    probe_idx = (
        jnp.searchsorted(offsets + counts, out_iota, side="right")
    ).astype(jnp.int32)
    probe_idx = jnp.clip(probe_idx, 0, p_cap - 1)
    within = out_iota - jnp.take(offsets, probe_idx)
    matched = within < jnp.take(match_counts, probe_idx)
    build_pos = jnp.take(start, probe_idx) + within
    build_pos = jnp.clip(build_pos, 0, b_cap - 1)
    build_idx = jnp.take(b_perm, build_pos)
    out_sel = out_iota < total
    return probe_idx, build_idx, out_sel, matched, total


def gather_columns(cols: Sequence[ColVal], idx: jax.Array) -> list[ColVal]:
    out = []
    for data, valid in cols:
        data = jnp.broadcast_to(data, (int(jnp.shape(idx)[0]),)) if jnp.ndim(data) == 0 else data
        d = jnp.take(data, idx)
        v = None if valid is None else jnp.take(valid, idx)
        out.append((d, v))
    return out
