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


def _combined_key_ids(
    probe_keys: Sequence[jax.Array], build_keys: Sequence[jax.Array]
) -> tuple[jax.Array, jax.Array]:
    """N-column join keys → ONE dense int32 id per row, equal tuples ⇒
    equal ids: both sides' key columns co-sort in one multi-operand
    `lax.sort`, distinct-tuple boundaries cumsum into ids, and the ids
    ride a second sort (key = source index) back to row order. Removes
    the 2-key bit-packing limit without touching the join machinery
    (ids are always int32-dense regardless of key dtypes/widths)."""
    b_cap = int(build_keys[0].shape[0])
    p_cap = int(probe_keys[0].shape[0])
    comb = b_cap + p_cap
    ops = [jnp.concatenate([b, p]) for b, p in zip(build_keys, probe_keys)]
    nkeys = len(ops)
    src = lax.broadcasted_iota(jnp.int32, (comb,), 0)
    ops.append(src)
    s = lax.sort(ops, num_keys=nkeys)
    iota = lax.broadcasted_iota(jnp.int32, (comb,), 0)
    boundary = iota == 0
    for j in range(nkeys):
        boundary = jnp.logical_or(boundary, s[j] != jnp.roll(s[j], 1))
    ids = jnp.cumsum(boundary.astype(jnp.int32))
    back = lax.sort([s[nkeys], ids], num_keys=1)
    all_ids = back[1]
    return all_ids[b_cap:], all_ids[:b_cap]  # (probe ids, build ids)


def _normalize_keys(
    probe_keys: Sequence[jax.Array],
    build_keys: Sequence[jax.Array],
    key_maxes: Optional[Sequence[Optional[int]]],
) -> tuple[list[jax.Array], list[jax.Array], Optional[Sequence[Optional[int]]]]:
    """Reduce multi-column join keys to one sortable column: bit-packing
    when cheap (1-2 keys with known bounds or 64-bit available, see
    _pack_keys), else dense combined-tuple ids (_combined_key_ids).
    Float keys first map through their order-preserving int image
    (+0.0 added so -0.0 and +0.0 compare equal, as SQL requires)."""
    from datafusion_tpu.ops.aggregate import to_sortable_int

    def as_int(k: jax.Array) -> jax.Array:
        if jnp.issubdtype(k.dtype, jnp.floating):
            return to_sortable_int(k + jnp.zeros((), k.dtype))
        return k

    probe_keys = [as_int(k) for k in probe_keys]
    build_keys = [as_int(k) for k in build_keys]
    if len(probe_keys) == 1:
        return list(probe_keys), list(build_keys), key_maxes
    try:
        return (
            [_pack_keys(probe_keys, key_maxes)],
            [_pack_keys(build_keys, key_maxes)],
            None,
        )
    except NotImplementedError:
        p_id, b_id = _combined_key_ids(probe_keys, build_keys)
        return [p_id], [b_id], None


def _build_matched_from_sorted(
    ks: jax.Array,
    isb: jax.Array,
    srcs: jax.Array,
    boundary: jax.Array,
    p_sentinel: jax.Array,
    b_cap: int,
) -> jax.Array:
    """Per-ORIGINAL-build-row matched flag from the combined-sort layout.

    Mirror of the build-run computation: per position, the count of
    SELECTED probes inside the position's distinct-key run; a build row
    is matched iff its run contains at least one. Scattered back to
    original build order via the carried source indices (builds occupy
    src < b_cap)."""
    comb = int(ks.shape[0])
    is_psel = jnp.logical_and(jnp.logical_not(isb), ks != p_sentinel)
    pincl = jnp.cumsum(is_psel.astype(jnp.int32))
    pprefix = pincl - is_psel.astype(jnp.int32)
    pstart_run = lax.cummax(jnp.where(boundary, pprefix, -1))
    np_ = jnp.where(boundary, pprefix, comb + 1)
    pend_next = jnp.flip(lax.cummin(jnp.flip(jnp.roll(np_, -1).at[-1].set(comb + 1))))
    pend_run = jnp.minimum(pend_next, pincl[-1])
    probes_in_run = jnp.maximum(pend_run - pstart_run, 0)
    bm_sorted = jnp.logical_and(isb, probes_in_run > 0)
    return (
        jnp.zeros((b_cap,), jnp.int8)
        .at[jnp.where(isb, srcs, b_cap)]
        .max(bm_sorted.astype(jnp.int8), mode="drop")
        .astype(jnp.bool_)
    )


def full_merge_tail(
    pcols: Sequence[ColVal],
    bcols: Sequence[ColVal],
    matched: jax.Array,
    total: jax.Array,
    build_cols: Sequence[ColVal],
    un: jax.Array,
    out_capacity: int,
):
    """FULL-OUTER tail merge: append the unmatched build rows (mask `un`,
    original build order, original row order preserved) after the
    LEFT-join head produced by join_columns.

    Validity is folded in here: probe columns are NULL on tail slots,
    build columns get `matched` on head slots and their own original
    validity on tail slots. Returns (pcols', bcols', out_sel', total')
    where total' = head total + tail rows (caller overflow-checks it).
    """
    b_cap = int(un.shape[0])
    iota_b = lax.broadcasted_iota(jnp.int32, (b_cap,), 0)
    # stable compaction of unmatched rows to the front (iota tiebreak)
    ops = [jnp.logical_not(un).astype(jnp.int8), iota_b]
    plan: list[tuple[int, Optional[int]]] = []
    seen: dict[int, int] = {}
    for data, valid in build_cols:
        data = jnp.broadcast_to(data, (b_cap,)) if jnp.ndim(data) == 0 else data
        if id(data) not in seen:
            seen[id(data)] = len(ops)
            ops.append(data)
        di = seen[id(data)]
        vi = None
        if valid is not None:
            if id(valid) not in seen:
                seen[id(valid)] = len(ops)
                ops.append(valid.astype(jnp.int8))
            vi = seen[id(valid)]
        plan.append((di, vi))
    comp = lax.sort(ops, num_keys=2)

    n_un = jnp.sum(un.astype(jnp.int32))
    iota = lax.broadcasted_iota(jnp.int32, (out_capacity,), 0)
    in_head = iota < total
    tail_pos = jnp.clip(iota - total, 0, b_cap - 1)
    out_b: list[ColVal] = []
    for (dh, vh), (di, vi) in zip(bcols, plan):
        dh = jnp.broadcast_to(dh, (out_capacity,)) if jnp.ndim(dh) == 0 else dh
        dt = jnp.take(comp[di], tail_pos)
        d = jnp.where(in_head, dh, dt)
        head_v = matched if vh is None else jnp.logical_and(vh, matched)
        tail_v = (
            jnp.ones((out_capacity,), jnp.bool_)
            if vi is None
            else jnp.take(comp[vi], tail_pos).astype(jnp.bool_)
        )
        out_b.append((d, jnp.where(in_head, head_v, tail_v)))
    out_p: list[ColVal] = [
        (d, in_head if v is None else jnp.logical_and(v, in_head)) for d, v in pcols
    ]
    total_full = total + n_un
    return out_p, out_b, iota < total_full, total_full


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
    want_build_matched: bool = False,
):
    """Compute gather indices realizing an equi-join.

    keep_unmatched_probe=True gives LEFT-OUTER semantics: probe rows with
    no build match emit one output row whose build side is NULL.

    Returns (probe_idx, build_idx, out_sel, matched, total) — arrays of
    length out_capacity; `matched` flags slots with a real build match;
    `total` is the exact output row count (may exceed out_capacity, in
    which case the caller must recompile bigger).

    want_build_matched=True appends a sixth result: a bool array of
    length build-capacity (original build row order) flagging build rows
    with at least one selected probe match — the FULL-OUTER/semi-join
    mark on the build side.
    """
    p_cap = int(probe_sel.shape[0])
    b_cap = int(build_sel.shape[0])

    probe_keys, build_keys, key_maxes = _normalize_keys(
        probe_keys, build_keys, key_maxes
    )
    pkey = probe_keys[0]
    bkey = build_keys[0]

    # sort build side by key, unselected rows last via a +inf-like sentinel
    b_sentinel = jnp.asarray(jnp.iinfo(bkey.dtype).max, bkey.dtype)
    bkey_m = jnp.where(build_sel, bkey, b_sentinel)
    b_iota = lax.broadcasted_iota(jnp.int32, (b_cap,), 0)
    bkey_sorted, b_perm = lax.sort([bkey_m, b_iota], num_keys=1)

    # ---- per-probe match ranges via ONE combined sort -------------------
    # (searchsorted costs ~200ns/elem on TPU — log₂(build) serial gather
    # passes; a combined sort + prefix scans is ~15x cheaper)
    p_sentinel = jnp.asarray(jnp.iinfo(pkey.dtype).max, pkey.dtype)
    pkey_m = jnp.where(probe_sel, pkey, p_sentinel)
    allk = jnp.concatenate([bkey_m, pkey_m])
    isprobe = jnp.concatenate(
        [jnp.zeros(b_cap, jnp.int8), jnp.ones(p_cap, jnp.int8)]
    )
    src = lax.broadcasted_iota(jnp.int32, (b_cap + p_cap,), 0)
    ks, flags, srcs = lax.sort([allk, isprobe, src], num_keys=2)  # builds first on ties
    isb = (flags == 0)
    # bprefix[i] = number of SELECTED builds in positions < i (exclusive)
    bsel_sorted = jnp.logical_and(isb, ks != b_sentinel)
    bincl = jnp.cumsum(bsel_sorted.astype(jnp.int32))
    bprefix = bincl - bsel_sorted.astype(jnp.int32)
    # run boundaries over distinct keys; per-element:
    #   start_of_run = builds with key <  k   (forward cummax at boundaries)
    #   end_of_run   = builds with key <= k   (backward cummin of next-run starts)
    comb = b_cap + p_cap
    iota_all = lax.broadcasted_iota(jnp.int32, (comb,), 0)
    boundary = jnp.logical_or(iota_all == 0, ks != jnp.roll(ks, 1))
    start_run = lax.cummax(jnp.where(boundary, bprefix, -1))
    nb = jnp.where(boundary, bprefix, comb + 1)
    end_run_next = jnp.flip(lax.cummin(jnp.flip(jnp.roll(nb, -1).at[-1].set(comb + 1))))
    end_run = jnp.minimum(end_run_next, bincl[-1])
    build_matched = (
        _build_matched_from_sorted(ks, isb, srcs, boundary, p_sentinel, b_cap)
        if want_build_matched
        else None
    )
    # scatter ranks back to original probe rows
    probe_pos = jnp.clip(srcs - b_cap, 0, p_cap - 1)
    pmask = jnp.logical_not(isb)
    start = (
        jnp.zeros(p_cap, jnp.int32)
        .at[jnp.where(pmask, probe_pos, p_cap)]
        .max(jnp.where(pmask, start_run, 0), mode="drop")
    )
    end = (
        jnp.zeros(p_cap, jnp.int32)
        .at[jnp.where(pmask, probe_pos, p_cap)]
        .max(jnp.where(pmask, end_run, 0), mode="drop")
    )
    start = jnp.minimum(start, end)
    match_counts = jnp.where(probe_sel, end - start, 0)
    if keep_unmatched_probe:
        counts = jnp.where(probe_sel, jnp.maximum(match_counts, 1), 0)
    else:
        counts = match_counts

    offsets = jnp.cumsum(counts) - counts  # exclusive prefix
    total = jnp.sum(counts)

    # ---- expansion: map each output slot to its probe row ---------------
    # scatter each active row's index at its first slot, then cummax
    # forward-fills the run (probe_idx is monotone by construction)
    out_iota = lax.broadcasted_iota(jnp.int32, (out_capacity,), 0)
    p_rows = lax.broadcasted_iota(jnp.int32, (p_cap,), 0)
    active = counts > 0
    scatter_pos = jnp.where(active, offsets, out_capacity)  # OOB → dropped
    probe_idx = lax.cummax(
        jnp.zeros(out_capacity, jnp.int32).at[scatter_pos].max(p_rows, mode="drop")
    )
    offs_slot = lax.cummax(
        jnp.zeros(out_capacity, jnp.int32).at[scatter_pos].max(offsets, mode="drop")
    )
    within = out_iota - offs_slot
    matched = within < jnp.take(match_counts, probe_idx)
    build_pos = jnp.take(start, probe_idx) + within
    build_pos = jnp.clip(build_pos, 0, b_cap - 1)
    build_idx = jnp.take(b_perm, build_pos)
    out_sel = out_iota < total
    if want_build_matched:
        return probe_idx, build_idx, out_sel, matched, total, build_matched
    return probe_idx, build_idx, out_sel, matched, total


def direct_index_join(
    probe_key: jax.Array,
    probe_sel: jax.Array,
    build_key: jax.Array,
    build_sel: jax.Array,
    build_cols: Sequence[ColVal],
    kmin: int,
    domain: int,
    matched_validity: bool = True,
):
    """Dense-build-key join: when the single build key's value domain
    [kmin, kmin+domain) is statically known AND build keys are unique
    (the FK → PK / star-schema case), the join is ONE small scatter over
    the build side plus ONE gather per build output column — no sorts,
    no compaction, probe rows stay in place (output row j IS probe row
    j, masked). ~2x over the compact sort-based strategy at BASELINE c4
    shapes and O(build) instead of O(probe log probe) extra work.

    Duplicate SELECTED build keys violate the unique assumption; their
    count returns as `dups` and the caller treats it as an overflow
    against a 0 budget (recompile retries with the sort-based strategy,
    same mechanism as compact → expand).

    Returns (out_build_cols, matched, dups) where out_build_cols are in
    probe row order and `matched` flags probe rows with a build match.
    """
    b_cap = int(build_sel.shape[0])
    kmin_b = jnp.asarray(kmin, build_key.dtype)
    slot = (build_key - kmin_b).astype(jnp.int32)
    in_dom = jnp.logical_and(slot >= 0, slot < domain)
    bsel = jnp.logical_and(build_sel, in_dom)
    slot = jnp.where(bsel, jnp.clip(slot, 0, domain - 1), domain)  # sentinel bucket

    kmin_p = jnp.asarray(kmin, probe_key.dtype)
    poff = (probe_key - kmin_p).astype(jnp.int32)
    p_in = jnp.logical_and(
        probe_sel, jnp.logical_and(poff >= 0, poff < domain)
    )
    pslot = jnp.where(p_in, jnp.clip(poff, 0, domain - 1), domain)

    # ---- lane-packed domain table: ONE scatter + ONE gather, total -----
    # Lane 0 counts occupancy; every 4-byte build payload (and every
    # validity flag) bitcasts into its own i32 lane of the SAME
    # [domain+1, L] table. The build side scatter-ADDS whole rows (a
    # single contributor leaves its value bit-exact; duplicate slots
    # wrap to garbage, but dups > 0 triggers the sort-strategy fallback
    # anyway), and the probe side gathers whole rows: random access is
    # LATENCY-bound, so the extra lanes ride the same ~7 ns/row pass.
    # Measured at BASELINE c4 scale (100M x 10M, v5e): fused 2-lane
    # gather 693 ms vs 751 ms for the bare 1-lane payload take — and it
    # replaces the occupancy lax.cond, which XLA select-converted inside
    # full query pipelines into an unconditional SECOND probe-scale
    # gather (+676 ms: the r4 c4 cliff, 0.46 of floor).
    # 8-byte dtypes (CPU x64 parity path) split into two i32 lanes.
    lane_cols: list[jax.Array] = [jnp.ones((b_cap,), jnp.int32)]  # count
    plans: list[tuple] = []  # per build col: ("one", lane)/("two", hi, lo)
    vplans: list[Optional[int]] = []
    lane_of: dict[tuple[int, str], object] = {}

    def _lanes_for(arr: jax.Array, key_kind: str):
        ck = (id(arr), key_kind)
        if ck in lane_of:
            return lane_of[ck]
        nb = jnp.dtype(arr.dtype).itemsize
        if nb == 8:
            wide = (
                arr
                if arr.dtype == jnp.int64
                else lax.bitcast_convert_type(arr, jnp.int64)
            )
            hi = (wide >> 32).astype(jnp.int32)
            lo = (wide & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
            plan = ("two", len(lane_cols), len(lane_cols) + 1)
            lane_cols.append(hi)
            lane_cols.append(lo)
        else:
            if arr.dtype == jnp.int32:
                v32 = arr
            elif nb == 4:  # f32 / u32: same-width bit image
                v32 = lax.bitcast_convert_type(arr, jnp.int32)
            else:  # bool / i8 / u8 / i16 / u16: widen by value
                v32 = arr.astype(jnp.int32)
            plan = ("one", len(lane_cols))
            lane_cols.append(v32)
        lane_of[ck] = plan
        return plan

    for data, valid in build_cols:
        data = jnp.broadcast_to(data, (b_cap,)) if jnp.ndim(data) == 0 else data
        plans.append((_lanes_for(data, "d"), data.dtype))
        if valid is None:
            vplans.append(None)
        else:
            # dedupe on the ORIGINAL validity array identity (the i32
            # widening happens inside, keyed by id(valid))
            vp = _lanes_for(valid, "v")
            vplans.append(vp[1])

    # per-lane ELEMENT scatters: .at[slot, k] lowers to a plain element
    # scatter; a row-wise .at[slot].add(mat) lowers with
    # update_window_dims and costs ~+500 ms at 10M build rows on v5e
    # (measured: row-add 1196 ms vs per-lane set 691 ms end-to-end).
    # Payload lanes SET (duplicate slots keep one value — garbage is
    # fine, dups > 0 recompiles to the sort strategy); the count lane
    # ADDs to detect those duplicates.
    L = len(lane_cols)
    table = jnp.zeros((domain + 1, L), jnp.int32)
    table = table.at[slot, 0].add(lane_cols[0], mode="drop")
    for k in range(1, L):
        table = table.at[slot, k].set(lane_cols[k], mode="drop")
    cnt_dom = lax.slice(table, (0, 0), (domain, 1)).reshape(domain)
    dups = jnp.sum((cnt_dom > 1).astype(jnp.int32))

    g = jnp.take(table, pslot, axis=0)  # [p_cap, L] — the ONE random pass
    matched = jnp.logical_and(p_in, g[:, 0] > 0)

    def _decode(plan, dtype):
        if plan[0] == "one":
            v32 = g[:, plan[1]]
            if dtype == jnp.int32:
                return v32
            if jnp.dtype(dtype).itemsize == 4:  # f32 / u32 bit image
                return lax.bitcast_convert_type(v32, dtype)
            return v32.astype(dtype)  # widened-by-value narrow types
        hi, lo = g[:, plan[1]], g[:, plan[2]]
        wide = (hi.astype(jnp.int64) << 32) | (
            lo.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
        )
        if dtype == jnp.int64:
            return wide
        return lax.bitcast_convert_type(wide, dtype)  # f64 / u64

    # matched_validity=False (INNER joins): the caller's selection mask
    # already carries `matched` (out_sel = probe_sel ∧ matched), so
    # attaching it per-column would be redundant — and expensive: a
    # downstream GROUP BY treats the column as NULLABLE and pays extra
    # i8 sort operands + per-mask count slots for a mask that is all-
    # true on selected rows (measured: 4-op vs 2-op aggregate co-sort
    # on the c5 post-join MAX, PERFLOG r3). LEFT/FULL joins keep it:
    # unmatched probe rows really are NULL on the build side.
    out_build: list[ColVal] = []
    for (plan, dtype), vlane in zip(plans, vplans):
        d = _decode(plan, dtype)
        if vlane is None:
            v = matched if matched_validity else None
        else:
            v = g[:, vlane] != 0
            if matched_validity:
                v = jnp.logical_and(v, matched)
        out_build.append((d, v))
    return out_build, matched, dups


def gather_columns(cols: Sequence[ColVal], idx: jax.Array) -> list[ColVal]:
    out = []
    for data, valid in cols:
        data = jnp.broadcast_to(data, (int(jnp.shape(idx)[0]),)) if jnp.ndim(data) == 0 else data
        d = jnp.take(data, idx)
        v = None if valid is None else jnp.take(valid, idx)
        out.append((d, v))
    return out


def _dup_count(match_counts: jax.Array) -> jax.Array:
    """Number of probe rows with >1 build match — the runtime signal that
    the compact strategy's one-row-per-probe assumption is violated."""
    return jnp.sum((match_counts > 1).astype(jnp.int32))


def join_columns(
    probe_keys: Sequence[jax.Array],
    probe_sel: jax.Array,
    probe_cols: Sequence[ColVal],
    build_keys: Sequence[jax.Array],
    build_sel: jax.Array,
    build_cols: Sequence[ColVal],
    out_capacity: int,
    *,
    keep_unmatched_probe: bool = False,
    key_maxes: Optional[Sequence[Optional[int]]] = None,
    strategy: str = "compact",
    want_build_matched: bool = False,
):
    """Materialize an equi-join's output columns.

    Returns (out_probe_cols, out_build_cols, build_matched, out_sel,
    total, dups) — plus, when want_build_matched=True, a seventh result:
    the per-ORIGINAL-build-row matched flag (FULL-OUTER/semi-join mark;
    see join_indices):
      total — exact output row count (> out_capacity ⇒ caller recompiles
              with a larger capacity)
      dups  — probe rows with more than one build match. The "compact"
              strategy is only correct when dups == 0 (one output row per
              probe, the FK/star-schema case); the caller treats dups as a
              capacity-slot overflow against a 0 budget and recompiles
              with strategy="expand".

    Why two strategies: on TPU a random gather costs ~7 ns/elem but a
    lax.sort payload operand ~0.7 ns/elem (PERFLOG.md). The general
    expand path pays scatter+gather per output column; the compact path
    rides every probe column through the two sorts as payload operands
    and never materializes gather indices, ~6x faster end-to-end.
    """
    if strategy == "expand":
        res = join_indices(
            probe_keys, probe_sel, build_keys, build_sel, out_capacity,
            keep_unmatched_probe=keep_unmatched_probe, key_maxes=key_maxes,
            want_build_matched=want_build_matched,
        )
        p_idx, b_idx, out_sel, matched, total = res[:5]
        # dup count from the output layout: a probe with k matches fills k
        # consecutive slots, so count probes owning adjacent equal slots
        adj = jnp.logical_and(
            p_idx == jnp.roll(p_idx, 1),
            jnp.logical_and(out_sel, jnp.roll(out_sel, 1)),
        )
        iota = lax.broadcasted_iota(jnp.int32, (out_capacity,), 0)
        adj = jnp.logical_and(adj, iota > 0)
        # count distinct probes with an adjacent duplicate slot
        first_dup = jnp.logical_and(
            adj, jnp.logical_or(iota == 1, p_idx != jnp.roll(p_idx, 2))
        )
        dups = jnp.sum(first_dup.astype(jnp.int32))
        pcols = gather_columns(probe_cols, p_idx)
        bcols = gather_columns(build_cols, b_idx)
        if want_build_matched:
            return pcols, bcols, matched, out_sel, total, dups, res[5]
        return pcols, bcols, matched, out_sel, total, dups

    if strategy != "compact":
        raise ValueError(f"unknown join strategy {strategy!r}")

    p_cap = int(probe_sel.shape[0])
    b_cap = int(build_sel.shape[0])
    comb = b_cap + p_cap

    probe_keys, build_keys, key_maxes = _normalize_keys(
        probe_keys, build_keys, key_maxes
    )
    pkey = probe_keys[0]
    bkey = build_keys[0]
    b_sentinel = jnp.asarray(jnp.iinfo(bkey.dtype).max, bkey.dtype)
    p_sentinel = jnp.asarray(jnp.iinfo(pkey.dtype).max, pkey.dtype)
    bkey_m = jnp.where(build_sel, bkey, b_sentinel)
    pkey_m = jnp.where(probe_sel, pkey, p_sentinel)

    # ---- combined sort carries the probe AND build columns as payloads --
    allk = jnp.concatenate([bkey_m, pkey_m])
    isprobe = jnp.concatenate([jnp.zeros(b_cap, jnp.int8), jnp.ones(p_cap, jnp.int8)])
    src = lax.broadcasted_iota(jnp.int32, (comb,), 0)
    c_ops = [allk, isprobe, src]
    c_plan: list[tuple[int, Optional[int]]] = []
    seen = {}
    for data, valid in probe_cols:
        data = jnp.broadcast_to(data, (p_cap,)) if jnp.ndim(data) == 0 else data
        if id(data) not in seen:
            seen[id(data)] = len(c_ops)
            pad = jnp.zeros((b_cap,), data.dtype)
            c_ops.append(jnp.concatenate([pad, data]))
        di = seen[id(data)]
        vi = None
        if valid is not None:
            if id(valid) not in seen:
                seen[id(valid)] = len(c_ops)
                c_ops.append(
                    jnp.concatenate([jnp.zeros((b_cap,), jnp.int8), valid.astype(jnp.int8)])
                )
            vi = seen[id(valid)]
        c_plan.append((di, vi))
    # build columns ride too (padded on the probe side): their values
    # then COPY-FORWARD to the probe rows in sorted order — a log-shift
    # propagation at ~0.6 ns/elem instead of a 7-9 ns/elem random gather
    # from a separately sorted build table (measured 289 → 21 ms at
    # 33.5M rows on v5e)
    b_plan: list[tuple[int, Optional[int]]] = []
    bseen: dict[int, int] = {}
    for data, valid in build_cols:
        data = jnp.broadcast_to(data, (b_cap,)) if jnp.ndim(data) == 0 else data
        if id(data) not in bseen:
            bseen[id(data)] = len(c_ops)
            c_ops.append(
                jnp.concatenate([data, jnp.zeros((p_cap,), data.dtype)])
            )
        di = bseen[id(data)]
        vi = None
        if valid is not None:
            if id(valid) not in bseen:
                bseen[id(valid)] = len(c_ops)
                c_ops.append(
                    jnp.concatenate(
                        [valid.astype(jnp.int8), jnp.zeros((p_cap,), jnp.int8)]
                    )
                )
            vi = bseen[id(valid)]
        b_plan.append((di, vi))
    c_sorted = lax.sort(c_ops, num_keys=2)  # builds first on key ties
    ks, flags = c_sorted[0], c_sorted[1]

    # ---- per-position match run [start_run, end_run) over sorted builds -
    isb = flags == 0
    bsel_sorted = jnp.logical_and(isb, ks != b_sentinel)
    bincl = jnp.cumsum(bsel_sorted.astype(jnp.int32))
    bprefix = bincl - bsel_sorted.astype(jnp.int32)
    iota_all = lax.broadcasted_iota(jnp.int32, (comb,), 0)
    boundary = jnp.logical_or(iota_all == 0, ks != jnp.roll(ks, 1))
    start_run = lax.cummax(jnp.where(boundary, bprefix, -1))
    nb = jnp.where(boundary, bprefix, comb + 1)
    end_run_next = jnp.flip(lax.cummin(jnp.flip(jnp.roll(nb, -1).at[-1].set(comb + 1))))
    end_run = jnp.minimum(end_run_next, bincl[-1])
    start_run = jnp.minimum(start_run, end_run)

    is_psel = jnp.logical_and(jnp.logical_not(isb), ks != p_sentinel)
    count_run = end_run - start_run
    matched = jnp.logical_and(is_psel, count_run > 0)
    dups = jnp.sum(jnp.logical_and(is_psel, count_run > 1).astype(jnp.int32))
    keep = jnp.logical_and(is_psel, matched) if not keep_unmatched_probe else is_psel
    total = jnp.sum(keep.astype(jnp.int32))

    # ---- propagate each kept probe's single build row --------------------
    # copy-forward: builds sort BEFORE probes on key ties, and the
    # compact strategy guarantees at most one selected build per key run
    # (dup fallback otherwise), so the latest build value at-or-before a
    # matched probe IS its match. Unmatched probes receive a stale value
    # from an earlier run — masked by `matched` (dropped or NULL-extended).
    def _copy_forward(values: list) -> list:
        vs = list(values)
        h = bsel_sorted
        shift = 1
        while shift < comb:
            pvs = [
                jnp.concatenate(
                    [jnp.zeros((shift,), v.dtype), lax.slice(v, (0,), (comb - shift,))]
                )
                for v in vs
            ]
            ph = jnp.concatenate(
                [
                    jnp.zeros((shift,), jnp.bool_),
                    lax.slice(h, (0,), (comb - shift,)),
                ]
            )
            vs = [jnp.where(h, v, pv) for v, pv in zip(vs, pvs)]
            h = jnp.logical_or(h, ph)
            shift *= 2
        return vs

    uniq_slots: list[int] = []
    for di, vi in b_plan:
        for slot in (di, vi):
            if slot is not None and slot not in uniq_slots:
                uniq_slots.append(slot)
    propagated = dict(
        zip(uniq_slots, _copy_forward([c_sorted[sl] for sl in uniq_slots]))
    )
    fetched: list[ColVal] = []
    for di, vi in b_plan:
        d = propagated[di]
        v = None if vi is None else propagated[vi].astype(jnp.bool_)
        fetched.append((d, v))

    # ---- compaction sort: kept rows to the front, original probe order --
    k_ops = [jnp.logical_not(keep).astype(jnp.int8), c_sorted[2]]
    probe_slot: dict[int, int] = {}
    for di, vi in c_plan:
        for idx in (di, vi):
            if idx is not None and idx not in probe_slot:
                probe_slot[idx] = len(k_ops)
                k_ops.append(c_sorted[idx])
    build_slot: list[tuple[int, Optional[int]]] = []
    seen = {}
    for j, (d, v) in enumerate(fetched):
        if id(d) not in seen:
            seen[id(d)] = len(k_ops)
            k_ops.append(d)
        di = seen[id(d)]
        vi = None
        if v is not None:
            if id(v) not in seen:
                seen[id(v)] = len(k_ops)
                k_ops.append(v.astype(jnp.int8))
            vi = seen[id(v)]
        build_slot.append((di, vi))
    matched_slot = len(k_ops)
    k_ops.append(matched.astype(jnp.int8))
    compacted = lax.sort(k_ops, num_keys=2)

    def _fit(a: jax.Array) -> jax.Array:
        if comb >= out_capacity:
            return lax.slice(a, (0,), (out_capacity,))
        return jnp.pad(a, (0, out_capacity - comb))

    out_pcols: list[ColVal] = []
    for di, vi in c_plan:
        d = _fit(compacted[probe_slot[di]])
        v = None if vi is None else _fit(compacted[probe_slot[vi]]).astype(jnp.bool_)
        out_pcols.append((d, v))
    out_bcols: list[ColVal] = []
    for di, vi in build_slot:
        d = _fit(compacted[di])
        v = None if vi is None else _fit(compacted[vi]).astype(jnp.bool_)
        out_bcols.append((d, v))
    out_matched = _fit(compacted[matched_slot]).astype(jnp.bool_)
    out_iota = lax.broadcasted_iota(jnp.int32, (out_capacity,), 0)
    out_sel = out_iota < total
    if want_build_matched:
        bm = _build_matched_from_sorted(
            ks, isb, c_sorted[2], boundary, p_sentinel, b_cap
        )
        return out_pcols, out_bcols, out_matched, out_sel, total, dups, bm
    return out_pcols, out_bcols, out_matched, out_sel, total, dups
