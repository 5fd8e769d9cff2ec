"""Physical compiler: LogicalPlan → one jit-compiled XLA pipeline.

This replaces the reference's plan-to-operator-tree construction and
pull-based Relation::next() loop (reference: src/execution/context.rs:
104-196, relation.rs:27-32). Instead of an interpreted iterator per
operator, the whole plan lowers to a single traced function over the
input tables' device columns; XLA fuses scan→filter→project chains into
one kernel and the sort/aggregate/join operators are vectorized
primitives (ops/).

Selection is a mask, not a row copy (the reference gathers every column
per batch through builders, filter.rs:79-110); compaction happens only at
sort boundaries and at host materialization.

A note on projection push-down: the reference's only optimizer rewrites
TableScan.projection to avoid reading unused CSV columns
(sqlplanner.rs:460-539, disabled at context.rs:89). In this architecture
tables are already device-resident and jit inputs are zero-copy, so
unused columns are dead-code-eliminated by XLA for free — the rewrite is
unnecessary on the hot path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from datafusion_tpu.columnar.table import PAD_UNIT, Table, round_up
from datafusion_tpu.errors import ExecutionError, NotImplementedError_
from datafusion_tpu.ops import aggregate as agg_ops
from datafusion_tpu.ops import join as join_ops
from datafusion_tpu.ops import sort as sort_ops
from datafusion_tpu.ops.expr_eval import ColVal, CompiledExpr, compile_expr
from datafusion_tpu.plan import logical as L
from datafusion_tpu.schema import Schema
from datafusion_tpu.types import DataType


@dataclass
class Batch:
    """Traced intermediate: columns + selection mask (one static capacity
    per plan node)."""

    cols: list[ColVal]
    sel: jax.Array

    @property
    def capacity(self) -> int:
        return int(self.sel.shape[0])


@dataclass
class Lowered:
    """A lowered plan node: static metadata + traced stage function."""

    schema: Schema
    dicts: list[Optional[tuple[str, ...]]]
    fn: Callable[[list[list[ColVal]]], Batch]
    capacity: int
    # data placement under distributed execution: "single" (one chip),
    # "partitioned" (row-sharded over the mesh axis), "replicated"
    layout: str = "single"
    # per output column: (scan_slot, column_index) when the column is a
    # pure pass-through of a scanned column (only row masks applied, no
    # reordering). Pass-through columns are elided from the jit outputs —
    # projection of an existing column is metadata, not data movement —
    # and materialized from the original table buffers. None = computed.
    sources: Optional[list[Optional[tuple[int, int]]]] = None
    # per output column: a static (lo, hi) bound on the column's values,
    # tighter than (or independent of) the scanned buffer's min/max.
    # Set by the direct-index INNER join on its key columns (output keys
    # are a subset of the build domain) so the dense/packed GROUP BY
    # probe sees the post-join key domain, not the scan's (VERDICT r2
    # next #1a). None = no static bound known.
    bounds: Optional[list[Optional[tuple[int, int]]]] = None

    def src(self) -> list[Optional[tuple[int, int]]]:
        return self.sources if self.sources is not None else [None] * len(self.schema)

    def bnd(self) -> list[Optional[tuple[int, int]]]:
        return self.bounds if self.bounds is not None else [None] * len(self.schema)


@dataclass
class HostCall:
    """A host-stage function call in the output projection: `fn` runs on
    the materialized result columns (ops/functions.py). Args are either
    nested HostCalls or integer indices of device columns in the inner
    (split) projection."""

    fn: Callable
    args: list  # HostCall | int


@dataclass
class CompiledQuery:
    schema: Schema
    dicts: list[Optional[tuple[str, ...]]]
    _jitted: Callable
    _scan_tables: list[Table]
    _caps: list[int]  # static output capacities (join outputs, group slots)
    _recompile: Callable  # (caps) -> CompiledQuery
    # per output column: (scan_slot, col_idx) for pass-through columns
    # (elided from the jit outputs; materialized straight from the table
    # buffers), or None for computed columns
    _sources: Optional[list[Optional[tuple[int, int]]]] = None
    # slot index -> custom growth fn(total) -> new cap (default: round_up)
    _grows: Optional[dict[int, Callable[[int], int]]] = None
    # host-stage projection: (final_schema, per-output-column entry where
    # each entry is ("dev", inner_col) or ("host", HostCall, DataType))
    _host_post: Optional[tuple] = None
    # after an overflow retry: the grown CompiledQuery that actually ran
    # (the session cache replaces this entry with it, so the next
    # execution skips the small pipeline + recompile entirely)
    _final: Optional["CompiledQuery"] = None
    # per scan slot: table column indices the pipeline reads. Unused
    # columns ship as (None, None) env entries — never touched by the
    # trace, never transferred, and (for lazy file-backed tables) never
    # parsed. None = ship everything (legacy callers).
    _used_cols: Optional[list[set]] = None

    def run(self):
        """Execute; on capacity overflow (join matches or group count
        exceeding the compiled static size), recompile larger and retry.
        Slots with a custom growth policy (see PlanCompiler._alloc_cap)
        grow through it instead of the row-count round-up."""
        from datafusion_tpu.exec.result import ResultTable
        from datafusion_tpu.parallel.multihost import to_host

        env = []
        for slot, t in enumerate(self._scan_tables):
            used = (
                None
                if self._used_cols is None or slot >= len(self._used_cols)
                else self._used_cols[slot]
            )
            env.append(
                [
                    (c.data, c.validity) if used is None or i in used else (None, None)
                    for i, c in enumerate(t.columns)
                ]
            )
        datas, valids, sel, totals = self._jitted(env)
        totals = [int(to_host(t)) for t in totals] if totals else []
        grows = self._grows or {}
        overflow = False
        bigger = list(self._caps)
        for i, tot in enumerate(totals):
            if tot > self._caps[i]:
                overflow = True
                bigger[i] = grows[i](tot) if i in grows else round_up(tot)
        if overflow:
            grown = self._recompile(bigger)
            out = grown.run()
            self._final = grown._final or grown
            return out
        sel_np = to_host(sel)
        idx = np.nonzero(sel_np)[0]
        sources = self._sources or [None] * len(self.schema)
        host_cols = []
        for j, (d, v) in enumerate(zip(datas, valids)):
            if d is None:  # pass-through: read the original table buffer
                slot, ci = sources[j]
                col = self._scan_tables[slot].columns[ci]
                d, v = col.data, col.validity
            dd = to_host(d)[idx]
            vv = None if v is None else to_host(v)[idx]
            host_cols.append((dd, vv))
        inner = ResultTable(self.schema, host_cols, self.dicts)
        if self._host_post is None:
            return inner
        return apply_host_post(inner, self._host_post)


# ---------------------------------------------------------------------------
# Host-stage projection split (ops/functions.py HostFunction)
# ---------------------------------------------------------------------------


def _expr_children(e: L.Expr) -> tuple:
    if isinstance(e, (L.Alias, L.Cast, L.IsNull, L.IsNotNull, L.SortExpr)):
        return (e.expr,)
    if isinstance(e, L.BinaryExpr):
        return (e.left, e.right)
    if isinstance(e, (L.ScalarFunction, L.AggregateFunction)):
        return tuple(e.args)
    if isinstance(e, L.Case):
        kids = [x for b in e.branches for x in b]
        if e.else_expr is not None:
            kids.append(e.else_expr)
        return tuple(kids)
    return ()


def split_host_projection(plan: L.LogicalPlan, fn_registry: dict):
    """If the top-level projection calls host-stage functions
    (ops/functions.py HostFunction — text/struct producers that cannot run
    on device), split it: the returned plan computes the functions'
    device arguments as ordinary projection columns; the returned
    host_post descriptor re-assembles the final columns on host at
    materialization (apply_host_post). Returns (plan, None) when nothing
    to split."""
    from datafusion_tpu.ops.functions import HostFunction

    def is_host_call(e) -> bool:
        return isinstance(e, L.ScalarFunction) and isinstance(
            fn_registry.get(e.name.lower()), HostFunction
        )

    def is_host_cast(e, schema) -> bool:
        # CAST(<non-string> AS VARCHAR): device computes the argument,
        # host renders the decimal/date text (ops/functions.py
        # CastRenderHost). Utf8→Utf8 and NULL casts stay on device
        # (dictionary LUT / one-entry-dict paths in expr_eval).
        if not (isinstance(e, L.Cast) and e.data_type is DataType.Utf8):
            return False
        try:
            st = e.expr.get_type(schema)
        except Exception:
            return False
        return st not in (DataType.Utf8, DataType.Null)

    def contains_host(e, schema=None) -> bool:
        if is_host_call(e):
            return True
        if schema is not None and is_host_cast(e, schema):
            return True
        return any(contains_host(c, schema) for c in _expr_children(e))

    # push the split through Limit/Sort wrappers: the host stage runs
    # after materialization, which preserves the row set and order those
    # operators produced. Sort keys reference projection outputs by index
    # and are remapped below.
    if isinstance(plan, L.Limit):
        inner, post = split_host_projection(plan.input, fn_registry)
        if post is None:
            return plan, None
        return L.Limit(plan.limit, inner, inner.schema, plan.offset), post
    if isinstance(plan, L.Sort):
        inner, post = split_host_projection(plan.input, fn_registry)
        if post is None:
            return plan, None
        _, outmap = post

        def remap(e: L.Expr) -> L.Expr:
            if isinstance(e, L.Column):
                entry = outmap[e.index]
                if entry[0] != "dev":
                    raise NotImplementedError_(
                        "cannot ORDER BY a host function result"
                    )
                return L.Column(entry[1])
            if isinstance(e, L.SortExpr):
                return L.SortExpr(remap(e.expr), e.asc, e.nulls_first)
            if isinstance(e, L.Alias):
                return L.Alias(remap(e.expr), e.name)
            if isinstance(e, L.Cast):
                return L.Cast(remap(e.expr), e.data_type)
            if isinstance(e, L.IsNull):
                return L.IsNull(remap(e.expr))
            if isinstance(e, L.IsNotNull):
                return L.IsNotNull(remap(e.expr))
            if isinstance(e, L.BinaryExpr):
                return L.BinaryExpr(remap(e.left), e.op, remap(e.right))
            if isinstance(e, L.ScalarFunction):
                return L.ScalarFunction(
                    e.name, tuple(remap(a) for a in e.args), e.return_type
                )
            if isinstance(e, L.Case):
                return L.Case(
                    tuple((remap(c), remap(r)) for c, r in e.branches),
                    None if e.else_expr is None else remap(e.else_expr),
                )
            return e

        keys = tuple(remap(se) for se in plan.exprs)
        return L.Sort(keys, inner, inner.schema), post

    if not isinstance(plan, L.Projection):
        return plan, None
    from datafusion_tpu.plan.optimizer import out_schema

    ischema = out_schema(plan.input)
    if not any(contains_host(e, ischema) for e in plan.exprs):
        return plan, None

    device_exprs: list[L.Expr] = []

    def decompose(e) -> HostCall:
        if isinstance(e, L.Cast):
            from datafusion_tpu.ops.functions import CastRenderHost

            a_ = e.expr.expr if isinstance(e.expr, L.Alias) else e.expr
            if contains_host(a_, ischema):
                raise NotImplementedError_(
                    "CAST AS VARCHAR of a host function result is not supported"
                )
            idx = len(device_exprs)
            device_exprs.append(a_)
            return HostCall(CastRenderHost(a_.get_type(ischema)), [idx])
        fn = fn_registry[e.name.lower()]
        args = []
        for a in e.args:
            a_ = a.expr if isinstance(a, L.Alias) else a
            if contains_host(a_, ischema):
                if not is_host_call(a_):
                    raise NotImplementedError_(
                        "a host function result can only feed another host "
                        "function, not a device expression"
                    )
                args.append(decompose(a_))
            else:
                args.append(len(device_exprs))
                device_exprs.append(a_)
        return HostCall(fn, args)

    outmap: list[tuple] = []
    for e in plan.exprs:
        if contains_host(e, ischema):
            stripped = e.expr if isinstance(e, L.Alias) else e
            if not (is_host_call(stripped) or is_host_cast(stripped, ischema)):
                raise NotImplementedError_(
                    "host functions must be the outermost call of a SELECT item"
                )
            outmap.append(("host", decompose(stripped)))
        else:
            outmap.append(("dev", len(device_exprs)))
            device_exprs.append(e)
    inner_schema = Schema(L.exprlist_to_fields(device_exprs, plan.input.schema))
    inner = L.Projection(tuple(device_exprs), plan.input, inner_schema)
    return inner, (plan.schema, outmap)


def apply_host_post(inner, host_post):
    """Evaluate the host-stage calls over the materialized inner result
    and assemble the final ResultTable."""
    from datafusion_tpu.exec.result import ResultTable

    final_schema, outmap = host_post

    def decoded(j):
        data, valid = inner.cols[j]
        dt = inner.schema.field(j).dtype
        if dt is DataType.Utf8 and inner.dicts[j] is not None:
            vocab = np.asarray(inner.dicts[j], dtype=object)
            data = vocab[np.clip(data, 0, max(len(vocab) - 1, 0))]
        return data, valid

    def eval_call(call):
        arrs, valid = [], None
        for a in call.args:
            d, v = eval_call(a) if isinstance(a, HostCall) else decoded(a)
            arrs.append(d)
            if v is not None:
                valid = v if valid is None else np.logical_and(valid, v)
        return call.fn(*arrs), valid

    cols, dicts = [], []
    for entry, fld in zip(outmap, final_schema.fields):
        if entry[0] == "dev":
            j = entry[1]
            cols.append(inner.cols[j])
            dicts.append(inner.dicts[j])
        else:
            data, valid = eval_call(entry[1])
            if fld.dtype.is_numeric or fld.dtype is DataType.Boolean:
                data = np.asarray(data, dtype=fld.dtype.to_np())
            cols.append((data, valid))
            dicts.append(None)  # host Utf8 stays a raw object column
    return ResultTable(final_schema, cols, dicts)


def _broadcast_col(cv: ColVal, capacity: int) -> ColVal:
    d, v = cv
    if jnp.ndim(d) == 0:
        d = jnp.broadcast_to(d, (capacity,))
    if v is not None and jnp.ndim(v) == 0:
        v = jnp.broadcast_to(v, (capacity,))
    return d, v


def _signed_rank(key: jax.Array) -> Optional[jax.Array]:
    """Order-preserving map of a sort key to a signed int rank."""
    dt = key.dtype
    if dt == jnp.bool_ or dt in (jnp.int8, jnp.int16, jnp.uint8, jnp.uint16):
        return key.astype(jnp.int32)
    if dt in (jnp.int32, jnp.int64):
        return key
    if dt == jnp.uint32:
        return lax.bitcast_convert_type(key ^ jnp.uint32(1 << 31), jnp.int32)
    if dt == jnp.uint64:
        if not jax.config.jax_enable_x64:
            return None
        return lax.bitcast_convert_type(key ^ jnp.uint64(1 << 63), jnp.int64)
    return None


def topk_rank(kd: jax.Array, kv, sel: jax.Array, asc: bool) -> jax.Array:
    """Signed rank where the top-k LARGEST ranks are the LIMIT result.

    Rank tiers (lax.top_k breaks ties by lowest index = original row
    order): real keys >= min+2 > NULL keys (min+1) > unselected rows
    (min). The low clamp can merge the two most-extreme key values — only
    observable when both land in the result's very tail."""
    from datafusion_tpu.ops.aggregate import to_sortable_int

    rank = _signed_rank(to_sortable_int(kd))
    assert rank is not None  # dtype support is checked at lower time
    info = jnp.iinfo(rank.dtype)
    # top_k returns LARGEST first; ascending wants smallest first —
    # bitwise-not reverses signed-int order exactly
    rank = jnp.invert(rank) if asc else rank
    rank = jnp.maximum(rank, info.min + 2)
    if kv is not None:
        rank = jnp.where(kv, rank, info.min + 1)  # NULLs last
    return jnp.where(sel, rank, info.min)


class PlanCompiler:
    # default static number of group slots for GROUP BY outputs; grown
    # automatically (with a recompile) when a query produces more groups
    DEFAULT_GROUP_CAPACITY = 64 * 1024

    def __init__(self, tables: dict[str, Table], fn_registry=None, caps=None):
        self.tables = tables
        self.fn_registry = fn_registry or {}
        self.scan_tables: list[Table] = []
        self.scan_used: list[set] = []  # per scan slot: table col indices
        # the compiled pipeline reads (lazy sources parse only these;
        # CompiledQuery.run ships only these as jit inputs)
        self.caps_in = list(caps) if caps else []
        self.caps: list[int] = []
        self.totals: list = []  # traced counts, parallel to caps
        self.grows: dict[int, Callable[[int], int]] = {}
        self.notes: list[str] = []  # physical choices, for EXPLAIN VERBOSE
        # decline diagnostics survive speculative rollbacks (a
        # speculative path that returns None rolls self.notes back, but
        # WHY it declined is exactly what EXPLAIN should still show)
        self.sticky_notes: list[str] = []
        self._finite_cache: dict[int, bool] = {}  # id(col buffer) -> all-finite

    def note_decline(self, msg: str) -> None:
        if msg not in self.sticky_notes:
            self.sticky_notes.append(msg)

    def _speculative(self, attempt):
        """Run a lowering attempt that may return None; on None, roll back
        every side effect (capacity slots, growth policies, notes, scan
        slots) so the fallback path re-allocates from a clean state —
        otherwise the caps list and the traced totals misalign and the
        overflow retry grows the wrong slot."""
        marks = (len(self.caps), len(self.notes), len(self.scan_tables))
        res = attempt()
        if res is None:
            del self.caps[marks[0]:]
            for k in [k for k in self.grows if k >= marks[0]]:
                del self.grows[k]
            del self.notes[marks[1]:]
            del self.scan_tables[marks[2]:]
            del self.scan_used[marks[2]:]
        return res

    def _alloc_cap(self, default: int, grow=None) -> int:
        """Allocate a static-capacity slot (join output / group count),
        honoring overrides from an overflow-retry recompile. `grow`
        overrides how the slot expands on overflow (default: round_up of
        the reported total — right for row counts, wrong for small
        factors like the shuffle salt)."""
        slot = len(self.caps)
        cap = self.caps_in[slot] if slot < len(self.caps_in) else default
        self.caps.append(cap)
        if grow is not None:
            self.grows[slot] = grow
        return cap

    # ------------------------------------------------------------------
    def lower(self, plan: L.LogicalPlan) -> Lowered:
        if isinstance(plan, L.TableScan):
            return self._lower_scan(plan)
        if isinstance(plan, L.Selection):
            return self._lower_selection(plan)
        if isinstance(plan, L.Projection):
            return self._lower_projection(plan)
        if isinstance(plan, L.Aggregate):
            return self._lower_aggregate(plan)
        if isinstance(plan, L.Sort):
            return self._lower_sort(plan)
        if isinstance(plan, L.Limit):
            return self._lower_limit(plan)
        if isinstance(plan, L.Join):
            return self._lower_join(plan)
        if isinstance(plan, L.EmptyRelation):
            return self._lower_empty(plan)
        if isinstance(plan, L.Union):
            return self._lower_union(plan)
        if isinstance(plan, L.Window):
            return self._lower_window(plan)
        raise NotImplementedError_(f"cannot lower plan node {type(plan).__name__}")

    def _lower_window(self, plan: L.Window) -> Lowered:
        return self._window_over(plan, self.lower(plan.input))

    def _window_over(self, plan: L.Window, child: Lowered) -> Lowered:
        """Append one column per window expression (ops/window.py): one
        co-sort per distinct (PARTITION BY, ORDER BY) spec, shared by all
        functions using it."""
        from datafusion_tpu.ops import window as window_ops

        def cexpr(e):
            return compile_expr(e, child.schema, child.dicts, self.fn_registry)

        specs: list[dict] = []
        spec_index: dict = {}
        metas: list[tuple[int, int]] = []  # per window expr: (spec, call)
        for wf in plan.window_exprs:
            skey = (
                wf.partition_by,
                tuple((o.expr, o.asc, o.nulls_first) for o in wf.order_by),
            )
            if skey not in spec_index:
                spec_index[skey] = len(specs)
                specs.append(
                    {
                        "part": [cexpr(e) for e in wf.partition_by],
                        "order": [
                            (cexpr(o.expr), o.asc, o.nulls_first is True)
                            for o in wf.order_by
                        ],
                        "calls": [],
                    }
                )
            si = spec_index[skey]
            arg_c = cexpr(wf.args[0]) if wf.args else None
            specs[si]["calls"].append((wf, arg_c))
            metas.append((si, len(specs[si]["calls"]) - 1))

        out_dicts = list(child.dicts)
        for wf, (si, ci) in zip(plan.window_exprs, metas):
            arg_c = specs[si]["calls"][ci][1]
            out_dicts.append(
                arg_c.dictionary
                if (wf.return_type is DataType.Utf8 and arg_c is not None)
                else None
            )
        self.notes.append(
            f"window: {len(plan.window_exprs)} function(s) over "
            f"{len(specs)} spec sort(s)"
        )

        def fn(env) -> Batch:
            b = child.fn(env)
            results: list[list] = []
            for spec in specs:
                part_vals = [c.fn(b.cols) for c in spec["part"]]
                order_vals = [
                    (c.fn(b.cols), asc, nf) for c, asc, nf in spec["order"]
                ]
                calls = [
                    window_ops.WindowCall(
                        wf.name,
                        None if arg_c is None else arg_c.fn(b.cols),
                        wf.offset,
                        wf.frame,
                    )
                    for wf, arg_c in spec["calls"]
                ]
                results.append(
                    window_ops.window_spec(part_vals, order_vals, calls, b.sel)
                )
            new_cols = list(b.cols) + [results[si][ci] for si, ci in metas]
            return Batch(new_cols, b.sel)

        return Lowered(plan.schema, out_dicts, fn, child.capacity, child.layout)

    # ------------------------------------------------------------------
    def _lower_union(self, plan: L.Union) -> Lowered:
        """UNION ALL: concatenate the children's columns and selection
        masks (output capacity = sum of child capacities). String columns
        with differing dictionaries remap into the merged vocabulary."""
        children = [self.lower(c) for c in plan.inputs]
        layouts = {c.layout for c in children}
        if len(layouts) != 1:
            raise NotImplementedError_(
                "UNION of differently-distributed inputs is not supported"
            )
        cap = sum(c.capacity for c in children)
        ncols = len(plan.schema)
        out_dicts: list[Optional[tuple[str, ...]]] = []
        remaps: list[list[Optional[jax.Array]]] = []  # [child][col]
        for j in range(ncols):
            ds = [c.dicts[j] for c in children]
            if all(d is None for d in ds):
                out_dicts.append(None)
                for_col = [None] * len(children)
            elif any(d is None for d in ds):
                raise ExecutionError(f"UNION column {j} mixes Utf8 and numeric")
            elif all(d == ds[0] for d in ds):
                out_dicts.append(ds[0])
                for_col = [None] * len(children)
            else:
                merged = tuple(sorted(set().union(*ds)))
                out_dicts.append(merged)
                for_col = [
                    jnp.asarray(
                        np.searchsorted(
                            merged, np.asarray(d, dtype=object).astype(str)
                        ),
                        dtype=jnp.int32,
                    )
                    for d in ds
                ]
            remaps.append(for_col)

        def fn(env) -> Batch:
            bs = [c.fn(env) for c in children]
            cols: list[ColVal] = []
            for j in range(ncols):
                any_valid = any(b.cols[j][1] is not None for b in bs)
                parts_d, parts_v = [], []
                for ci, b in enumerate(bs):
                    d, v = _broadcast_col(b.cols[j], b.capacity)
                    r = remaps[j][ci]
                    if r is not None:
                        # a 0-row child has an empty vocabulary: every
                        # row is padding — any code works (jnp.take
                        # rejects gathers from an empty axis)
                        d = jnp.zeros_like(d) if r.shape[0] == 0 else jnp.take(r, d)
                    parts_d.append(d)
                    if any_valid:
                        parts_v.append(
                            v if v is not None else jnp.ones((b.capacity,), jnp.bool_)
                        )
                dd = jnp.concatenate(parts_d)
                vv = jnp.concatenate(parts_v) if any_valid else None
                cols.append((dd, vv))
            sel = jnp.concatenate([b.sel for b in bs])
            return Batch(cols, sel)

        return Lowered(plan.schema, out_dicts, fn, cap, children[0].layout)

    # ------------------------------------------------------------------
    def _lower_empty(self, plan: L.EmptyRelation) -> Lowered:
        # one synthetic row so literal-only projections emit one row
        # (reference: EmptyRelation execution was unimplemented!; SELECT 1
        # conventionally yields a single row)
        cap = 8

        def fn(env) -> Batch:
            iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
            return Batch([], iota < 1)

        return Lowered(plan.schema, [], fn, cap)

    def _lower_scan(self, plan: L.TableScan) -> Lowered:
        table = self.tables.get(plan.table_name)
        if table is None:
            raise ExecutionError(f"no table registered as '{plan.table_name}'")
        slot = len(self.scan_tables)
        self.scan_tables.append(table)
        proj = plan.projection
        indices = list(range(len(table.schema))) if proj is None else list(proj)
        # lazy file-backed tables (columnar/csv.py LazyCsvTable) parse
        # only the projected columns, in one pass, at compile time
        ensure = getattr(table, "ensure_columns", None)
        if ensure is not None:
            ensure(indices)
        self.scan_used.append(set(indices))
        schema = table.schema.project(indices)
        dicts = [table.columns[i].dictionary for i in indices]
        n, cap = table.num_rows, table.capacity

        def fn(env) -> Batch:
            cols = [env[slot][i] for i in indices]
            iota = lax.broadcasted_iota(jnp.int32, (cap,), 0)
            return Batch(cols, iota < n)

        return Lowered(schema, dicts, fn, cap, sources=[(slot, i) for i in indices])

    def _lower_selection(self, plan: L.Selection) -> Lowered:
        child = self.lower(plan.input)
        pred = compile_expr(plan.expr, child.schema, child.dicts, self.fn_registry)
        if pred.dtype is not DataType.Boolean:
            raise ExecutionError("selection predicate must be boolean")

        def fn(env) -> Batch:
            b = child.fn(env)
            pd, pv = pred.fn(b.cols)
            if jnp.ndim(pd) == 0:
                pd = jnp.broadcast_to(pd, (b.capacity,))
            keep = pd if pv is None else jnp.logical_and(pd, pv)  # NULL → drop
            return Batch(b.cols, jnp.logical_and(b.sel, keep))

        return Lowered(
            child.schema, child.dicts, fn, child.capacity, child.layout,
            sources=child.sources, bounds=child.bounds,
        )

    # DistCompiler disables the fused pallas stage (its stage fns run
    # inside shard_map; validated single-chip first)
    fuse_stage = True

    @staticmethod
    def _elementwise_safe(e: L.Expr) -> bool:
        """Is this expression a pure per-row map (safe to trace inside a
        pallas block)? Dictionary transforms (LIKE LUTs, string fns) and
        UDFs (unknown closures) are excluded."""
        if isinstance(e, L.Alias):
            return PlanCompiler._elementwise_safe(e.expr)
        if isinstance(e, L.Column):
            return True
        if isinstance(e, L.Literal):
            return e.value.dtype is not DataType.Utf8
        if isinstance(e, L.BinaryExpr):
            if e.op in (L.Operator.Like, L.Operator.NotLike):
                return False  # compiled as a dictionary LUT gather
            cmp_ops = (
                L.Operator.Eq, L.Operator.NotEq,
                L.Operator.Lt, L.Operator.LtEq,
                L.Operator.Gt, L.Operator.GtEq,
            )

            def side_ok(x: L.Expr) -> bool:
                # a Utf8 literal inside a comparison compiles to an
                # elementwise code compare against the column dictionary
                if isinstance(x, L.Literal) and x.value.dtype is DataType.Utf8:
                    return e.op in cmp_ops
                return PlanCompiler._elementwise_safe(x)

            return side_ok(e.left) and side_ok(e.right)
        if isinstance(e, L.Cast):
            if isinstance(e.expr, L.Column):
                # Utf8-source casts compile to a dictionary LUT gather —
                # checked at the call site against the scan schema
                pass
            return PlanCompiler._elementwise_safe(e.expr)
        if isinstance(e, (L.IsNull, L.IsNotNull)):
            return PlanCompiler._elementwise_safe(e.expr)
        if isinstance(e, L.Case):
            ok = all(
                PlanCompiler._elementwise_safe(c) and PlanCompiler._elementwise_safe(r)
                for c, r in e.branches
            )
            if e.else_expr is not None:
                ok = ok and PlanCompiler._elementwise_safe(e.else_expr)
            return ok
        if isinstance(e, L.ScalarFunction):
            from datafusion_tpu.ops.expr_eval import SCALAR_FUNCTIONS

            low = e.name.lower()
            elementwise_builtins = set(SCALAR_FUNCTIONS) | {
                "year", "month", "day", "hour", "minute", "second",
                "dow", "doy", "quarter", "week", "epoch",
                "date_add_days", "ts_add_seconds",
                "add_months_days", "add_months_seconds",
            }
            if low not in elementwise_builtins and not low.startswith("date_trunc_"):
                return False
            return all(PlanCompiler._elementwise_safe(a) for a in e.args)
        return False

    def _try_fused_stage(self, plan: L.Projection) -> Optional[Lowered]:
        """Projection[+Selection] directly over a TableScan with only
        elementwise expressions → ONE pallas pass over the referenced
        input columns (ops/pallas/fused_stage.py). Returns None when the
        pattern or the whitelist doesn't hold (plain XLA path)."""
        from datafusion_tpu.ops.aggregate import _pallas_enabled
        from datafusion_tpu.ops.pallas import fused_stage as fs

        if not (self.fuse_stage and _pallas_enabled()):
            return None
        inner = plan.input
        pred_expr: Optional[L.Expr] = None
        if isinstance(inner, L.Selection) and isinstance(inner.input, L.TableScan):
            scan, pred_expr = inner.input, inner.expr
        elif isinstance(inner, L.TableScan):
            scan = inner
        else:
            return None
        exprs = list(plan.exprs)
        computed = [
            (j, e)
            for j, e in enumerate(exprs)
            if not isinstance(e, L.Column)
        ]
        if pred_expr is None and not computed:
            return None  # pure pass-through: nothing to fuse
        checks = [e for _, e in computed]
        if pred_expr is not None:
            checks.append(pred_expr)
        if not all(self._elementwise_safe(e) for e in checks):
            return None

        def has_utf8_cast(e: L.Expr, schema: Schema) -> bool:
            if isinstance(e, L.Cast) and e.expr.get_type(schema) is DataType.Utf8:
                return True
            return any(has_utf8_cast(c, schema) for c in _expr_children(e))
        # computed Utf8 outputs would need dictionary plumbing — skip
        child = None
        table = self.tables.get(scan.table_name)
        if table is None:
            return None
        child = self._lower_scan(scan)
        schema, dicts = child.schema, child.dicts
        for _, e in computed:
            if e.get_type(schema) is DataType.Utf8:
                return None
        if any(has_utf8_cast(e, schema) for e in checks):
            return None  # LUT gathers stay on the XLA path
        pred_c = (
            compile_expr(pred_expr, schema, dicts, self.fn_registry)
            if pred_expr is not None
            else None
        )
        comp_c = [
            (j, compile_expr(e, schema, dicts, self.fn_registry))
            for j, e in computed
        ]

        # referenced input columns (data + validity layout)
        refd: list[int] = []

        def cols_of(e: L.Expr) -> None:
            if isinstance(e, L.Column):
                if e.index not in refd:
                    refd.append(e.index)
            for c in _expr_children(e):
                cols_of(c)

        for e in checks:
            cols_of(e)
        table_cols = [table.columns[i] for i in (
            list(range(len(table.schema))) if scan.projection is None else scan.projection
        )]
        layout: list[tuple[int, int, Optional[int]]] = []  # (col, data_slot, valid_slot)
        n_inputs = 0
        for i in refd:
            di = n_inputs
            n_inputs += 1
            vi = None
            if table_cols[i].validity is not None:
                vi = n_inputs
                n_inputs += 1
            layout.append((i, di, vi))
        n_rows = table.num_rows
        ncols = len(schema)
        # under shard_map (DistCompiler) the stage sees ONE shard: block
        # the kernel on the local capacity and fold row validity in from
        # the scan's sel mask OUTSIDE the kernel (its iota is local, so
        # the in-kernel `iota < n_rows` global test only holds single-chip)
        shards = getattr(self, "n_dev", 1)
        partitioned = child.layout == "partitioned"
        local_cap = child.capacity // shards if partitioned else child.capacity
        if local_cap % (8 * fs.LANES):
            return None
        # VMEM budget: bytes per row-of-one across inputs + outputs
        bpr = 0
        for i, di, vi in layout:
            bpr += table_cols[i].data.dtype.itemsize + (1 if vi is not None else 0)
        bpr += 1  # sel (int8 in-kernel)
        for _, e in computed:
            from datafusion_tpu.types import physical_np as _phys

            bpr += _phys(e.get_type(schema)).itemsize + 1
        brows = fs.pick_block_rows(local_cap, bpr)
        if not brows:
            return None
        bshape = (brows, fs.LANES)

        def block_eval(blocks, base):
            cols: list = [None] * ncols
            for i, di, vi in layout:
                cols[i] = (blocks[di], None if vi is None else blocks[vi])
            if partitioned:
                # per-shard row validity folds in outside the kernel
                sel = jnp.ones(bshape, jnp.bool_)
            else:
                r = lax.broadcasted_iota(jnp.int32, bshape, 0)
                c2 = lax.broadcasted_iota(jnp.int32, bshape, 1)
                iota = base + r * fs.LANES + c2
                sel = iota < n_rows
            if pred_c is not None:
                pd, pv = pred_c.fn(cols)
                pd = jnp.broadcast_to(pd, bshape)
                sel = jnp.logical_and(sel, pd)
                if pv is not None:
                    sel = jnp.logical_and(sel, pv)  # NULL predicate → drop
            outs = [sel]
            for _, c in comp_c:
                d, v = c.fn(cols)
                outs.append(d)
                if v is not None:
                    outs.append(v)
            return outs

        # learn output dtypes/validity presence without executing
        in_structs = []
        for i, di, vi in layout:
            in_structs.append(
                jax.ShapeDtypeStruct(bshape, table_cols[i].data.dtype)
            )
            if vi is not None:
                in_structs.append(jax.ShapeDtypeStruct(bshape, jnp.bool_))
        out_structs = jax.eval_shape(
            lambda bs: block_eval(list(bs), jnp.int32(0)), tuple(in_structs)
        )
        out_dtypes = [o.dtype for o in out_structs]
        # whether each computed expression carries a validity output
        # (statically determined: compiled fns return v=None or an array)
        dummy_cols: list = [None] * ncols
        for i, di, vi in layout:
            dummy_cols[i] = (
                jax.ShapeDtypeStruct(bshape, table_cols[i].data.dtype),
                None if vi is None else jax.ShapeDtypeStruct(bshape, jnp.bool_),
            )
        has_valid: list[bool] = []
        for _, c in comp_c:
            probe: dict = {}

            def probe_fn(cols_in, c=c, probe=probe):
                d, v = c.fn(list(cols_in))
                probe["has_v"] = v is not None
                return d if v is None else (d, v)

            jax.eval_shape(probe_fn, tuple(dummy_cols))
            has_valid.append(probe["has_v"])

        interpret = jax.devices()[0].platform not in ("tpu", "axon")
        self.notes.append(
            f"scan+filter+project: fused pallas stage "
            f"({len(comp_c)} computed expr(s)"
            + (", predicate" if pred_c is not None else "")
            + f", {len(layout)} input col(s) read once, "
            f"block={brows}x{fs.LANES})"
        )

        def fn(env) -> Batch:
            b = child.fn(env)
            in_arrays: list = []
            for i, di, vi in layout:
                d, v = b.cols[i]
                in_arrays.append(d)
                if vi is not None:
                    in_arrays.append(v)
            outs = fs.run_fused(
                block_eval, in_arrays, out_dtypes, local_cap, brows,
                interpret=interpret,
            )
            sel = outs[0]
            if partitioned:
                # the scan's sel is iota-derived — XLA fuses this AND into
                # the kernel's != 0 cast, no extra HBM pass
                sel = jnp.logical_and(sel, b.sel)
            new_cols: list = []
            k = 1
            ci = 0
            for j, e in enumerate(exprs):
                if isinstance(e, L.Column):
                    new_cols.append(b.cols[e.index])
                    continue
                d = outs[k]
                k += 1
                v = None
                if has_valid[ci]:
                    v = outs[k]
                    k += 1
                ci += 1
                new_cols.append((d, v))
            return Batch(new_cols, sel)

        child_src = child.src()
        child_bnd = child.bnd()
        sources = [
            child_src[e.index] if isinstance(e, L.Column) else None
            for e in exprs
        ]
        bounds = [
            child_bnd[e.index] if isinstance(e, L.Column) else None
            for e in exprs
        ]
        out_dicts = [
            dicts[e.index] if isinstance(e, L.Column) else None for e in exprs
        ]
        return Lowered(
            plan.schema, out_dicts, fn, child.capacity, child.layout, sources,
            bounds=bounds,
        )

    def _lower_projection(self, plan: L.Projection) -> Lowered:
        fused = self._speculative(lambda: self._try_fused_stage(plan))
        if fused is not None:
            return fused
        child = self.lower(plan.input)
        compiled = [
            compile_expr(e, child.schema, child.dicts, self.fn_registry)
            for e in plan.exprs
        ]
        dicts = [c.dictionary for c in compiled]

        def fn(env) -> Batch:
            b = child.fn(env)
            cols = [c.fn(b.cols) for c in compiled]
            return Batch(cols, b.sel)

        child_src = child.src()
        child_bnd = child.bnd()
        sources = [
            child_src[e.index] if isinstance(e, L.Column) else None
            for e in plan.exprs
        ]
        bounds = [
            child_bnd[e.index] if isinstance(e, L.Column) else None
            for e in plan.exprs
        ]
        return Lowered(
            plan.schema, dicts, fn, child.capacity, child.layout, sources,
            bounds=bounds,
        )

    def _lower_aggregate(self, plan: L.Aggregate) -> Lowered:
        child = self.lower(plan.input)
        return self._aggregate_over(plan, child)

    def _aggregate_over(self, plan: L.Aggregate, child: Lowered) -> Lowered:
        group_c = [
            compile_expr(e, child.schema, child.dicts, self.fn_registry)
            for e in plan.group_exprs
        ]
        agg_meta = []
        for e in plan.aggr_exprs:
            if not isinstance(e, L.AggregateFunction):
                raise ExecutionError(f"expected aggregate function, got {e!r}")
            if len(e.args) != 1:
                raise ExecutionError("aggregate functions take exactly one argument")
            arg_c = compile_expr(e.args[0], child.schema, child.dicts, self.fn_registry)
            fname = e.name.lower()
            if e.distinct and fname in ("count", "sum", "avg"):
                fname = f"{fname}_distinct"
            q = 0.5
            if fname.startswith("percentile_disc_desc_"):
                q = float(fname[len("percentile_disc_desc_"):])
                fname = "percentile_disc_desc"
            elif fname.startswith("percentile_disc_"):
                q = float(fname[len("percentile_disc_"):])
                fname = "percentile_disc"
            elif fname.startswith("percentile_"):
                q = float(fname[len("percentile_"):])
                fname = "percentile"
            finite = fname in ("sum", "avg") and self._scanned_float_finite(
                child, e.args[0]
            )
            agg_meta.append((fname, arg_c, e.return_type, q, finite))

        out_dicts = [c.dictionary for c in group_c] + [
            (arg.dictionary if rt is DataType.Utf8 else None)
            for (_, arg, rt, _q, _f) in agg_meta
        ]

        if group_c:
            # sort-free dense path: a single dictionary-coded key with a
            # small static vocabulary IS the group id — no lax.sort, one
            # pallas pass (ops/aggregate.py grouped_aggregate_dense).
            # Integer keys qualify too when the scanned column's probed
            # min..max range is small (_int_key_range) — the compile-time
            # probe costs two tiny reductions on the table buffer.
            probe = self._probe_key_domains(group_c, plan.group_exprs, child)
            doms, offs, notes = probe if probe is not None else ([], [], [])
            dom = 0
            if len(doms) == len(group_c) and doms:
                # conservative +1 radix per key (nullable keys carry a
                # NULL slot; nullability resolves at trace time)
                prod = 1
                for d in doms:
                    prod *= d + 1
                if 1 <= prod <= agg_ops.DENSE_MAX_GROUPS:
                    dom = prod
                    dense_note = " x ".join(notes)
            key_offset = 0
            dense_ok = (
                dom > 0
                and child.capacity % 1024 == 0
                and agg_ops._pallas_enabled()
            )
            if dense_ok:
                from datafusion_tpu.types import physical_np as _phys

                for (name, arg, rt, _q, _f) in agg_meta:
                    p = _phys(arg.dtype)
                    why = None
                    if name in ("sum", "avg") and p != np.dtype(np.float32):
                        why = f"{name.upper()} arg is {p.name}, kernel takes f32"
                    elif name in ("min", "max") and p not in (
                        np.dtype(np.float32),
                        np.dtype(np.int32),
                    ):
                        why = f"{name.upper()} arg is {p.name}, kernel takes f32/i32"
                    elif name not in ("sum", "avg", "min", "max", "count"):
                        why = f"{name.upper()} needs the sorted path"
                    if why is not None:
                        dense_ok = False
                        self.note_decline(
                            f"aggregate: dense sort-free declined ({why})"
                        )
                        break
            if dense_ok:
                self.notes.append(
                    f"aggregate: dense sort-free group-by ({dense_note})"
                )

                def fn_dense(env) -> Batch:
                    b = child.fn(env)
                    keys = [_broadcast_col(c.fn(b.cols), b.capacity) for c in group_c]
                    specs = [
                        agg_ops.AggSpec(
                            name, _broadcast_col(arg.fn(b.cols), b.capacity),
                            rt, q, finite_arg=fin,
                        )
                        for (name, arg, rt, q, fin) in agg_meta
                    ]
                    okeys, oaggs, osel, _ = agg_ops.grouped_aggregate_dense(
                        keys, specs, b.sel, doms, offs
                    )
                    return Batch(list(okeys) + list(oaggs), osel)

                # +1 radix per key covers NULL-key slots; +1 slot for
                # unselected rows
                return Lowered(plan.schema, out_dicts, fn_dense, dom + 1, child.layout)

            # bigdense radix-partition path: domains past the dense
            # window but with VMEM-sized accumulator tables — rows are
            # radix-partitioned into 2048-slot window buckets (one MXU
            # permutation + chunked DMA appends, ops/pallas/partition.py)
            # and reduced windowed with NO lax.sort (the sort is the
            # dominant cost of the packed path below; VERDICT r2 next #3)
            bigdense_ok = (
                os.environ.get("DFTPU_BIGDENSE", "0") != "0"
                and len(doms) == len(group_c)
                and doms
                and child.capacity % 1024 == 0
                and agg_ops._pallas_enabled()
            )
            if bigdense_ok:
                prodb = 1
                for d in doms:
                    prodb *= d + 1
                id_mod_b = 1 << prodb.bit_length()
                from datafusion_tpu.ops.pallas.segreduce import (
                    accum_fits_vmem as _fits,
                )

                # mask budget: one packed bit per DISTINCT nullable
                # aggregate argument (dense_window_aggregate shares one
                # mask object per validity array); nullability is not
                # statically tracked, so bound by distinct arg exprs
                n_arg_exprs = len(
                    {repr(e.args[0]) for e in plan.aggr_exprs}
                )
                # one distinct SUM/AVG argument only: the slab then
                # carries exactly 2 columns (gid + the value), the one
                # per-(cols, buckets) combination the remote Mosaic
                # compiler reliably accepts at every probed bucket count
                # (3 cols crashes at any nb; 4 crashes at nb=8 —
                # PERFLOG r3; opaque HTTP 500s, untraceable further)
                n_sum_args = len(
                    {
                        repr(e.args[0])
                        for e in plan.aggr_exprs
                        if e.name.lower() in ("sum", "avg")
                    }
                )
                bigdense_ok = (
                    agg_ops.DENSE_MAX_GROUPS < prodb <= agg_ops.BIGDENSE_MAX_GROUPS
                    and n_sum_args <= 1
                    and id_mod_b << n_arg_exprs <= (1 << 23)
                    # exists-count + one slot per spec + per-mask counts
                    and _fits(prodb + 1, 2 * len(agg_meta) + 1)
                )
            if bigdense_ok:
                from datafusion_tpu.types import physical_np as _physb

                for (name, arg, rt, _q, _f) in agg_meta:
                    p = _physb(arg.dtype)
                    if name in ("sum", "avg") and p != np.dtype(np.float32):
                        bigdense_ok = False
                    elif name in ("min", "max"):
                        # measured on v5e (PERFLOG r3): the windowed
                        # reduce's MIN/MAX path is a [256, 2048] VPU
                        # cell reduce at ~2.8 ns/row/op — the packed
                        # co-sort amortizes min/max across ops far
                        # better (one sort, value-order gathers), so
                        # min/max shapes stay on the sort. Opt-in via
                        # DFTPU_BIGDENSE=force for experiments.
                        if os.environ.get("DFTPU_BIGDENSE") != "force" or p not in (
                            np.dtype(np.float32), np.dtype(np.int32),
                        ):
                            bigdense_ok = False
                    elif name not in ("sum", "avg", "count"):
                        bigdense_ok = False
            if bigdense_ok:
                self.notes.append(
                    "aggregate: bigdense radix-partition sort-free group-by "
                    f"({' x '.join(notes)}, {prodb + 1} slots)"
                )

                def fn_bigdense(env) -> Batch:
                    b = child.fn(env)
                    keys = [
                        _broadcast_col(c.fn(b.cols), b.capacity) for c in group_c
                    ]
                    specs = [
                        agg_ops.AggSpec(
                            name, _broadcast_col(arg.fn(b.cols), b.capacity),
                            rt, q, finite_arg=fin,
                        )
                        for (name, arg, rt, q, fin) in agg_meta
                    ]
                    okeys, oaggs, osel, _ = agg_ops.grouped_aggregate_bigdense(
                        keys, specs, b.sel, doms, offs
                    )
                    return Batch(list(okeys) + list(oaggs), osel)

                return Lowered(
                    plan.schema, out_dicts, fn_bigdense, prodb + 1, child.layout
                )

            # packed sort path: domains probed but too wide for the dense
            # window (or specs the dense kernel can't take) — (sel, keys)
            # mixed-radix-pack into ONE i32 sort key, dropping the
            # notsel/per-key/iota operands from the dominant co-sort.
            # The domain also bounds the group count, so the overflow
            # retry can never fire on this path.
            packed_doms = packed_offs = None
            packed_on = os.environ.get("DFTPU_PACKED_AGG", "1") != "0"
            if packed_on and len(doms) == len(group_c):
                prodp = 1
                for d in doms:
                    prodp *= d + 1
                if 1 <= prodp <= agg_ops.PACKED_MAX_GROUPS:
                    packed_doms, packed_offs = doms, offs
                elif prodp > agg_ops.PACKED_MAX_GROUPS:
                    self.note_decline(
                        f"aggregate: packed-gid declined (domain product "
                        f"{prodp} > {agg_ops.PACKED_MAX_GROUPS})"
                    )
            if packed_doms is not None:
                gcap = self._alloc_cap(min(child.capacity, prodp + 1))
                self.notes.append(
                    f"aggregate: packed-gid co-sort ({' x '.join(notes)}) "
                    f"+ segmented reduce, group_capacity={gcap}"
                )
            else:
                gcap = self._alloc_cap(
                    min(child.capacity, self.DEFAULT_GROUP_CAPACITY)
                )
                self.notes.append(
                    f"aggregate: co-sort + segmented reduce, group_capacity={gcap}"
                )

            def fn(env) -> Batch:
                b = child.fn(env)
                keys = [_broadcast_col(c.fn(b.cols), b.capacity) for c in group_c]
                specs = [
                    agg_ops.AggSpec(
                        name, _broadcast_col(arg.fn(b.cols), b.capacity),
                        rt, q, finite_arg=fin,
                    )
                    for (name, arg, rt, q, fin) in agg_meta
                ]
                okeys, oaggs, osel, n_groups = agg_ops.grouped_aggregate(
                    keys, specs, b.sel, gcap,
                    dense_domain=packed_doms, dense_offset=packed_offs,
                )
                self.totals.append(n_groups)
                return Batch(list(okeys) + list(oaggs), osel)

            return Lowered(plan.schema, out_dicts, fn, gcap, child.layout)

        out_cap = 8

        def fn0(env) -> Batch:
            b = child.fn(env)
            specs = [
                agg_ops.AggSpec(
                    name, _broadcast_col(arg.fn(b.cols), b.capacity),
                    rt, q, finite_arg=fin,
                )
                for (name, arg, rt, q, fin) in agg_meta
            ]
            outs = agg_ops.ungrouped_aggregate(specs, b.sel)
            iota = lax.broadcasted_iota(jnp.int32, (out_cap,), 0)
            cols = []
            for d, v in outs:
                dcol = jnp.broadcast_to(d, (out_cap,))
                vcol = None if v is None else jnp.broadcast_to(v, (out_cap,))
                cols.append((dcol, vcol))
            return Batch(cols, iota < 1)

        return Lowered(plan.schema, out_dicts, fn0, out_cap, child.layout)

    def _probe_key_domains(self, group_c, group_exprs, child: Lowered):
        """Per-key (domains, offsets, notes) for the dense/packed GROUP BY
        paths: dictionary vocab sizes, or compile-time min/max probes of
        scanned int columns (_int_key_range). None when any key fails —
        the decline reason is recorded in self.notes so EXPLAIN VERBOSE
        shows WHY the sort-free/packed path did not engage (VERDICT r2
        weak #4)."""
        doms: list[int] = []
        offs: list[int] = []
        notes: list[str] = []
        for gi, gc in enumerate(group_c):
            if gc.dictionary is not None:
                if len(gc.dictionary) < 1:
                    self.note_decline(
                        f"aggregate: dense/packed declined (key #{gi} has "
                        "an empty dictionary)"
                    )
                    return None
                doms.append(len(gc.dictionary))
                offs.append(0)
                notes.append(f"dict={len(gc.dictionary)}")
                continue
            rng = self._int_key_range(group_exprs[gi], child)
            if rng is None:
                dt = gc.dtype.value if hasattr(gc.dtype, "value") else gc.dtype
                self.note_decline(
                    f"aggregate: dense/packed declined (key #{gi} "
                    f"{dt}: no static domain — not a scanned int column)"
                )
                return None
            kmin, kmax = rng
            d = kmax - kmin + 1
            if d < 1:
                self.note_decline(
                    f"aggregate: dense/packed declined (key #{gi} has an "
                    f"empty probed range [{kmin},{kmax}])"
                )
                return None
            doms.append(d)
            offs.append(kmin)
            notes.append(f"int[{kmin},{kmax}]")
        return doms, offs, notes

    def _scanned_float_finite(self, child: Lowered, agg_arg) -> bool:
        """Compile-time probe: is this SUM/AVG argument a pure scanned,
        non-nullable float column whose buffer holds NO NaN/±inf (padding
        included — from_pydict/ingest pad with zeros)? Then the kernels
        can skip the in-kernel zero-sanitize AND the whole
        ieee_sum_cond pre-scan + conditional exact path: statistics-
        driven planning, one cached device reduction per (table, column)
        per compiler."""
        e = agg_arg.expr if isinstance(agg_arg, L.Alias) else agg_arg
        if not isinstance(e, L.Column):
            return False
        col_idx = e.index
        if child.schema.fields[col_idx].dtype not in (
            DataType.Float32, DataType.Float64,
        ):
            return False
        src = child.src()[col_idx]
        if src is None:
            return False
        tbl = self.scan_tables[src[0]]
        col = tbl.columns[src[1]]
        if col.validity is not None:
            return False  # NULL rows may hold non-finite fill
        key = id(col.data)
        cached = self._finite_cache.get(key)
        if cached is None:
            try:
                from datafusion_tpu.parallel.multihost import to_host

                cached = bool(to_host(jnp.all(jnp.isfinite(col.data))))
            except Exception:
                cached = False
            self._finite_cache[key] = cached
        return cached

    def _int_key_range(self, gexpr, child: Lowered):
        """Compile-time probe for the dense-int group-by path: when the
        single group key is a pure pass-through of a scanned integer
        column (only row masks applied), read the table buffer's min/max
        eagerly (two tiny device reductions, cached with the compiled
        plan). A filtered-out extreme only widens the range — never
        wrong, just a looser domain bound."""
        e = gexpr.expr if isinstance(gexpr, L.Alias) else gexpr
        if not isinstance(e, L.Column):
            return None
        return self._scanned_int_range(child, e.index)

    def _scanned_int_range(self, child: Lowered, col_idx: int):
        """min/max of a scanned integer column passed through to
        `child`'s output column `col_idx` (None when the column is
        computed or non-integer). Shared by the dense GROUP BY probe and
        the direct-index join probe. A static per-column bound (set by an
        inner direct join: keys ⊆ build domain) intersects the scanned
        range — and suffices on its own when the column has no scan
        source."""
        bound = child.bnd()[col_idx]
        if child.schema.fields[col_idx].dtype not in (
            DataType.Int8, DataType.Int16, DataType.Int32, DataType.Int64,
            DataType.UInt8, DataType.UInt16, DataType.UInt32, DataType.UInt64,
        ):
            return None
        src = child.src()[col_idx]
        if src is None:
            return bound
        tbl = self.scan_tables[src[0]]
        if tbl.num_rows <= 0:
            return None
        col = tbl.columns[src[1]]
        try:
            from datafusion_tpu.parallel.multihost import to_host

            data = col.data[: tbl.num_rows]  # exclude padding rows
            kmin = int(to_host(jnp.min(data)))
            kmax = int(to_host(jnp.max(data)))
        except Exception:
            return None
        if bound is not None:
            kmin, kmax = max(kmin, bound[0]), min(kmax, bound[1])
            if kmax < kmin:
                return None
        return kmin, kmax

    # largest dense-join domain: the scatter table costs ~8 bytes/slot,
    # so cap it at a small multiple of the build side (plus an absolute
    # guard) — beyond that the sort-based strategies win on memory
    DIRECT_JOIN_DOM_FACTOR = 4
    DIRECT_JOIN_DOM_MAX = 1 << 26

    def _direct_join_domain(self, li: int, ri: int, left: Lowered, right: Lowered):
        """(kmin, domain) for the direct-index join when the single build
        key's value domain is statically known and small: dictionary-coded
        keys (domain = merged vocab size) or a scanned integer column
        (min/max probed like the dense GROUP BY path). None otherwise.
        `left`/`ri` name the probe/build roles, not the plan sides — the
        caller may pass a swapped orientation."""
        ld, rd = left.dicts[li], right.dicts[ri]
        if ld is not None and rd is not None:
            dom = len(ld) if ld == rd else len(set(ld) | set(rd))
            rng = (0, dom - 1) if dom > 0 else None
        elif ld is None and rd is None:
            rng = self._scanned_int_range(right, ri)
        else:
            return None
        if rng is None:
            return None
        kmin, kmax = rng
        dom = kmax - kmin + 1
        if dom < 1 or dom > min(
            self.DIRECT_JOIN_DOM_FACTOR * right.capacity,
            self.DIRECT_JOIN_DOM_MAX,
        ):
            return None
        return kmin, dom

    def _lower_sort(self, plan: L.Sort) -> Lowered:
        child = self.lower(plan.input)
        keys = [
            (
                compile_expr(se.expr, child.schema, child.dicts, self.fn_registry),
                se.asc,
                se.nulls_first is True,
            )
            for se in plan.exprs
        ]

        def fn(env) -> Batch:
            b = child.fn(env)
            key_vals = [
                (_broadcast_col(c.fn(b.cols), b.capacity), asc, nf)
                for c, asc, nf in keys
            ]
            cols, count = sort_ops.sort_batch(
                key_vals, [_broadcast_col(c, b.capacity) for c in b.cols], b.sel
            )
            iota = lax.broadcasted_iota(jnp.int32, (b.capacity,), 0)
            return Batch(cols, iota < count)

        return Lowered(child.schema, child.dicts, fn, child.capacity, child.layout)

    def _lower_limit(self, plan: L.Limit) -> Lowered:
        # ORDER BY key LIMIT k fuses into a top-k selection: O(n log k)
        # and a k-row gather instead of the full n-row multi-operand sort.
        # lax.top_k breaks ties by lowest index — the same original-row
        # order the full sort's iota tie-break produces.
        import os

        off = plan.offset
        topk_ok = (
            isinstance(plan.input, L.Sort)
            and all(se.nulls_first is not True for se in plan.input.exprs)
            and plan.limit is not None
            and 0 < plan.limit + off <= 4096
            and os.environ.get("DFTPU_TOPK", "1") != "0"
        )
        if topk_ok:
            lowered = self._speculative(
                lambda: self._lower_topk(plan.input, plan.limit + off)
            )
            if lowered is not None:
                nk = len(plan.input.exprs)
                self.notes.append(
                    f"sort+limit: fused lax.top_k (k={plan.limit + off}, "
                    f"{nk} key{'s' if nk > 1 else ''}, no full sort)"
                )
                return self._skip_compacted(lowered, off)
        child = self.lower(plan.input)
        k = plan.limit

        def fn(env) -> Batch:
            b = child.fn(env)
            return Batch(b.cols, sort_ops.limit_mask(b.sel, k, off))

        return Lowered(child.schema, child.dicts, fn, child.capacity, child.layout)

    @staticmethod
    def _skip_compacted(lowered: Lowered, offset: int) -> Lowered:
        """Mask out the first `offset` rows of a compacted (top-k) batch,
        whose selected rows sit at positions 0..count-1 in order."""
        if not offset:
            return lowered

        def fn(env) -> Batch:
            b = lowered.fn(env)
            iota = lax.broadcasted_iota(jnp.int32, (lowered.capacity,), 0)
            return Batch(b.cols, jnp.logical_and(b.sel, iota >= offset))

        return Lowered(
            lowered.schema, lowered.dicts, fn, lowered.capacity, lowered.layout
        )

    def _lower_topk(self, plan: L.Sort, k: int) -> Optional[Lowered]:
        child = self.lower(plan.input)
        if child.layout != "single":
            return None  # distributed sort keeps the sample-sort path
        from datafusion_tpu.types import physical_np

        if len(plan.exprs) == 1:
            se = plan.exprs[0]
            keyc = compile_expr(se.expr, child.schema, child.dicts, self.fn_registry)
            if physical_np(keyc.dtype) == np.dtype(np.uint64) and not jax.config.jax_enable_x64:
                return None  # no order-preserving signed image without 64-bit

            def rank_fn(b: Batch) -> jax.Array:
                kd, kv = _broadcast_col(keyc.fn(b.cols), b.capacity)
                return topk_rank(kd, kv, b.sel, se.asc)
        else:
            rank_fn = self._packed_rank(plan, child)
            if rank_fn is None:
                return None
        kk = min(k, child.capacity)

        def fn(env) -> Batch:
            b = child.fn(env)
            rank = rank_fn(b)
            _, idx = lax.top_k(rank, kk)
            cols = []
            for d, v in (_broadcast_col(c, b.capacity) for c in b.cols):
                cols.append(
                    (
                        jnp.take(d, idx),
                        None if v is None else jnp.take(v, idx),
                    )
                )
            n_valid = jnp.sum(b.sel.astype(jnp.int32))
            iota = lax.broadcasted_iota(jnp.int32, (kk,), 0)
            return Batch(cols, iota < jnp.minimum(n_valid, kk))

        return Lowered(child.schema, child.dicts, fn, kk, child.layout)

    def _packed_rank(self, plan: L.Sort, child: Lowered):
        """Multi-key ORDER BY ... LIMIT k via one packed lexicographic
        rank, when every key has a statically-bounded small domain:
        dictionary codes (order-preserving sorted vocab), scanned ints
        with a probed min..max range, or narrow fixed-width integers.

        Each key contributes a field of ceil(log2(domain+1)) bits holding
        a code in [1, domain] oriented so LARGER packed rank = earlier
        output row; per-key NULLs take code 0 (NULLS LAST, matching
        sort_batch's default null ordering). Unselected rows rank -1.
        Budget: 30 payload bits in int32 (62 under x64) so the packed
        rank stays a positive signed int for lax.top_k."""
        from datafusion_tpu.types import physical_np

        budget = 62 if jax.config.jax_enable_x64 else 30
        fields = []  # (keyc, asc, domain, width, offset)
        total = 0
        for se in plan.exprs:
            keyc = compile_expr(se.expr, child.schema, child.dicts, self.fn_registry)
            dom_off = None
            if keyc.dictionary is not None:
                if len(keyc.dictionary) >= 1:
                    dom_off = (len(keyc.dictionary), 0)
            else:
                rng = self._int_key_range(se.expr, child)
                if rng is not None and rng[1] >= rng[0]:
                    dom_off = (rng[1] - rng[0] + 1, rng[0])
                else:
                    p = physical_np(keyc.dtype)
                    if p == np.dtype(np.bool_):
                        dom_off = (2, 0)
                    elif p == np.dtype(np.int8):
                        dom_off = (256, -128)
                    elif p == np.dtype(np.uint8):
                        dom_off = (256, 0)
                    elif p == np.dtype(np.int16):
                        dom_off = (65536, -32768)
                    elif p == np.dtype(np.uint16):
                        dom_off = (65536, 0)
            if dom_off is None:
                return None
            domain, off = dom_off
            w = domain.bit_length()  # codes span [0, domain]
            total += w
            if total > budget:
                return None
            fields.append((keyc, se.asc, domain, off, w))
        rank_dt = jnp.int64 if total > 30 else jnp.int32

        def rank_fn(b: Batch) -> jax.Array:
            packed = jnp.zeros((b.capacity,), rank_dt)
            shift = total
            for keyc, asc, domain, off, w in fields:
                kd, kv = _broadcast_col(keyc.fn(b.cols), b.capacity)
                v = kd.astype(rank_dt) - off  # [0, domain-1] for real data
                code = (domain - v) if asc else (v + 1)
                # clip guards padding-row garbage against field overflow
                code = jnp.clip(code, 0, domain)
                if kv is not None:
                    code = jnp.where(kv, code, 0)  # NULLS LAST
                shift -= w
                packed = packed + (code << shift).astype(rank_dt)
            return jnp.where(b.sel, packed, rank_dt(-1))

        return rank_fn

    def _lower_join(self, plan: L.Join) -> Lowered:
        # RIGHT join = LEFT join with sides swapped + output columns
        # permuted back to (left..., right...) order
        if plan.join_type is L.JoinType.Right:
            swapped = L.Join(
                plan.right,
                plan.left,
                tuple((r, l) for l, r in plan.on),
                L.JoinType.Left,
                plan.right.schema.join(plan.left.schema),
            )
            inner = self._lower_join(swapped)
            n_right = len(plan.right.schema)

            def swap_fn(env, inner=inner, n_right=n_right) -> Batch:
                b = inner.fn(env)
                cols = b.cols[n_right:] + b.cols[:n_right]
                return Batch(cols, b.sel)

            dicts = inner.dicts[n_right:] + inner.dicts[:n_right]
            return Lowered(plan.schema, dicts, swap_fn, inner.capacity, inner.layout)
        is_full = plan.join_type is L.JoinType.Full
        keep_unmatched = plan.join_type is L.JoinType.Left or is_full
        left = self.lower(plan.left)
        right = self.lower(plan.right)

        # FULL OUTER can emit up to left+right rows (every row unmatched)
        out_cap = self._alloc_cap(
            left.capacity + right.capacity
            if is_full
            else max(left.capacity, right.capacity)
        )
        # optimistic strategy slots: budget 0 duplicate-matched probes.
        # dup_cap guards attempt 1 (direct-unswapped or compact); dup_cap2
        # guards the SWAPPED direct orientation, so the retry ladder is
        #   direct(unswapped) -> direct(swapped) -> compact/expand
        # — INNER joins are side-symmetric, and TPC-H-Q3-shaped chains
        # (fact table joining a prior join's unique-key output) only
        # have a unique build side in the swapped orientation (VERDICT
        # r3 next #3). Each failed attempt overflows its slot and the
        # standard retry recompiles (see ops/join.py join_columns).
        dup_cap = self._alloc_cap(0)
        dup_cap2 = self._alloc_cap(0)
        strategy = "expand" if dup_cap > 0 else "compact"
        import os

        override = os.environ.get("DFTPU_LOCAL_JOIN")  # test/debug
        if override == "expand":
            strategy = "expand"
        cross = len(plan.on) == 0
        if cross:
            # CROSS JOIN: every probe matches every build row — the
            # compact one-row-per-probe assumption is wrong by design
            strategy = "expand"
        # dense-build-key direct-index path: single key with a statically
        # known small build domain (dictionary vocab or probed scanned-int
        # min/max, same probe as the dense GROUP BY) joins with ONE small
        # scatter + ONE gather per output column — no sorts.
        direct_dom: Optional[tuple[int, int]] = None  # (kmin, domain)
        direct_swap = False  # probe/build roles flipped vs plan sides
        if (
            not is_full
            and not cross
            and len(plan.on) == 1
            and override not in ("compact", "expand")
        ):
            dom_u = self._direct_join_domain(
                plan.on[0][0], plan.on[0][1], left, right
            )
            dom_s = (
                self._direct_join_domain(
                    plan.on[0][1], plan.on[0][0], right, left
                )
                if plan.join_type is L.JoinType.Inner
                else None
            )
            if dup_cap == 0 and dom_u is not None:
                direct_dom = dom_u
            elif dup_cap2 == 0 and dom_s is not None:
                direct_dom, direct_swap = dom_s, True
        if direct_dom is not None:
            strategy = "direct"
        self.notes.append(
            f"join: {strategy}{' (swapped: build=left side)' if direct_swap else ''} "
            + (
                f"(dense build domain [{direct_dom[0]}, {direct_dom[0] + direct_dom[1]}), "
                "one scatter + per-column gather, dup fallback armed), "
                if strategy == "direct"
                else (
                    "(one row per probe, dup-count fallback armed), "
                    if strategy == "compact"
                    else "(scatter-expand), "
                )
            )
            + f"out_capacity={out_cap}"
        )

        # pre-compute dictionary remaps for string join keys + static key
        # bounds for int32 two-key packing
        remaps: list[Optional[tuple[jax.Array, jax.Array]]] = []
        key_maxes: list[Optional[int]] = []
        for li, ri in plan.on:
            ld, rd = left.dicts[li], right.dicts[ri]
            key_maxes.append(
                len(set(ld) | set(rd)) if (ld is not None and rd is not None) else None
            )
            if (ld is None) != (rd is None):
                raise ExecutionError("join key type mismatch (Utf8 vs numeric)")
            if ld is not None and ld != rd:
                merged = sorted(set(ld) | set(rd))
                lmap = jnp.asarray(
                    np.searchsorted(merged, np.asarray(ld, dtype=object).astype(str)),
                    dtype=jnp.int32,
                )
                rmap = jnp.asarray(
                    np.searchsorted(merged, np.asarray(rd, dtype=object).astype(str)),
                    dtype=jnp.int32,
                )
                remaps.append((lmap, rmap))
            else:
                remaps.append(None)

        if strategy == "direct":
            kmin_d, dom_d = direct_dom
            li0, ri0 = plan.on[0]
            remap0 = remaps[0]
            # probe/build roles (direct_swap flips them; inner-only, so
            # keep_unmatched is False whenever swapped)
            probe_low, build_low = (right, left) if direct_swap else (left, right)
            pk_i, bk_i = (ri0, li0) if direct_swap else (li0, ri0)

            def fn_direct(env) -> Batch:
                pb = probe_low.fn(env)
                bb = build_low.fn(env)
                pk, _ = _broadcast_col(pb.cols[pk_i], pb.capacity)
                bk, _ = _broadcast_col(bb.cols[bk_i], bb.capacity)
                if remap0 is not None:
                    pmap, bmap = (
                        (remap0[1], remap0[0]) if direct_swap else remap0
                    )
                    pk = jnp.take(pmap, pk)
                    bk = jnp.take(bmap, bk)
                build_cols = [_broadcast_col(c, bb.capacity) for c in bb.cols]
                # the build KEY column needs no table lane: on matched
                # rows it EQUALS the probe key (pass-through, free), and
                # unmatched rows are masked (inner) or NULL (left). The
                # dead lane otherwise rides the packed gather — lanes
                # can't be DCE'd out of a shared table (measured ~900 ms
                # per lane at BASELINE c4 scale, PERFLOG r4).
                alias_key = remap0 is None
                lane_cols = [
                    c for i, c in enumerate(build_cols)
                    if not (alias_key and i == bk_i)
                ]
                lcols, matched, dups = join_ops.direct_index_join(
                    pk, pb.sel, bk, bb.sel, lane_cols, kmin_d, dom_d,
                    matched_validity=keep_unmatched,
                )
                if alias_key:
                    bdt = build_cols[bk_i][0].dtype
                    ak = pk if pk.dtype == bdt else pk.astype(bdt)
                    akey = (ak, matched if keep_unmatched else None)
                    li = iter(lcols)
                    bcols = [
                        akey if i == bk_i else next(li)
                        for i in range(len(build_cols))
                    ]
                else:
                    bcols = lcols
                out_sel = pb.sel if keep_unmatched else jnp.logical_and(
                    pb.sel, matched
                )
                self.totals.append(jnp.sum(out_sel.astype(jnp.int32)))
                zero = jnp.zeros((), jnp.int32)
                # dup budget slots: A = unswapped attempt, B = swapped
                self.totals.append(zero if direct_swap else dups)
                self.totals.append(dups if direct_swap else zero)
                # output column order is ALWAYS (plan.left..., plan.right...)
                cols = (
                    bcols + list(pb.cols) if direct_swap else list(pb.cols) + bcols
                )
                return Batch(cols, out_sel)

            # INNER join: surviving keys are a subset of the build
            # domain — publish it as a static value bound on both key
            # output columns so a downstream GROUP BY on the join key
            # probes the POST-join domain (typically the small dimension
            # PK range), not the scan's (VERDICT r2 next #1a). LEFT join
            # keeps unmatched probe keys, so no narrowing there.
            bounds = left.bnd() + (
                # inner: build outputs are gathers of (selected) build
                # values, so the build side's bounds carry over
                right.bnd()
                if plan.join_type is L.JoinType.Inner
                else [None] * len(right.schema)
            )
            if plan.join_type is L.JoinType.Inner and remap0 is None:
                kb = (kmin_d, kmin_d + dom_d - 1)
                lb0 = bounds[li0]
                bounds[li0] = (
                    kb if lb0 is None else (max(kb[0], lb0[0]), min(kb[1], lb0[1]))
                )
                bounds[len(left.schema) + ri0] = kb
            # probe rows stay in place (mask-only selection), so the
            # probe-side columns remain scan pass-throughs — which also
            # lets the dense GROUP BY probe see through the join
            probe_src = probe_low.src()
            sources = (
                [None] * len(left.schema) + probe_src
                if direct_swap
                else probe_src + [None] * len(right.schema)
            )
            return Lowered(
                plan.schema,
                left.dicts + right.dicts,
                fn_direct,
                probe_low.capacity,
                probe_low.layout,
                sources=sources,
                bounds=bounds,
            )

        def fn(env) -> Batch:
            lb = left.fn(env)
            rb = right.fn(env)
            lkeys, rkeys = [], []
            for (li, ri), remap in zip(plan.on, remaps):
                lk, _ = _broadcast_col(lb.cols[li], lb.capacity)
                rk, _ = _broadcast_col(rb.cols[ri], rb.capacity)
                if remap is not None:
                    lk = jnp.take(remap[0], lk)
                    rk = jnp.take(remap[1], rk)
                lkeys.append(lk)
                rkeys.append(rk)
            if cross:  # one shared constant key ⇒ every pair matches
                lkeys = [jnp.zeros((lb.capacity,), jnp.int32)]
                rkeys = [jnp.zeros((rb.capacity,), jnp.int32)]
            build_cols = [_broadcast_col(c, rb.capacity) for c in rb.cols]
            res = join_ops.join_columns(
                lkeys,
                lb.sel,
                [_broadcast_col(c, lb.capacity) for c in lb.cols],
                rkeys,
                rb.sel,
                build_cols,
                out_cap,
                keep_unmatched_probe=keep_unmatched,
                key_maxes=key_maxes,
                strategy=strategy,
                want_build_matched=is_full,
            )
            lcols, rcols, matched, out_sel, total, dups = res[:6]
            if is_full:
                # append unmatched build rows after the LEFT-join head
                un = jnp.logical_and(rb.sel, jnp.logical_not(res[6]))
                lcols, rcols, out_sel, total = join_ops.full_merge_tail(
                    lcols, rcols, matched, total, build_cols, un, out_cap
                )
            elif keep_unmatched:
                # unmatched probe rows: build side is NULL
                rcols = [
                    (d, matched if v is None else jnp.logical_and(v, matched))
                    for d, v in rcols
                ]
            self.totals.append(total)
            self.totals.append(
                dups if strategy == "compact" else jnp.zeros((), jnp.int32)
            )
            self.totals.append(jnp.zeros((), jnp.int32))  # swapped-dup slot B
            return Batch(lcols + rcols, out_sel)

        # INNER sort-strategy joins publish static value bounds too
        # (VERDICT r3 next #3: bound propagation used to die at the
        # first sort join, so the rest of a join chain could never
        # upgrade to direct/packed paths). Output rows are a SUBSET of
        # each side's selected rows, so each side's bounds carry over;
        # key columns additionally satisfy BOTH sides' constraints, so
        # their bound is the intersection of the sides' probed scanned
        # ranges. Bounds hold on selected+valid rows only — consumers
        # mask by sel/validity (clip + NULL radix on the packed GROUP
        # BY; sel on the direct join). LEFT/FULL joins keep no bounds:
        # unmatched slots carry stale build values.
        bounds = None
        if plan.join_type is L.JoinType.Inner and not cross:
            bounds = left.bnd() + right.bnd()
            for li, ri in plan.on:
                lrng = self._scanned_int_range(left, li)
                rrng = self._scanned_int_range(right, ri)
                if lrng is None:
                    cand = rrng
                elif rrng is None:
                    cand = lrng
                else:
                    cand = (max(lrng[0], rrng[0]), min(lrng[1], rrng[1]))
                if cand is not None and cand[0] <= cand[1]:
                    bounds[li] = cand
                    bounds[len(left.schema) + ri] = cand

        return Lowered(
            plan.schema, left.dicts + right.dicts, fn, out_cap, left.layout,
            bounds=bounds,
        )


def compile_plan(
    plan: L.LogicalPlan,
    tables: dict[str, Table],
    fn_registry=None,
    caps=None,
) -> CompiledQuery:
    device_plan, host_post = split_host_projection(plan, fn_registry or {})
    pc = PlanCompiler(tables, fn_registry, caps)
    top = pc.lower(device_plan)
    sources = top.src()

    def pipeline(env):
        pc.totals = []
        b = top.fn(env)
        datas, valids = [], []
        for j, (d, v) in enumerate(b.cols):
            if sources[j] is not None:
                # pass-through column: skip the HBM write entirely;
                # materialization reads the original table buffer
                datas.append(None)
                valids.append(None)
                continue
            d = jnp.broadcast_to(d, (top.capacity,)) if jnp.ndim(d) == 0 else d
            if v is not None and jnp.ndim(v) == 0:
                v = jnp.broadcast_to(v, (top.capacity,))
            datas.append(d)
            valids.append(v)
        return datas, valids, b.sel, list(pc.totals)

    jitted = jax.jit(pipeline)

    def recompile(new_caps):
        return compile_plan(plan, tables, fn_registry, new_caps)

    return CompiledQuery(
        schema=top.schema,
        dicts=top.dicts,
        _jitted=jitted,
        _scan_tables=pc.scan_tables,
        _caps=list(pc.caps),
        _recompile=recompile,
        _sources=sources,
        _grows=dict(pc.grows),
        _host_post=host_post,
        _used_cols=pc.scan_used,
    )
