"""Logical plan optimizer.

Implements a *working* projection push-down — the reference wrote one
but disabled it at the call site and its scans ignored the projection
anyway (reference: sqlplanner.rs:460-539, context.rs:89,117). Ours
rewrites TableScan.projection to the referenced column set AND remaps
every column index above the scan, so downstream operators see the
narrowed schema.

Note on cost: with device-resident tables and zero-copy jit inputs, XLA
already dead-code-eliminates unused columns (see exec/compiler.py), so
push-down does not change the hot path; it matters for IO-bound sources
and keeps plan displays honest. Also folds constant arithmetic.
"""

from __future__ import annotations

from typing import Optional

from datafusion_tpu.plan import logical as L
from datafusion_tpu.types import ScalarValue


def collect_expr(e: L.Expr, accum: set[int]) -> None:
    """Accumulate referenced column indices
    (reference: collect_expr, sqlplanner.rs:433-458)."""
    if isinstance(e, L.Column):
        accum.add(e.index)
    elif isinstance(e, L.Literal):
        pass
    elif isinstance(e, L.BinaryExpr):
        collect_expr(e.left, accum)
        collect_expr(e.right, accum)
    elif isinstance(e, (L.IsNull, L.IsNotNull)):
        collect_expr(e.expr, accum)
    elif isinstance(e, L.Cast):
        collect_expr(e.expr, accum)
    elif isinstance(e, L.SortExpr):
        collect_expr(e.expr, accum)
    elif isinstance(e, L.Alias):
        collect_expr(e.expr, accum)
    elif isinstance(e, (L.ScalarFunction, L.AggregateFunction)):
        for a in e.args:
            collect_expr(a, accum)
    elif isinstance(e, L.Case):
        for c, r in e.branches:
            collect_expr(c, accum)
            collect_expr(r, accum)
        if e.else_expr is not None:
            collect_expr(e.else_expr, accum)
    else:
        # unknown node: failing loudly beats silently under-collecting,
        # which would narrow scans past columns the expression reads
        raise TypeError(f"collect_expr: unhandled expression {type(e).__name__}")


def _remap_expr(e: L.Expr, mapping: dict[int, int]) -> L.Expr:
    if isinstance(e, L.Column):
        return L.Column(mapping[e.index])
    if isinstance(e, L.Literal):
        return e
    if isinstance(e, L.BinaryExpr):
        return L.BinaryExpr(_remap_expr(e.left, mapping), e.op, _remap_expr(e.right, mapping))
    if isinstance(e, L.IsNull):
        return L.IsNull(_remap_expr(e.expr, mapping))
    if isinstance(e, L.IsNotNull):
        return L.IsNotNull(_remap_expr(e.expr, mapping))
    if isinstance(e, L.Cast):
        return L.Cast(_remap_expr(e.expr, mapping), e.data_type)
    if isinstance(e, L.SortExpr):
        return L.SortExpr(_remap_expr(e.expr, mapping), e.asc, e.nulls_first)
    if isinstance(e, L.Alias):
        return L.Alias(_remap_expr(e.expr, mapping), e.name)
    if isinstance(e, L.ScalarFunction):
        return L.ScalarFunction(e.name, tuple(_remap_expr(a, mapping) for a in e.args), e.return_type)
    if isinstance(e, L.AggregateFunction):
        return L.AggregateFunction(
            e.name, tuple(_remap_expr(a, mapping) for a in e.args), e.return_type, e.distinct
        )
    if isinstance(e, L.Case):
        return L.Case(
            tuple(
                (_remap_expr(c, mapping), _remap_expr(r, mapping))
                for c, r in e.branches
            ),
            None if e.else_expr is None else _remap_expr(e.else_expr, mapping),
        )
    raise TypeError(f"_remap_expr: unhandled expression {type(e).__name__}")


def push_down_projection(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Narrow TableScans to the columns the plan references
    (reference: push_down_projection, sqlplanner.rs:460-539 — disabled
    there; live here)."""

    def walk(p: L.LogicalPlan, required: Optional[set[int]]) -> L.LogicalPlan:
        # `required` = columns of p's output needed above (None = all)
        if isinstance(p, L.Projection):
            accum: set[int] = set()
            for e in p.exprs:
                collect_expr(e, accum)
            new_input = walk(p.input, accum)
            mapping = _scan_mapping(p.input, new_input)
            exprs = tuple(_remap_expr(e, mapping) for e in p.exprs) if mapping else p.exprs
            return L.Projection(exprs, new_input, p.schema)
        if isinstance(p, L.Selection):
            accum = set()
            collect_expr(p.expr, accum)
            if required is not None:
                accum |= required
            new_input = walk(p.input, accum)
            mapping = _scan_mapping(p.input, new_input)
            expr = _remap_expr(p.expr, mapping) if mapping else p.expr
            return L.Selection(expr, new_input)
        if isinstance(p, L.Aggregate):
            accum = set()
            for e in list(p.group_exprs) + list(p.aggr_exprs):
                collect_expr(e, accum)
            new_input = walk(p.input, accum)
            mapping = _scan_mapping(p.input, new_input)
            if mapping:
                group = tuple(_remap_expr(e, mapping) for e in p.group_exprs)
                aggr = tuple(_remap_expr(e, mapping) for e in p.aggr_exprs)
            else:
                group, aggr = p.group_exprs, p.aggr_exprs
            return L.Aggregate(new_input, group, aggr, p.schema)
        if isinstance(p, L.Sort):
            accum = set()
            for e in p.exprs:
                collect_expr(e, accum)
            if required is not None:
                accum |= required
            # Sort's input is a Projection over the same schema; keep all
            # of the projection's outputs (they are the query's outputs)
            new_input = walk(p.input, None)
            return L.Sort(p.exprs, new_input, p.schema)
        if isinstance(p, L.Limit):
            return L.Limit(p.limit, walk(p.input, required), p.schema, p.offset)
        if isinstance(p, L.TableScan):
            if required is None or p.projection is not None:
                return p
            indices = sorted(required)
            if len(indices) == len(p.schema):
                return p
            return L.TableScan(p.schema_name, p.table_name, p.schema, indices)
        # Join / EmptyRelation: pass through untouched (join narrowing
        # needs per-side splitting — future work)
        return p

    return walk(plan, None)


def _scan_mapping(old_input: L.LogicalPlan, new_input: L.LogicalPlan) -> Optional[dict[int, int]]:
    """If the direct child scan got narrowed, map old column indices to
    positions in the narrowed schema."""
    if (
        isinstance(old_input, L.TableScan)
        and isinstance(new_input, L.TableScan)
        and new_input.projection is not None
        and old_input.projection is None
    ):
        return {old: new for new, old in enumerate(new_input.projection)}
    if isinstance(old_input, L.Selection) and isinstance(new_input, L.Selection):
        return _scan_mapping(old_input.input, new_input.input)
    return None


# ---------------------------------------------------------------------------


def fold_constants(e: L.Expr) -> L.Expr:
    """Evaluate literal-only arithmetic at plan time."""
    if isinstance(e, L.BinaryExpr):
        left = fold_constants(e.left)
        right = fold_constants(e.right)
        if (
            isinstance(left, L.Literal)
            and isinstance(right, L.Literal)
            and left.value.dtype == right.value.dtype
            and left.value.dtype.is_numeric
            and e.op
            in (L.Operator.Plus, L.Operator.Minus, L.Operator.Multiply)
        ):
            a, b = left.value.value, right.value.value
            v = {
                L.Operator.Plus: a + b,
                L.Operator.Minus: a - b,
                L.Operator.Multiply: a * b,
            }[e.op]
            return L.Literal(ScalarValue(left.value.dtype, v))
        return L.BinaryExpr(left, e.op, right)
    return e
