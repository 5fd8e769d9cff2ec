"""Expression compilation: Expr IR → traced JAX array functions.

The reference compiles each Expr to an interpreted closure returning a
new Arrow array per batch (reference: src/execution/expression.rs:80-315,
including the materialize-literal-arrays hack at :226-243). Here the
whole expression tree becomes one traced function over device columns —
XLA fuses the entire pipeline, literals stay scalars, and string
comparisons are resolved against the column dictionary at compile time.

Runtime value convention: a column value is `(data, valid)` where `data`
is a jax array (possibly 0-d for literals) and `valid` is a bool array or
None (all-valid).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from datafusion_tpu.errors import ExecutionError, NotImplementedError_
from datafusion_tpu.schema import Schema
from datafusion_tpu.types import DataType, physical_np
from datafusion_tpu.plan.logical import (
    AggregateFunction,
    Alias,
    BinaryExpr,
    Case,
    Cast,
    Column,
    Expr,
    IsNotNull,
    IsNull,
    Literal,
    Operator,
    ScalarFunction,
    SortExpr,
)

ColVal = tuple[jax.Array, Optional[jax.Array]]


@dataclass(frozen=True)
class CompiledExpr:
    """A compiled expression: fn(cols) -> (data, valid|None)."""

    fn: Callable[[Sequence[ColVal]], ColVal]
    dtype: DataType
    dictionary: Optional[tuple[str, ...]] = None


# String functions evaluate on the (small) dictionary VOCABULARY on the
# host at compile time, never on the device: the transformed vocabulary
# is re-canonicalized (sorted unique) and the column's int32 codes pass
# through a tiny remap LUT — so every downstream invariant (code order =
# string order for <,>,MIN,MAX,ORDER BY,GROUP BY) keeps holding.
# string→scalar functions (LENGTH) are a single LUT gather.
_STRING_PYFNS: dict[str, Callable[..., str]] = {
    "upper": lambda s: s.upper(),
    "lower": lambda s: s.lower(),
    "trim": lambda s: s.strip(),
    "ltrim": lambda s: s.lstrip(),
    "rtrim": lambda s: s.rstrip(),
    "reverse": lambda s: s[::-1],
    # SQL SUBSTR is 1-based; a 0/negative start clamps to the string head
    "substr": lambda s, start, ln=None: (
        s[max(int(start) - 1, 0):]
        if ln is None
        else s[max(int(start) - 1, 0): max(int(start) - 1, 0) + max(int(ln), 0)]
    ),
    "replace": lambda s, old, new: s.replace(str(old), str(new)),
    # LPAD/RPAD: negative lengths are empty; LEFT/RIGHT follow Postgres
    # (negative n drops from the other end); overlong RIGHT returns the
    # whole string (no negative-index wraparound)
    "lpad": lambda s, n, fill=" ": (
        s[: max(int(n), 0)] if len(s) >= int(n)
        else (str(fill) * int(n))[: int(n) - len(s)] + s
    ),
    "rpad": lambda s, n, fill=" ": (
        s[: max(int(n), 0)] if len(s) >= int(n)
        else s + (str(fill) * int(n))[: int(n) - len(s)]
    ),
    "left": lambda s, n: (
        s[: int(n)] if int(n) >= 0 else s[: max(len(s) + int(n), 0)]
    ),
    "right": lambda s, n: (
        s[max(len(s) - int(n), 0):] if int(n) >= 0 else s[min(-int(n), len(s)):]
    ),
    "initcap": lambda s: s.title(),
    "repeat": lambda s, n: s * max(int(n), 0),
    "split_part": lambda s, delim, n: (
        (s.split(str(delim)) + [""] * int(n))[int(n) - 1] if int(n) >= 1 else ""
    ),
}

# string → integer functions (one LUT gather on the codes)
_STRING_INT_PYFNS: dict[str, Callable[..., int]] = {
    "length": lambda s: len(s),
    "char_length": lambda s: len(s),
    "character_length": lambda s: len(s),
    # SQL STRPOS: 1-based position of the first occurrence, 0 if absent
    "strpos": lambda s, sub: s.find(str(sub)) + 1,
    "ascii": lambda s: ord(s[0]) if s else 0,
}
_STRING_FN_NAMES = (
    set(_STRING_PYFNS)
    | set(_STRING_INT_PYFNS)
    | {"substring", "concat"}
)

def _sql_round(x, nd=0.0):
    """SQL ROUND: half away from zero (numpy/jnp round is half-even)."""
    m = 10.0 ** nd
    y = x * m
    return jnp.sign(y) * jnp.floor(jnp.abs(y) + 0.5) / m


def _sql_trunc(x, nd=0.0):
    m = 10.0 ** nd
    return jnp.trunc(x * m) / m


# built-in scalar functions; ExecutionContext can register more.
# All run on f64 arguments (f32 physically when x64 is off).
SCALAR_FUNCTIONS: dict[str, Callable] = {
    "sqrt": jnp.sqrt,
    "abs": jnp.abs,
    "exp": jnp.exp,
    "log": jnp.log,  # natural log (ln alias; Postgres LOG is base 10 — use log10)
    "ln": jnp.log,
    "log10": jnp.log10,
    "log2": jnp.log2,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "asin": jnp.arcsin,
    "acos": jnp.arccos,
    "atan": jnp.arctan,
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    "sign": jnp.sign,
    "degrees": lambda x: x * (180.0 / np.pi),
    "radians": lambda x: x * (np.pi / 180.0),
    # multi-argument (planner handles their arity; _plan_function)
    "power": jnp.power,
    "pow": jnp.power,
    "mod": jnp.fmod,  # truncated remainder, sign follows the dividend
    "atan2": jnp.arctan2,
    "round": _sql_round,
    "trunc": _sql_trunc,
}


def _and_valid(a: Optional[jax.Array], b: Optional[jax.Array]) -> Optional[jax.Array]:
    if a is None:
        return b
    if b is None:
        return a
    return jnp.logical_and(a, b)


def _exact_divisor(r):
    """Keep float division IEEE-exact: a compile-time-constant divisor is
    rewritten by XLA's algebraic simplifier into a reciprocal multiply
    (x / 2.5 -> x * 0.4, off by 1 ulp for non-power-of-2 constants —
    measured on CPU; the era goldens pin exact division). An
    optimization_barrier hides literal divisors from the simplifier;
    traced (column) divisors pass through untouched."""
    if isinstance(r, jax.core.Tracer):
        return r
    return lax.optimization_barrier(jnp.asarray(r))


_ARITH = {
    Operator.Plus: lambda l, r: l + r,
    Operator.Minus: lambda l, r: l - r,
    Operator.Multiply: lambda l, r: l * r,
    # truncated division/remainder to match Rust integer semantics
    # (reference executes arrow array_ops::divide; Rust `/` truncates)
    Operator.Divide: lambda l, r: (
        lax.div(l, r)
        if jnp.issubdtype(l.dtype, jnp.integer)
        else l / _exact_divisor(r)
    ),
    Operator.Modulus: lambda l, r: lax.rem(l, r),
}

_CMP = {
    Operator.Eq: lambda l, r: l == r,
    Operator.NotEq: lambda l, r: l != r,
    Operator.Lt: lambda l, r: l < r,
    Operator.LtEq: lambda l, r: l <= r,
    Operator.Gt: lambda l, r: l > r,
    Operator.GtEq: lambda l, r: l >= r,
}


def compile_expr(
    expr: Expr,
    schema: Schema,
    dicts: Sequence[Optional[tuple[str, ...]]],
    fn_registry: Optional[dict[str, Callable]] = None,
) -> CompiledExpr:
    """Compile `expr` against `schema`; `dicts[i]` is the dictionary of
    input column i (None for non-Utf8)."""
    registry = dict(SCALAR_FUNCTIONS)
    if fn_registry:
        registry.update(fn_registry)
    return _compile(expr, schema, list(dicts), registry)


def _compile(expr, schema, dicts, registry) -> CompiledExpr:
    if isinstance(expr, Column):
        i = expr.index
        dt = schema.field(i).dtype
        return CompiledExpr(lambda cols, i=i: cols[i], dt, dicts[i])

    if isinstance(expr, Literal):
        sv = expr.value
        dt = sv.dtype
        if sv.value is None:
            # typed or untyped NULL: zero data + a false validity scalar
            # (broadcast by consumers/pipeline like any literal)
            zero = np.zeros((), physical_np(dt))[()]
            invalid = jnp.zeros((), jnp.bool_)
            return CompiledExpr(lambda cols, z=zero, iv=invalid: (z, iv), dt)
        if dt is DataType.Utf8:
            # a bare string literal projects as a one-entry dictionary
            # column of code 0 (string comparisons never reach here —
            # they rewrite against the column dictionary below)
            vocab = (str(sv.value),)
            zero = jnp.zeros((), jnp.int32)
            return CompiledExpr(lambda cols, z=zero: (z, None), dt, vocab)
        # numpy scalar, not a device array: it inlines as a jaxpr literal
        # at trace time, so closures over it can run inside pallas
        # kernels (which reject captured device arrays)
        const = np.asarray(sv.value, dtype=physical_np(dt))[()]
        return CompiledExpr(lambda cols, c=const: (c, None), dt)

    if isinstance(expr, BinaryExpr):
        return _compile_binary(expr, schema, dicts, registry)

    if isinstance(expr, Cast):
        inner = _compile(expr.expr, schema, dicts, registry)
        target = expr.data_type
        if inner.dtype is DataType.Null and target is DataType.Utf8:
            # NULL cast to string: one-entry dictionary, never valid
            def null_str_fn(cols, inner=inner):
                d, v = inner.fn(cols)
                return jnp.zeros((), jnp.int32), v

            return CompiledExpr(null_str_fn, target, ("",))
        if inner.dtype is DataType.Utf8 or target is DataType.Utf8:
            if inner.dtype == target:
                return inner
            if inner.dtype is DataType.Utf8 and inner.dictionary is not None:
                return _compile_utf8_cast(inner, target)
            raise NotImplementedError_(
                "CAST to Utf8 / from a non-dictionary string is not "
                "supported on device"
            )
        if inner.dtype is DataType.Date32 and target is DataType.Timestamp:
            np_ts = physical_np(DataType.Timestamp)

            def d2ts_fn(cols, inner=inner, np_ts=np_ts):
                d, v = inner.fn(cols)
                return d.astype(np_ts) * 86400, v

            return CompiledExpr(d2ts_fn, target)
        if inner.dtype is DataType.Timestamp and target is DataType.Date32:

            def ts2d_fn(cols, inner=inner):
                d, v = inner.fn(cols)
                return jnp.floor_divide(d, 86400).astype(jnp.int32), v

            return CompiledExpr(ts2d_fn, target)
        np_dt = physical_np(target)

        def cast_fn(cols, inner=inner, np_dt=np_dt):
            d, v = inner.fn(cols)
            return d.astype(np_dt), v

        return CompiledExpr(cast_fn, target)

    if isinstance(expr, IsNull):
        inner = _compile(expr.expr, schema, dicts, registry)

        def isnull_fn(cols, inner=inner):
            d, v = inner.fn(cols)
            if v is None:
                return jnp.zeros(jnp.shape(d), dtype=jnp.bool_), None
            return jnp.logical_not(v), None

        return CompiledExpr(isnull_fn, DataType.Boolean)

    if isinstance(expr, IsNotNull):
        inner = _compile(expr.expr, schema, dicts, registry)

        def isnotnull_fn(cols, inner=inner):
            d, v = inner.fn(cols)
            if v is None:
                return jnp.ones(jnp.shape(d), dtype=jnp.bool_), None
            return v, None

        return CompiledExpr(isnotnull_fn, DataType.Boolean)

    if isinstance(expr, ScalarFunction) and expr.name.lower() in (
        "date_add_days", "ts_add_seconds", "add_months_days", "add_months_seconds"
    ):
        from datafusion_tpu.utils import dates as _dates
        from datafusion_tpu.plan.logical import Literal as _Lit

        inner = _compile(expr.args[0], schema, dicts, registry)
        assert isinstance(expr.args[1], _Lit)
        n = int(expr.args[1].value.value)
        low = expr.name.lower()
        if low == "date_add_days":
            op = lambda d: (d + jnp.int32(n)).astype(d.dtype)
        elif low == "ts_add_seconds":
            op = lambda d: d + jnp.asarray(n, d.dtype)
        elif low == "add_months_days":
            op = lambda d: _dates.add_months_days(d, n)
        else:
            op = lambda d: _dates.add_months_seconds(d, n)

        def iv_fn(cols, inner=inner, op=op):
            d, v = inner.fn(cols)
            return op(d), v

        return CompiledExpr(iv_fn, expr.return_type)

    if isinstance(expr, ScalarFunction) and (
        expr.name.lower() in (
            "year", "month", "day", "hour", "minute", "second",
            "dow", "doy", "quarter", "week", "epoch",
        )
        or expr.name.lower().startswith("date_trunc_")
    ):
        from datafusion_tpu.utils import dates as _dates

        inner = _compile(expr.args[0], schema, dicts, registry)
        low = expr.name.lower()
        is_ts = inner.dtype is DataType.Timestamp
        if low.startswith("date_trunc_"):
            unit = low[len("date_trunc_"):]
            if is_ts:
                extract = lambda d, u=unit: _dates.date_trunc_seconds(d, u)
            else:
                extract = lambda d, u=unit: _dates.date_trunc_days(d, u)
        elif low == "epoch":
            if is_ts:
                extract = lambda d: d.astype(physical_np(DataType.Int64))
            else:
                extract = lambda d: d.astype(physical_np(DataType.Int64)) * 86400
        elif is_ts:
            extract = getattr(_dates, f"ts_extract_{low}")
        else:
            extract = getattr(_dates, f"extract_{low}")

        def date_fn(cols, inner=inner, extract=extract):
            d, v = inner.fn(cols)
            return extract(d), v

        return CompiledExpr(date_fn, expr.return_type)

    if isinstance(expr, ScalarFunction) and expr.name.lower() in _STRING_FN_NAMES:
        return _compile_string_fn(expr, schema, dicts, registry)

    if isinstance(expr, ScalarFunction):
        from datafusion_tpu.ops.functions import HostFunction

        fn = registry.get(expr.name.lower())
        if fn is None:
            raise ExecutionError(f"Invalid function '{expr.name}'")
        if isinstance(fn, HostFunction):
            # host functions are split out of the plan before lowering
            # (exec/compiler.py split_host_projection); reaching one here
            # means it sits somewhere that split cannot reach
            raise NotImplementedError_(
                f"host function '{expr.name}' is only supported in the "
                "top-level SELECT list (it runs on host at result time)"
            )
        args = [_compile(a, schema, dicts, registry) for a in expr.args]

        def sf_fn(cols, fn=fn, args=args):
            datas = []
            valid = None
            for a in args:
                d, v = a.fn(cols)
                datas.append(d)
                valid = _and_valid(valid, v)
            return fn(*datas), valid

        return CompiledExpr(sf_fn, expr.return_type)

    if isinstance(expr, Case):
        out_dt = expr.get_type(schema)
        if out_dt is DataType.Utf8:
            # string-valued CASE: merge the arms' dictionaries into one
            # vocabulary, remap each arm's codes into it, and select on
            # the int codes like any other CASE
            branches = [
                (
                    _compile(c, schema, dicts, registry),
                    _compile(r, schema, dicts, registry),
                )
                for c, r in expr.branches
            ]
            else_c = (
                _compile(expr.else_expr, schema, dicts, registry)
                if expr.else_expr is not None
                else None
            )
            arms = [r for _, r in branches] + ([else_c] if else_c else [])
            for arm in arms:
                if arm.dictionary is None:
                    raise NotImplementedError_(
                        "every string CASE arm must be a dictionary "
                        "expression (column, string function, or literal)"
                    )
            merged = tuple(
                sorted(set().union(*[set(a.dictionary) for a in arms]))
            ) or ("",)
            merged_np = np.asarray(merged, dtype=object).astype(str)
            remap_of = {
                id(a): jnp.asarray(
                    np.searchsorted(
                        merged_np,
                        np.asarray(a.dictionary or ("",), object).astype(str),
                    ).astype(np.int32)
                )
                for a in arms
            }

            def _sel_valid_s(take, v_true, v_false):
                if v_true is None and v_false is None:
                    return None
                vt = jnp.ones((), jnp.bool_) if v_true is None else v_true
                vf = jnp.ones((), jnp.bool_) if v_false is None else v_false
                return jnp.where(take, vt, vf)

            def case_str_fn(
                cols, branches=branches, else_c=else_c, remap_of=remap_of
            ):
                if else_c is not None:
                    acc_d, acc_v = else_c.fn(cols)
                    acc_d = jnp.take(remap_of[id(else_c)], acc_d)
                else:
                    acc_d = jnp.zeros((), jnp.int32)
                    acc_v = jnp.zeros((), jnp.bool_)
                for cond_c, res_c in reversed(branches):
                    cd, cv = cond_c.fn(cols)
                    take = cd if cv is None else jnp.logical_and(cd, cv)
                    rd, rv = res_c.fn(cols)
                    acc_d = jnp.where(take, jnp.take(remap_of[id(res_c)], rd), acc_d)
                    acc_v = _sel_valid_s(take, rv, acc_v)
                return acc_d, acc_v

            return CompiledExpr(case_str_fn, out_dt, merged)
        branches = [
            (_compile(c, schema, dicts, registry), _compile(r, schema, dicts, registry))
            for c, r in expr.branches
        ]
        else_c = (
            _compile(expr.else_expr, schema, dicts, registry)
            if expr.else_expr is not None
            else None
        )
        np_dt = physical_np(out_dt)

        def _sel_valid(take, v_true, v_false):
            if v_true is None and v_false is None:
                return None
            vt = jnp.ones((), jnp.bool_) if v_true is None else v_true
            vf = jnp.ones((), jnp.bool_) if v_false is None else v_false
            return jnp.where(take, vt, vf)

        def case_fn(cols, branches=branches, else_c=else_c, np_dt=np_dt):
            if else_c is not None:
                acc_d, acc_v = else_c.fn(cols)
                acc_d = acc_d.astype(np_dt)
            else:  # no ELSE: unmatched rows are NULL
                acc_d = jnp.zeros((), np_dt)
                acc_v = jnp.zeros((), jnp.bool_)
            # later WHEN arms lose to earlier ones: fold back-to-front
            for cond_c, res_c in reversed(branches):
                cd, cv = cond_c.fn(cols)
                take = cd if cv is None else jnp.logical_and(cd, cv)  # NULL→false
                rd, rv = res_c.fn(cols)
                acc_d = jnp.where(take, rd.astype(np_dt), acc_d)
                acc_v = _sel_valid(take, rv, acc_v)
            return acc_d, acc_v

        return CompiledExpr(case_fn, out_dt)

    if isinstance(expr, (SortExpr, Alias)):
        return _compile(expr.expr, schema, dicts, registry)

    if isinstance(expr, AggregateFunction):
        raise ExecutionError(
            "aggregate function reached the expression compiler; aggregates "
            "are lowered by the Aggregate operator"
        )

    raise NotImplementedError_(f"cannot compile expression {expr!r}")


# ---------------------------------------------------------------------------
# binary expressions
# ---------------------------------------------------------------------------


def _strip_cast(e: Expr) -> Expr:
    # planner inserts identity Utf8 casts only when types already match;
    # string rewrites want the underlying column/literal. A cast to a
    # NON-string type is a real conversion (CAST(s AS DOUBLE)) and must
    # NOT unwrap — the comparison then runs on the converted values.
    while isinstance(e, Cast) and e.data_type is DataType.Utf8:
        e = e.expr
    return e


def _like_to_regex(pattern: str) -> str:
    import re

    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def _compile_like(expr: BinaryExpr, schema, dicts, registry) -> CompiledExpr:
    """LIKE/NOT LIKE on dictionary-encoded strings: the pattern is matched
    against the (small) vocabulary on the host at compile time, producing
    a boolean lookup table indexed by code on device. (The reference
    parsed LIKE but execution was unimplemented, logicalplan.rs:79.)"""
    import re

    lraw, rraw = _strip_cast(expr.left), _strip_cast(expr.right)
    if isinstance(lraw, Literal) or not isinstance(rraw, Literal):
        raise NotImplementedError_("LIKE requires <string expr> LIKE 'pattern'")
    inner = _compile(lraw, schema, dicts, registry)
    vocab = inner.dictionary
    if vocab is None:
        raise NotImplementedError_("LIKE is only supported on Utf8 expressions")
    rx = re.compile(_like_to_regex(rraw.value.value), re.DOTALL)
    matches = np.array([rx.fullmatch(v) is not None for v in vocab], dtype=np.bool_)
    if expr.op is Operator.NotLike:
        matches = ~matches
    lut = jnp.asarray(matches) if len(matches) else jnp.zeros((1,), jnp.bool_)

    def fn(cols, inner=inner, lut=lut):
        d, v = inner.fn(cols)
        return jnp.take(lut, d), v

    return CompiledExpr(fn, DataType.Boolean)


def _compile_string_fn(expr: ScalarFunction, schema, dicts, registry) -> CompiledExpr:
    """String functions as dictionary transforms (see _STRING_PYFNS note).

    The WHOLE string-expression tree (nested functions, CONCAT/|| chains,
    literals) evaluates on the host per vocabulary entry of one base
    dictionary expression; the column's codes then pass through a single
    remap LUT (Utf8 results) or value LUT (integer results). Every
    non-literal leaf must be the SAME base expression — combining two
    different string columns would need their dictionaries' cross
    product and is rejected with a clear error."""

    def canon(name: str) -> str:
        low = name.lower()
        if low == "substring":
            return "substr"
        return low

    base: dict = {}

    has_null = {"v": False}

    def build(e) -> Callable[[str], object]:
        raw = _strip_cast(e)
        if isinstance(raw, Literal):
            v = raw.value.value
            if v is None:
                has_null["v"] = True
            return lambda s, v=v: "" if v is None else v
        if isinstance(raw, ScalarFunction) and canon(raw.name) in (
            set(_STRING_PYFNS) | set(_STRING_INT_PYFNS) | {"concat"}
        ):
            low = canon(raw.name)
            argfns = [build(a) for a in raw.args]
            if low == "concat":
                return lambda s, fs=argfns: "".join(str(f(s)) for f in fs)
            pyfn = _STRING_PYFNS.get(low) or _STRING_INT_PYFNS[low]
            return lambda s, fs=argfns, fn=pyfn: fn(*[f(s) for f in fs])
        # a dictionary-carrying leaf: the base column/expression
        c = _compile(raw, schema, dicts, registry)
        if c.dictionary is None:
            raise NotImplementedError_(
                f"{expr.name} argument must be a dictionary-encoded string "
                f"expression or a literal"
            )
        if "expr" in base:
            if base["expr"] != raw:
                raise NotImplementedError_(
                    f"{expr.name} combines two DIFFERENT string columns — "
                    "only one base string expression per call is supported "
                    "(the dictionaries' cross product would be required)"
                )
        else:
            base["expr"] = raw
            base["compiled"] = c
        return lambda s: s

    tree = build(expr)
    if has_null["v"]:
        # ANSI: a NULL operand makes the whole string expression NULL
        # (|| propagation; documented deviation from Postgres CONCAT's
        # skip-NULLs behavior)
        invalid = jnp.zeros((), jnp.bool_)
        return CompiledExpr(
            lambda cols, iv=invalid: (jnp.zeros((), jnp.int32), iv),
            DataType.Utf8,
            ("",),
        )
    if "compiled" not in base:
        raise NotImplementedError_(
            f"{expr.name} needs at least one string column argument"
        )
    inner: CompiledExpr = base["compiled"]
    # empty-table columns have an empty vocabulary; keep one dummy entry
    # so the LUT gathers stay well-formed (padding rows never decode)
    vocab = inner.dictionary if inner.dictionary else ("",)
    try:
        transformed = [tree(v) for v in vocab]
    except TypeError:
        raise ExecutionError(
            f"wrong number of arguments for {expr.name}"
        ) from None

    if canon(expr.name) in _STRING_INT_PYFNS:
        lut = jnp.asarray(np.array(transformed, np.int32))

        def int_fn(cols, inner=inner, lut=lut):
            d, v = inner.fn(cols)
            return jnp.take(lut, d), v

        return CompiledExpr(int_fn, DataType.Int32)

    transformed = [str(t) for t in transformed]
    canonical = tuple(sorted(set(transformed)))
    remap = jnp.asarray(
        np.searchsorted(
            np.asarray(canonical, dtype=object).astype(str),
            np.asarray(transformed, dtype=object).astype(str),
        ).astype(np.int32)
    )

    def str_fn(cols, inner=inner, remap=remap):
        d, v = inner.fn(cols)
        return jnp.take(remap, d), v

    return CompiledExpr(str_fn, DataType.Utf8, canonical)


_TRUE_STRINGS = {"true", "t", "yes", "y", "on", "1"}
_FALSE_STRINGS = {"false", "f", "no", "n", "off", "0"}


def _compile_utf8_cast(inner: CompiledExpr, target: DataType) -> CompiledExpr:
    """CAST(string AS numeric/boolean/date/timestamp): the (small)
    vocabulary parses on host into a value LUT + parse-ok LUT; the codes
    gather through both. Documented deviation: unparseable strings yield
    NULL (TRY_CAST semantics) instead of erroring — device kernels
    cannot raise per-row."""
    from datafusion_tpu.utils.dates import parse_iso_date, parse_iso_timestamp

    vocab = inner.dictionary if inner.dictionary else ("",)
    np_dt = physical_np(target)
    vals = np.zeros(len(vocab), np_dt)
    ok = np.ones(len(vocab), np.bool_)
    for i, t in enumerate(vocab):
        t = t.strip()
        try:
            if target is DataType.Date32:
                vals[i] = parse_iso_date(t)
            elif target is DataType.Timestamp:
                vals[i] = parse_iso_timestamp(t)
            elif target is DataType.Boolean:
                low = t.lower()
                if low in _TRUE_STRINGS:
                    vals[i] = True
                elif low in _FALSE_STRINGS:
                    vals[i] = False
                else:
                    raise ValueError(t)
            elif np.issubdtype(np_dt, np.integer):
                f = float(t)
                # SQL CAST rounds half away from zero to integer types
                vals[i] = int(np.sign(f) * np.floor(abs(f) + 0.5))
            else:
                vals[i] = float(t)
        except (ValueError, OverflowError):
            ok[i] = False
    lutv = jnp.asarray(vals)
    all_ok = bool(ok.all())
    luto = None if all_ok else jnp.asarray(ok)

    def cast_fn(cols, inner=inner, lutv=lutv, luto=luto):
        d, v = inner.fn(cols)
        data = jnp.take(lutv, d)
        if luto is None:
            return data, v
        okv = jnp.take(luto, d)
        return data, okv if v is None else jnp.logical_and(okv, v)

    return CompiledExpr(cast_fn, target)


def _compile_binary(expr: BinaryExpr, schema, dicts, registry) -> CompiledExpr:
    op = expr.op

    if op in (Operator.Like, Operator.NotLike):
        return _compile_like(expr, schema, dicts, registry)

    lraw, rraw = _strip_cast(expr.left), _strip_cast(expr.right)
    l_is_str = lraw.get_type(schema) is DataType.Utf8 if _typeable(lraw, schema) else False
    r_is_str = rraw.get_type(schema) is DataType.Utf8 if _typeable(rraw, schema) else False
    if op.is_comparison and (l_is_str or r_is_str):
        return _compile_string_cmp(lraw, op, rraw, schema, dicts, registry)

    left = _compile(expr.left, schema, dicts, registry)
    right = _compile(expr.right, schema, dicts, registry)

    if op in (Operator.And, Operator.Or):
        jop = jnp.logical_and if op is Operator.And else jnp.logical_or

        def bool_fn(cols, left=left, right=right, jop=jop):
            ld, lv = left.fn(cols)
            rd, rv = right.fn(cols)
            return jop(ld, rd), _and_valid(lv, rv)

        return CompiledExpr(bool_fn, DataType.Boolean)

    if op.is_comparison:
        cmp = _CMP[op]

        def cmp_fn(cols, left=left, right=right, cmp=cmp):
            ld, lv = left.fn(cols)
            rd, rv = right.fn(cols)
            return cmp(ld, rd), _and_valid(lv, rv)

        return CompiledExpr(cmp_fn, DataType.Boolean)

    if op in _ARITH:
        arith = _ARITH[op]
        out_dt = expr.get_type(schema)

        if op in (Operator.Divide, Operator.Modulus) and out_dt.is_numeric and not (
            out_dt in (DataType.Float32, DataType.Float64)
        ):
            # DOCUMENTED DEVIATION — integer x/0 and x%0 yield NULL.
            # Rust panics here, so the reference hard-fails the whole
            # query; a data-dependent abort cannot ride a jit-compiled
            # TPU pipeline (and lax.div's /0 result is unspecified
            # garbage: -1 was observed). NULL-on-zero-divisor is the
            # MySQL/SQLite semantic and composes with every downstream
            # validity consumer. Float /0 keeps IEEE ±inf/NaN.
            def div0_fn(cols, left=left, right=right, arith=arith):
                ld, lv = left.fn(cols)
                rd, rv = right.fn(cols)
                if not isinstance(rd, jax.core.Tracer) and np.ndim(rd) == 0:
                    # literal divisor, resolved at trace time: non-zero
                    # keeps the validity-free fast path; a literal 0
                    # yields an all-NULL result
                    if np.asarray(rd) != 0:
                        return arith(ld, rd), _and_valid(lv, rv)
                    one = np.ones((), np.asarray(rd).dtype)[()]
                    return arith(ld, one), jnp.zeros((), jnp.bool_)
                zero = rd == 0
                safe = jnp.where(zero, jnp.ones((), rd.dtype), rd)
                out = arith(ld, safe)
                v = _and_valid(_and_valid(lv, rv), jnp.logical_not(zero))
                return out, v

            return CompiledExpr(div0_fn, out_dt)

        def arith_fn(cols, left=left, right=right, arith=arith):
            ld, lv = left.fn(cols)
            rd, rv = right.fn(cols)
            return arith(ld, rd), _and_valid(lv, rv)

        return CompiledExpr(arith_fn, out_dt)

    raise NotImplementedError_(f"operator {op!r} is not executable")


def _typeable(e: Expr, schema) -> bool:
    try:
        e.get_type(schema)
        return True
    except Exception:
        return False


def _compile_string_cmp(lraw, op, rraw, schema, dicts, registry) -> CompiledExpr:
    """String comparisons on dictionary codes, resolved at compile time.
    Either side may be any dictionary-carrying expression (a column or a
    string function result) or a literal."""
    if isinstance(rraw, Literal) and not isinstance(lraw, Literal):
        lc = _compile(lraw, schema, dicts, registry)
        return _dict_lit_cmp(lc, op, rraw.value.value)
    if isinstance(lraw, Literal) and not isinstance(rraw, Literal):
        flip = {
            Operator.Lt: Operator.Gt,
            Operator.LtEq: Operator.GtEq,
            Operator.Gt: Operator.Lt,
            Operator.GtEq: Operator.LtEq,
        }
        rc = _compile(rraw, schema, dicts, registry)
        return _dict_lit_cmp(rc, flip.get(op, op), lraw.value.value)
    if not isinstance(lraw, Literal) and not isinstance(rraw, Literal):
        return _dict_dict_cmp(
            _compile(lraw, schema, dicts, registry),
            op,
            _compile(rraw, schema, dicts, registry),
        )
    raise NotImplementedError_("unsupported string comparison operands")


def _dict_lit_cmp(inner: CompiledExpr, op: Operator, lit: str) -> CompiledExpr:
    vocab = inner.dictionary
    if vocab is None:
        raise ExecutionError("Utf8 expression has no dictionary")
    varr = np.asarray(vocab, dtype=object)
    lo = int(np.searchsorted(varr.astype(str), lit, side="left"))
    hi = int(np.searchsorted(varr.astype(str), lit, side="right"))
    present = lo < hi  # literal exists in the vocab

    def fn(cols, inner=inner, op=op, lo=lo, hi=hi, present=present):
        d, v = inner.fn(cols)
        if op is Operator.Eq:
            out = (d == lo) if present else jnp.zeros(jnp.shape(d), jnp.bool_)
        elif op is Operator.NotEq:
            out = (d != lo) if present else jnp.ones(jnp.shape(d), jnp.bool_)
        elif op is Operator.Lt:
            out = d < lo
        elif op is Operator.LtEq:
            out = d < hi
        elif op is Operator.Gt:
            out = d >= hi
        elif op is Operator.GtEq:
            out = d >= lo
        else:
            raise ExecutionError(f"bad string cmp {op}")
        return out, v

    return CompiledExpr(fn, DataType.Boolean)


def _dict_dict_cmp(lc: CompiledExpr, op: Operator, rc: CompiledExpr) -> CompiledExpr:
    lv, rv = lc.dictionary, rc.dictionary
    if lv is None or rv is None:
        raise ExecutionError("Utf8 expression missing dictionary")
    if lv == rv:
        cmp = _CMP[op]

        def same_fn(cols, lc=lc, rc=rc, cmp=cmp):
            ld, lvd = lc.fn(cols)
            rd, rvd = rc.fn(cols)
            return cmp(ld, rd), _and_valid(lvd, rvd)

        return CompiledExpr(same_fn, DataType.Boolean)

    # different dictionaries: remap both into the merged sorted vocab
    merged = sorted(set(lv) | set(rv))
    lmap = jnp.asarray(np.searchsorted(merged, np.asarray(lv, dtype=object).astype(str)), dtype=jnp.int32)
    rmap = jnp.asarray(np.searchsorted(merged, np.asarray(rv, dtype=object).astype(str)), dtype=jnp.int32)
    cmp = _CMP[op]

    def remap_fn(cols, lc=lc, rc=rc, lmap=lmap, rmap=rmap, cmp=cmp):
        ld, lvd = lc.fn(cols)
        rd, rvd = rc.fn(cols)
        return cmp(jnp.take(lmap, ld), jnp.take(rmap, rd)), _and_valid(lvd, rvd)

    return CompiledExpr(remap_fn, DataType.Boolean)
