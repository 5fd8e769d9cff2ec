"""Scalar UDF registration and execution — the reference's FunctionMeta
registry existed but get_function_meta was unimplemented! in the context
(reference: context.rs:255-257); the console's geospatial UDFs were
commented out (main.rs:25-27)."""

import numpy as np
import pytest

import jax.numpy as jnp

from datafusion_tpu import DataType as D, ExecutionContext, Field, Table
from datafusion_tpu.errors import ExecutionError, PlanError
from datafusion_tpu.plan.planner import FunctionMeta, FunctionType


def make_ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "x": np.array([1.0, 4.0, 9.0], np.float64),
                "y": np.array([2.0, 3.0, 4.0], np.float64),
            }
        ),
    )
    return ctx


def test_custom_udf_two_args():
    ctx = make_ctx()
    ctx.register_function(
        FunctionMeta(
            "hypot",
            (Field("a", D.Float64, False), Field("b", D.Float64, False)),
            D.Float64,
            FunctionType.Scalar,
        ),
        lambda a, b: jnp.sqrt(a * a + b * b),
    )
    out = ctx.sql("SELECT hypot(3.0, 4.0)").result_str()
    assert out == "5.0\n"
    out2 = ctx.sql("SELECT hypot(x, y) FROM t").result_str()
    want = [np.hypot(1, 2), np.hypot(4, 3), np.hypot(9, 4)]
    got = [float(v) for v in out2.split()]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_udf_arg_coercion():
    # int args are coerced to the declared Float64 parameter type
    # (reference: per-arg cast_to, sqlplanner.rs:343-367)
    ctx = make_ctx()
    ctx.register_function(
        FunctionMeta(
            "double_it", (Field("a", D.Float64, False),), D.Float64, FunctionType.Scalar
        ),
        lambda a: a * 2.0,
    )
    plan = ctx.plan("SELECT double_it(1)")
    assert "double_it(CAST(Int64(1) AS Float64))" in repr(plan)
    assert ctx.sql("SELECT double_it(21)").result_str() == "42.0\n"


def test_udf_wrong_arity():
    ctx = make_ctx()
    ctx.register_function(
        FunctionMeta(
            "one_arg", (Field("a", D.Float64, False),), D.Float64, FunctionType.Scalar
        ),
        lambda a: a,
    )
    with pytest.raises(PlanError, match="argument"):
        ctx.sql("SELECT one_arg(x, y) FROM t")


def test_unknown_function():
    ctx = make_ctx()
    with pytest.raises(PlanError, match="Invalid function"):
        ctx.sql("SELECT nosuch(x) FROM t")


def test_builtin_functions_compose():
    ctx = make_ctx()
    out = ctx.sql("SELECT floor(sqrt(x) + 0.5) FROM t").result_str()
    assert out == "1.0\n2.0\n3.0\n"
