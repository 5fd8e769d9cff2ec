"""Adversarial tests for the silent-wrong-answer class (VERDICT r4 #1).

A SQL engine must never return plausible garbage:
- SUM/AVG over Utf8/Boolean must raise PlanError at plan time (the
  reference errors in runtime dispatch — aggregate.rs:344-546 has no
  Utf8 arm; we match that OUTCOME at plan time).
- from_pydict with None entries must infer the numeric type and set
  validity (not silently become a Utf8 column holding 'None').
- Integer division/modulo by zero yields NULL (documented deviation at
  ops/expr_eval.py: Rust panics; NULL composes with jit).
"""

import datetime

import numpy as np
import pytest

from datafusion_tpu import DataType as D, ExecutionContext
from datafusion_tpu.columnar.table import Table
from datafusion_tpu.errors import PlanError


@pytest.fixture()
def ctx():
    c = ExecutionContext()
    c.register_table(
        "t",
        Table.from_pydict(
            {
                "s": ["a", "b", "c", "d"],
                "flag": [True, False, True, False],
                "v": [1.0, None, 3.0, None],
                "k": [1, None, 3, 7],
                "a": [10, 20, 30, 40],
                "b": [2, 0, 5, 0],
                "f": [1.0, 2.0, 4.0, 8.0],
            }
        ),
    )
    return c


# ---------------------------------------------------------------- 1a
@pytest.mark.parametrize(
    "sql",
    [
        "SELECT SUM(s) FROM t",
        "SELECT AVG(s) FROM t",
        "SELECT SUM(flag) FROM t",
        "SELECT AVG(flag) FROM t",
        "SELECT s, SUM(s) FROM t GROUP BY s",
    ],
)
def test_sum_avg_non_numeric_is_plan_error(ctx, sql):
    with pytest.raises(PlanError):
        ctx.sql(sql)


def test_min_max_utf8_still_works(ctx):
    assert ctx.sql("SELECT MIN(s), MAX(s) FROM t").result_str().strip() == '"a"\t"d"'


def test_sum_date_still_errors(ctx):
    ctx.register_table(
        "dt", Table.from_pydict({"d": [datetime.date(2020, 1, 1)]})
    )
    with pytest.raises(PlanError):
        ctx.sql("SELECT SUM(d) FROM dt")


# ---------------------------------------------------------------- 1b
def test_from_pydict_none_infers_numeric_with_validity(ctx):
    t = ctx.tables["t"] if hasattr(ctx, "tables") else None
    out = ctx.sql("SELECT SUM(v), COUNT(v), AVG(v) FROM t").result_str().strip()
    assert out == "4.0\t2\t2.0"
    out = ctx.sql("SELECT SUM(k), COUNT(k) FROM t").result_str().strip()
    assert out == "11\t3"


def test_from_pydict_none_schema_types():
    t = Table.from_pydict({"v": [1.0, None], "k": [None, 5], "s": ["x", None]})
    dts = {f.name: f.dtype for f in t.schema.fields}
    assert dts["v"] is D.Float64
    assert dts["k"] is D.Int64
    assert dts["s"] is D.Utf8


def test_from_pydict_all_none_column():
    t = Table.from_pydict({"v": [None, None]})
    assert t.schema.fields[0].dtype is D.Float64
    ctx = ExecutionContext()
    ctx.register_table("n", t)
    assert ctx.sql("SELECT COUNT(v) FROM n").result_str().strip() == "0"


def test_from_pydict_none_string_rows_are_null():
    ctx = ExecutionContext()
    ctx.register_table("s", Table.from_pydict({"s": ["x", None, "y"]}))
    rows = ctx.sql("SELECT s FROM s").result_str().splitlines()
    assert rows == ['"x"', "NULL", '"y"']
    assert ctx.sql("SELECT COUNT(s) FROM s").result_str().strip() == "2"


def test_from_pydict_nat_datetime64():
    t = Table.from_pydict(
        {"d": np.array(["2020-01-01", "NaT", "2020-01-03"], dtype="datetime64[D]")}
    )
    assert t.schema.fields[0].dtype is D.Date32
    ctx = ExecutionContext()
    ctx.register_table("d", t)
    assert ctx.sql("SELECT COUNT(d) FROM d").result_str().strip() == "2"


# ---------------------------------------------------------------- 1c
def test_int_div_by_zero_column_is_null(ctx):
    assert ctx.sql("SELECT a / b FROM t").result_str().splitlines() == [
        "5", "NULL", "6", "NULL",
    ]
    assert ctx.sql("SELECT a % b FROM t").result_str().splitlines() == [
        "0", "NULL", "0", "NULL",
    ]


def test_int_div_by_zero_literal_is_null(ctx):
    assert ctx.sql("SELECT a / 0 FROM t").result_str().splitlines() == ["NULL"] * 4
    assert ctx.sql("SELECT a % 0 FROM t").result_str().splitlines() == ["NULL"] * 4
    # non-zero literal divisor keeps the validity-free fast path
    assert ctx.sql("SELECT a / 2 FROM t").result_str().splitlines() == [
        "5", "10", "15", "20",
    ]


def test_float_div_by_zero_keeps_ieee(ctx):
    rows = ctx.sql("SELECT f / 0.0 FROM t").result_str().splitlines()
    assert all(r == "inf" for r in rows)


def test_div_null_propagates(ctx):
    # NULL dividend rows stay NULL; zero-divisor NULLs compose with them
    rows = ctx.sql("SELECT k / b FROM t").result_str().splitlines()
    assert rows == ["0", "NULL", "0", "NULL"]
