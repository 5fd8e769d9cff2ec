"""Numeric→VARCHAR casts (VERDICT r4 #7): host-stage decimal rendering.

Strings exist on device only as dictionary codes, so the cast's argument
computes on device and the text renders once on the materialized host
result (exec/compiler.py split_host_projection + CastRenderHost).
Beyond the reference: its casts were Int16/Int32-only
(expression.rs:272-280).
"""

import datetime

import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar.table import Table
from datafusion_tpu.errors import NotImplementedError_


@pytest.fixture()
def ctx():
    c = ExecutionContext()
    c.register_table(
        "t",
        Table.from_pydict(
            {
                "k": [1, 2, 3],
                "f": [1.5, 2.0, -3.25],
                "b2": [True, False, True],
                "d": [
                    datetime.date(2020, 1, 1),
                    datetime.date(2021, 6, 15),
                    datetime.date(1999, 12, 31),
                ],
                "v": [1.0, None, 3.0],
            }
        ),
    )
    return c


def test_int_to_varchar(ctx):
    assert ctx.sql("SELECT CAST(k AS VARCHAR) FROM t").result_str().splitlines() == [
        '"1"', '"2"', '"3"',
    ]


def test_float_to_varchar_shortest_roundtrip(ctx):
    assert ctx.sql("SELECT CAST(f AS VARCHAR) FROM t").result_str().splitlines() == [
        '"1.5"', '"2.0"', '"-3.25"',
    ]


def test_bool_date_to_varchar(ctx):
    assert ctx.sql("SELECT CAST(b2 AS VARCHAR) FROM t").result_str().splitlines() == [
        '"true"', '"false"', '"true"',
    ]
    assert ctx.sql("SELECT CAST(d AS VARCHAR) FROM t").result_str().splitlines() == [
        '"2020-01-01"', '"2021-06-15"', '"1999-12-31"',
    ]


def test_null_rows_stay_null(ctx):
    assert ctx.sql("SELECT CAST(v AS VARCHAR) FROM t").result_str().splitlines() == [
        '"1.0"', "NULL", '"3.0"',
    ]


def test_cast_of_computed_expr_and_mixed_projection(ctx):
    out = ctx.sql(
        "SELECT k, CAST(k + 10 AS VARCHAR) AS s FROM t WHERE k > 1"
    ).result_str().splitlines()
    assert out == ['2\t"12"', '3\t"13"']


def test_cast_under_limit(ctx):
    out = ctx.sql("SELECT CAST(k AS VARCHAR) FROM t LIMIT 2").result_str().splitlines()
    assert out == ['"1"', '"2"']


def test_roundtrip_both_directions(ctx):
    # value→string (new) composed with the existing string→value path
    ctx.register_table("s", Table.from_pydict({"s": ["1", "22", "333"]}))
    assert ctx.sql("SELECT CAST(s AS INT) + 1 FROM s").result_str().splitlines() == [
        "2", "23", "334",
    ]
    rt = ctx.sql("SELECT CAST(k AS VARCHAR) AS ks FROM t").to_table()
    ctx.register_table("rt", rt)
    assert ctx.sql("SELECT CAST(ks AS INT) FROM rt").result_str().splitlines() == [
        "1", "2", "3",
    ]


def test_order_by_cast_result_raises_loudly(ctx):
    with pytest.raises(NotImplementedError_):
        ctx.sql("SELECT CAST(k AS VARCHAR) AS s FROM t ORDER BY s").result_str()
