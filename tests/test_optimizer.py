"""Optimizer tests: projection push-down (live, unlike the reference's
disabled version — sqlplanner.rs:460-539 / context.rs:89) and LIKE
execution on dictionary columns."""

import numpy as np

from datafusion_tpu import DataType as D, ExecutionContext, Field, Schema, Table
from datafusion_tpu.plan.optimizer import collect_expr, push_down_projection
from datafusion_tpu.plan.logical import Cast, Column
from datafusion_tpu.plan.planner import SqlToRel
from datafusion_tpu.sql.parser import parse_sql


class Provider:
    def get_table_meta(self, name):
        if name == "t":
            return Schema(
                [
                    Field("a", D.Int32, False),
                    Field("b", D.Float64, False),
                    Field("c", D.Utf8, False),
                    Field("d", D.Int64, False),
                ]
            )
        return None

    def get_function_meta(self, name):
        return None


def plan_of(sql):
    return SqlToRel(Provider()).sql_to_rel(parse_sql(sql))


def test_collect_expr_dedupes():
    # reference: sqlplanner.rs:707-723 test_collect_expr
    accum = set()
    collect_expr(Cast(Column(3), D.Float64), accum)
    collect_expr(Cast(Column(3), D.Float64), accum)
    assert accum == {3}


def test_pushdown_narrows_scan():
    p = push_down_projection(plan_of("SELECT b FROM t"))
    r = repr(p)
    assert "projection=Some([1])" in r
    assert r.startswith("Projection: #0\n")  # index remapped into narrow schema


def test_pushdown_with_selection():
    p = push_down_projection(plan_of("SELECT b FROM t WHERE a > 1"))
    r = repr(p)
    assert "projection=Some([0, 1])" in r
    # selection refers to narrowed index of 'a' (0), projection to 'b' (1)
    assert "Selection: CAST(#0 AS Int64) Gt Int64(1)" in r
    assert r.startswith("Projection: #1\n")


def test_pushdown_aggregate():
    p = push_down_projection(plan_of("SELECT d, MIN(b) FROM t GROUP BY d"))
    r = repr(p)
    assert "projection=Some([1, 3])" in r
    assert "groupBy=[[#1]]" in r and "MIN(#0)" in r


def test_pushdown_full_width_untouched():
    p = push_down_projection(plan_of("SELECT a, b, c, d FROM t"))
    assert "projection=None" in repr(p)


def test_pushdown_results_correct(data_dir):
    ctx = ExecutionContext()
    schema = Schema(
        [
            Field("city", D.Utf8, False),
            Field("lat", D.Float64, False),
            Field("lng", D.Float64, False),
        ]
    )
    ctx.register_csv("cities", str(data_dir / "uk_cities.csv"), schema)
    out = ctx.sql("SELECT lng FROM cities WHERE lat > 57").result_str()
    assert out.count("\n") == 2  # Elgin + Aberdeen (header swallowed)


def test_like(data_dir):
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {"s": ["apple", "apricot", "banana", "cherry"], "x": np.arange(4, dtype=np.int32)}
        ),
    )
    assert ctx.sql("SELECT x FROM t WHERE s LIKE 'ap%'").result_str() == "0\n1\n"
    assert (
        ctx.sql("SELECT x FROM t WHERE s NOT LIKE '%an%'").result_str() == "0\n1\n3\n"
    )
    assert ctx.sql("SELECT x FROM t WHERE s LIKE '_herry'").result_str() == "3\n"
