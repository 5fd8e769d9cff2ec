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


# ---------------------------------------------------------------------------
# r4: push-down through Join (per-side split) + filter push-down
# ---------------------------------------------------------------------------


class TwoTableProvider(Provider):
    def get_table_meta(self, name):
        if name == "t":
            return super().get_table_meta("t")
        if name == "u":
            return Schema(
                [
                    Field("k", D.Int32, False),
                    Field("x", D.Float64, False),
                    Field("y", D.Float64, False),
                    Field("z", D.Utf8, False),
                ]
            )
        return None


def plan2(sql):
    return SqlToRel(TwoTableProvider()).sql_to_rel(parse_sql(sql))


def test_pushdown_through_join_narrows_both_sides():
    from datafusion_tpu.plan.optimizer import push_down_filters

    p = push_down_projection(
        plan2("SELECT t.b, u.x FROM t JOIN u ON t.a = u.k")
    )
    r = repr(p)
    # left keeps the key + b, right keeps the key + x
    assert "TableScan: t projection=Some([0, 1])" in r
    assert "TableScan: u projection=Some([0, 1])" in r
    # join keys and projection exprs remapped into the narrow schemas
    assert "on=[#0 = #0]" in r
    assert r.startswith("Projection: #1, #3\n")


def test_filter_pushdown_splits_conjuncts_by_side():
    from datafusion_tpu.plan.logical import Join, Selection
    from datafusion_tpu.plan.optimizer import push_down_filters

    p = push_down_filters(
        plan2(
            "SELECT t.b, u.x FROM t JOIN u ON t.a = u.k "
            "WHERE t.b > 1 AND u.x < 2 AND t.b < u.y"
        )
    )
    # the cross-side conjunct stays above; single-side ones moved below
    sel = p.input  # Projection -> Selection(residual)
    assert isinstance(sel, Selection)
    j = sel.input
    assert isinstance(j, Join)
    assert isinstance(j.left, Selection) and isinstance(j.right, Selection)
    assert "#1 Gt" in repr(j.left.expr)
    assert "#1 Lt" in repr(j.right.expr)  # u.x remapped to right-local #1


def test_filter_pushdown_outer_join_preserved_side_only():
    from datafusion_tpu.plan.logical import Join, Selection
    from datafusion_tpu.plan.optimizer import push_down_filters

    p = push_down_filters(
        plan2(
            "SELECT t.b, u.x FROM t LEFT JOIN u ON t.a = u.k "
            "WHERE t.b > 1 AND u.x < 2"
        )
    )
    sel = p.input
    assert isinstance(sel, Selection)  # u.x < 2 must STAY above the join
    j = sel.input
    assert isinstance(j, Join)
    assert isinstance(j.left, Selection)  # t.b > 1 moved below (preserved side)
    assert not isinstance(j.right, Selection)


def test_join_pushdown_results_correct():
    import os

    rng = np.random.default_rng(5)
    n = 500
    t = Table.from_pydict(
        {
            "a": rng.integers(0, 50, n).astype(np.int32),
            "b": rng.random(n),
            "c": np.array([f"s{i}" for i in range(n)], dtype=object),
            "d": rng.integers(0, 9, n).astype(np.int64),
        }
    )
    u = Table.from_pydict(
        {
            "k": np.arange(50, dtype=np.int32),
            "x": rng.random(50),
            "y": rng.random(50),
            "z": np.array([f"z{i}" for i in range(50)], dtype=object),
        }
    )
    ctx = ExecutionContext()
    ctx.register_table("t", t)
    ctx.register_table("u", u)
    sql = (
        "SELECT a, SUM(x) FROM t JOIN u ON t.a = u.k "
        "WHERE b > 0.5 AND y > 0.2 GROUP BY a ORDER BY a"
    )
    res = ctx.sql(sql).to_pylist()
    # oracle recomputed directly from the generating arrays
    import collections

    a_np = np.asarray(t.columns[0].data)[:n]
    b_np = np.asarray(t.columns[1].data)[:n]
    x_np = np.asarray(u.columns[1].data)[:50]
    y_np = np.asarray(u.columns[2].data)[:50]
    want = collections.defaultdict(float)
    for i in range(n):
        aa = int(a_np[i])
        if b_np[i] > 0.5 and y_np[aa] > 0.2:
            want[aa] += float(x_np[aa])
    got = {r["a"]: float(r["SUM"]) for r in res}
    assert set(got) == set(want)
    for kk in want:
        assert abs(got[kk] - want[kk]) < 1e-6 * max(1.0, abs(want[kk]))
