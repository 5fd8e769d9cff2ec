"""Regression tests for the 2026-08-19 self-review findings (each was a
verified end-to-end wrong-result or crash before its fix)."""

import numpy as np

from datafusion_tpu import ExecutionContext, Table


def test_hoist_preserves_setop_all():
    # EXCEPT ALL + trailing ORDER BY used to silently drop the ALL flag
    ctx = ExecutionContext()
    ctx.register_table("a", Table.from_pydict({"x": np.array([1, 1, 2], np.int32)}))
    ctx.register_table("b", Table.from_pydict({"x": np.array([1], np.int32)}))
    out = ctx.sql(
        "SELECT x FROM a EXCEPT ALL SELECT x FROM b ORDER BY x"
    ).result_str()
    assert out == "1\n2\n"  # one '1' survives (bag difference)


def test_intersect_only_compound_hoists_order_limit():
    # trailing ORDER BY/LIMIT after a pure INTERSECT applied to the RIGHT
    # operand before the fix (truncating it pre-intersection)
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"x": np.array([1, 2, 3], np.int32)}))
    out = ctx.sql(
        "SELECT x FROM t INTERSECT SELECT x FROM t ORDER BY x LIMIT 1"
    ).result_str()
    assert out == "1\n"
    out = ctx.sql(
        "SELECT x FROM t INTERSECT SELECT x FROM t ORDER BY x DESC LIMIT 1"
    ).result_str()
    assert out == "3\n"


def test_stddev_constant_column_not_nan():
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"c": np.array([0.1] * 7)}))
    out = ctx.sql("SELECT STDDEV(c), VAR_POP(c) FROM t").result_str()
    assert "nan" not in out.lower()
    for cell in out.strip().split("\t"):
        assert abs(float(cell)) < 1e-6


def test_percentile_disc_returns_input_value():
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"x": np.array([1.0, 2.0])}))
    assert (
        ctx.sql(
            "SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x) FROM t"
        ).result_str()
        == "1.0\n"
    )
    ctx.register_table(
        "g",
        Table.from_pydict(
            {"k": ["a", "a", "a"], "x": np.array([10.0, 20.0, 30.0])}
        ),
    )
    assert (
        ctx.sql(
            "SELECT k, PERCENTILE_DISC(0.34) WITHIN GROUP (ORDER BY x) "
            "FROM g GROUP BY k"
        ).result_str()
        == '"a"\t20.0\n'
    )


def test_string_length_edge_clamps():
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"s": ["abc"]}))
    q = lambda sql: ctx.sql(sql).result_str()
    assert q("SELECT RIGHT(s, 5) FROM t") == '"abc"\n'  # no neg-index wrap
    assert q("SELECT LEFT(s, -1) FROM t") == '"ab"\n'  # Postgres semantics
    assert q("SELECT RIGHT(s, -1) FROM t") == '"bc"\n'
    assert q("SELECT LPAD(s, -2) FROM t") == '""\n'
    assert q("SELECT RPAD(s, -2) FROM t") == '""\n'


def test_grouped_window_keeps_output_names():
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {"a": np.array([1, 1, 2], np.int32), "b": np.array([1.0, 2.0, 3.0])}
        ),
    )
    r = ctx.sql(
        "SELECT a, SUM(b) AS sm, ROW_NUMBER() OVER (ORDER BY a) AS r "
        "FROM t GROUP BY a ORDER BY a"
    )
    assert r.schema.names() == ["a", "sm", "r"]
    r2 = ctx.sql(
        "SELECT a, SUM(b), ROW_NUMBER() OVER (ORDER BY a) FROM t GROUP BY a"
    )
    assert r2.schema.names()[:2] == ["a", "SUM"]  # no __g0/__a0 leak


def test_grouped_window_qualified_group_key():
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {"a": np.array([1, 1, 2], np.int32), "b": np.array([1.0, 2.0, 3.0])}
        ),
    )
    # GROUP BY t.a with unqualified SELECT a (and vice versa) must plan
    out = ctx.sql(
        "SELECT a, SUM(b), ROW_NUMBER() OVER (ORDER BY a) FROM t AS t "
        "GROUP BY t.a ORDER BY 1"
    ).result_str()
    assert out == "1\t3.0\t1\n2\t3.0\t2\n"


def test_string_concat_null_propagates():
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"s": ["ab", "xy"]}))
    # ANSI ||: NULL operand nulls the whole expression (no 'None' text)
    assert ctx.sql("SELECT s || NULL FROM t").result_str() == "NULL\nNULL\n"
    assert (
        ctx.sql("SELECT CONCAT(s, NULL, 'z') FROM t").result_str()
        == "NULL\nNULL\n"
    )
