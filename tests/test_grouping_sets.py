"""NULL literals and GROUP BY GROUPING SETS / ROLLUP / CUBE — beyond the
reference (desugared to a UNION ALL of aggregate leaves; NULL columns
unify through the union supertype)."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.errors import PlanError


def make_ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "r": ["e", "e", "e", "w", "w", "w"],
                "g": ["a", "a", "b", "b", "c", "c"],
                "v": np.array([10.0, 20.0, 30.0, 40.0, 50.0, 65.0]),
            }
        ),
    )
    return ctx


# -------------------------------------------------------- NULL literals
def test_null_literals():
    ctx = make_ctx()
    assert ctx.sql("SELECT NULL, v FROM t LIMIT 1").result_str() == "NULL\t10.0\n"
    assert (
        ctx.sql("SELECT CAST(NULL AS DOUBLE) + v FROM t LIMIT 1").result_str()
        == "NULL\n"
    )
    assert (
        ctx.sql("SELECT COALESCE(NULL, v) FROM t LIMIT 2").result_str()
        == "10.0\n20.0\n"
    )
    # comparisons against NULL are never true
    assert ctx.sql("SELECT g FROM t WHERE v > NULL").result_str() == ""
    # NULL unifies through unions (string and numeric)
    assert (
        ctx.sql("SELECT 1, NULL UNION ALL SELECT 2, 'x'").result_str()
        == '1\tNULL\n2\t"x"\n'
    )


def test_insert_null_values():
    ctx = make_ctx()
    ctx.sql("INSERT INTO t VALUES (NULL, NULL, NULL)")
    out = ctx.sql("SELECT r, g, v FROM t ORDER BY v NULLS FIRST LIMIT 1").result_str()
    assert out == "NULL\tNULL\tNULL\n"


# ------------------------------------------------------------- ROLLUP
def test_rollup():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT r, g, SUM(v) FROM t GROUP BY ROLLUP(r, g) ORDER BY 1, 2"
    ).result_str()
    assert out == (
        '"e"\t"a"\t30.0\n"e"\t"b"\t30.0\n"e"\tNULL\t60.0\n'
        '"w"\t"b"\t40.0\n"w"\t"c"\t115.0\n"w"\tNULL\t155.0\n'
        "NULL\tNULL\t215.0\n"
    )


def test_cube_with_grouping_fn():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT r, g, SUM(v), GROUPING(g) FROM t GROUP BY CUBE(r, g) "
        "ORDER BY 4, 1, 2"
    ).result_str()
    assert out == (
        '"e"\t"a"\t30.0\t0\n"e"\t"b"\t30.0\t0\n"w"\t"b"\t40.0\t0\n'
        '"w"\t"c"\t115.0\t0\nNULL\t"a"\t30.0\t0\nNULL\t"b"\t70.0\t0\n'
        'NULL\t"c"\t115.0\t0\n"e"\tNULL\t60.0\t1\n"w"\tNULL\t155.0\t1\n'
        "NULL\tNULL\t215.0\t1\n"
    )


def test_grouping_sets_explicit():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT r, g, COUNT(v) FROM t GROUP BY GROUPING SETS ((r), (g), ()) "
        "ORDER BY 1, 2"
    ).result_str()
    assert out == (
        '"e"\tNULL\t3\n"w"\tNULL\t3\nNULL\t"a"\t2\nNULL\t"b"\t2\n'
        'NULL\t"c"\t2\nNULL\tNULL\t6\n'
    )


def test_rollup_order_by_alias_and_limit():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT r, SUM(v) AS s FROM t GROUP BY ROLLUP(r) ORDER BY s DESC LIMIT 2"
    ).result_str()
    assert out == 'NULL\t215.0\n"w"\t155.0\n'


def test_rollup_with_where_and_having():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT r, SUM(v) FROM t WHERE v > 15 GROUP BY ROLLUP(r) "
        "HAVING SUM(v) > 50 ORDER BY 1"
    ).result_str()
    # WHERE filters rows first; HAVING applies per grouping set
    assert out == '"w"\t155.0\nNULL\t205.0\n'


def test_grouping_fn_requires_group_expr():
    ctx = make_ctx()
    with pytest.raises(PlanError, match="GROUPING"):
        ctx.sql("SELECT GROUPING(v) FROM t GROUP BY ROLLUP(r)")


def test_rollup_distributed_parity():
    from datafusion_tpu.parallel.mesh import make_mesh

    sql = "SELECT r, g, SUM(v) FROM t GROUP BY ROLLUP(r, g) ORDER BY 1, 2"
    single = make_ctx().sql(sql).result_str()
    dist_ctx = ExecutionContext(mesh=make_mesh())
    dist_ctx.register_table("t", make_ctx().table("t"))
    assert single == dist_ctx.sql(sql).result_str()


# ----------------------------------------------------- string CASE arms
def test_case_producing_strings():
    ctx = ExecutionContext()
    ctx.register_table(
        "c",
        Table.from_pydict({"v": np.array([1.0, 5.0, 9.0]), "g": ["x", "y", "z"]}),
    )
    q = lambda sql: ctx.sql(sql).result_str()
    assert q(
        "SELECT CASE WHEN v > 6 THEN 'high' WHEN v > 3 THEN 'mid' "
        "ELSE 'low' END FROM c"
    ) == '"low"\n"mid"\n"high"\n'
    # column arms, NULL arms, nested string functions
    assert q("SELECT CASE WHEN v > 3 THEN g ELSE NULL END FROM c") == (
        'NULL\n"y"\n"z"\n'
    )
    assert q("SELECT CASE WHEN v > 3 THEN UPPER(g) ELSE g END FROM c") == (
        '"x"\n"Y"\n"Z"\n'
    )
    # merged dictionary keeps code order = string order for GROUP/ORDER
    assert q(
        "SELECT CASE WHEN v > 3 THEN 'b' ELSE 'a' END AS k, COUNT(v) FROM c "
        "GROUP BY k ORDER BY k"
    ) == '"a"\t1\n"b"\t2\n'
    assert q(
        "SELECT v FROM c ORDER BY CASE WHEN v > 6 THEN 'a' ELSE 'z' END, v"
    ) == "9.0\n1.0\n5.0\n"
    assert q(
        "SELECT v FROM c WHERE CASE WHEN v > 3 THEN 'y' ELSE 'n' END = 'y' "
        "ORDER BY v"
    ) == "5.0\n9.0\n"
