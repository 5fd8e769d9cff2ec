"""CTEs (WITH ... AS), INTERSECT/EXCEPT, LIMIT ... OFFSET — beyond the
reference's grammar (its sqlparser 0.2.1 had none of these)."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.errors import ParserError, PlanError


def make_ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "k": np.array([1, 2, 3, 4, 5, 6], np.int32),
                "g": ["a", "a", "b", "b", "c", "c"],
                "v": np.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0], np.float64),
            }
        ),
    )
    return ctx


# ---------------------------------------------------------------- CTEs
def test_cte_basic():
    ctx = make_ctx()
    out = ctx.sql(
        "WITH big AS (SELECT k, v FROM t WHERE v > 30) "
        "SELECT k FROM big ORDER BY k"
    ).result_str()
    assert out == "4\n5\n6\n"


def test_cte_chained():
    # b references a (earlier CTEs are in scope for later ones)
    ctx = make_ctx()
    out = ctx.sql(
        "WITH a AS (SELECT k FROM t WHERE k < 4), "
        "b AS (SELECT k FROM a WHERE k > 1) "
        "SELECT k FROM b ORDER BY k"
    ).result_str()
    assert out == "2\n3\n"


def test_cte_joined_and_aliased():
    ctx = make_ctx()
    out = ctx.sql(
        "WITH agg AS (SELECT g, SUM(v) AS total FROM t GROUP BY g) "
        "SELECT t.k, agg.total FROM t JOIN agg ON t.g = agg.g "
        "WHERE t.k < 3 ORDER BY k"
    ).result_str()
    assert out == "1\t30.0\n2\t30.0\n"


def test_cte_referenced_twice():
    ctx = make_ctx()
    out = ctx.sql(
        "WITH s AS (SELECT k, g FROM t WHERE k < 5) "
        "SELECT x.k, y.k FROM s AS x JOIN s AS y ON x.g = y.g "
        "WHERE x.k < y.k ORDER BY 1"
    ).result_str()
    assert out == "1\t2\n3\t4\n"


def test_cte_shadows_table():
    # a CTE named like a registered table wins within its scope
    ctx = make_ctx()
    out = ctx.sql(
        "WITH t AS (SELECT k FROM t WHERE k = 3) SELECT k FROM t"
    ).result_str()
    assert out == "3\n"
    # ... and the real table is back outside the WITH
    assert ctx.sql("SELECT COUNT(k) FROM t").result_str() == "6\n"


def test_cte_in_subquery_positions():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT k FROM (WITH w AS (SELECT k FROM t WHERE k > 4) "
        "SELECT k FROM w) d ORDER BY k"
    ).result_str()
    assert out == "5\n6\n"
    out = ctx.sql(
        "SELECT k FROM t WHERE k IN "
        "(WITH w AS (SELECT k FROM t WHERE k < 3) SELECT k FROM w) "
        "ORDER BY k"
    ).result_str()
    assert out == "1\n2\n"


def test_cte_not_visible_to_earlier_cte():
    ctx = make_ctx()
    with pytest.raises(PlanError):
        ctx.sql(
            "WITH a AS (SELECT k FROM later), later AS (SELECT k FROM t) "
            "SELECT k FROM a"
        )


# --------------------------------------------------- INTERSECT / EXCEPT
def test_intersect():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT g FROM t WHERE k < 5 INTERSECT SELECT g FROM t WHERE k > 2"
    ).result_str()
    assert out == '"b"\n'


def test_except():
    ctx = make_ctx()
    out = ctx.sql("SELECT g FROM t EXCEPT SELECT g FROM t WHERE k > 2").result_str()
    assert out == '"a"\n'


def test_setop_distinct_semantics():
    # both operands deduplicate: 'a' appears twice in t but once here
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT g FROM t INTERSECT SELECT g FROM t"
    ).result_str()
    assert sorted(out.splitlines()) == ['"a"', '"b"', '"c"']


def test_union_except_precedence():
    # UNION and EXCEPT associate left-to-right at equal precedence
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT k FROM t WHERE k < 3 UNION SELECT k FROM t WHERE k > 4 "
        "EXCEPT SELECT k FROM t WHERE k = 5"
    ).result_str()
    assert sorted(out.splitlines()) == ["1", "2", "6"]


def test_intersect_binds_tighter_than_union():
    # a UNION b INTERSECT c  =  a UNION (b INTERSECT c)
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT k FROM t WHERE k = 1 UNION "
        "SELECT k FROM t WHERE k < 4 INTERSECT SELECT k FROM t WHERE k > 2"
    ).result_str()
    assert sorted(out.splitlines()) == ["1", "3"]


def test_setop_type_coercion():
    # int32 column INTERSECT int64-typed literals → supertype
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT k FROM t WHERE k < 3 INTERSECT SELECT k + 1 FROM t"
    ).result_str()
    assert out == "2\n"


def test_setop_column_count_mismatch():
    ctx = make_ctx()
    with pytest.raises(PlanError):
        ctx.sql("SELECT k, g FROM t EXCEPT SELECT k FROM t")


def test_except_with_cte():
    ctx = make_ctx()
    out = ctx.sql(
        "WITH lo AS (SELECT k FROM t WHERE k <= 3) "
        "SELECT k FROM t EXCEPT SELECT k FROM lo"
    ).result_str()
    assert sorted(out.splitlines()) == ["4", "5", "6"]


# ------------------------------------------------------------- OFFSET
def test_limit_offset():
    ctx = make_ctx()
    assert (
        ctx.sql("SELECT k FROM t ORDER BY k LIMIT 2 OFFSET 3").result_str()
        == "4\n5\n"
    )
    assert (
        ctx.sql("SELECT k FROM t LIMIT 3 OFFSET 1").result_str() == "2\n3\n4\n"
    )


def test_offset_without_limit():
    ctx = make_ctx()
    assert (
        ctx.sql("SELECT k FROM t ORDER BY k DESC OFFSET 4").result_str()
        == "2\n1\n"
    )


def test_offset_past_end():
    ctx = make_ctx()
    assert ctx.sql("SELECT k FROM t ORDER BY k OFFSET 6").result_str() == ""
    assert ctx.sql("SELECT k FROM t ORDER BY k LIMIT 5 OFFSET 99").result_str() == ""


def test_offset_explain_rendering():
    ctx = make_ctx()
    out = ctx.sql("EXPLAIN SELECT k FROM t ORDER BY k LIMIT 2 OFFSET 3").result_str()
    assert "Limit: 2 OFFSET 3" in out


def test_offset_not_a_number():
    ctx = make_ctx()
    with pytest.raises((PlanError, ParserError)):
        ctx.sql("SELECT k FROM t OFFSET k")


def test_limit_offset_plan_json_roundtrip():
    from datafusion_tpu.plan.logical import plan_from_json, plan_to_json

    ctx = make_ctx()
    plan = ctx.plan("SELECT k FROM t ORDER BY k LIMIT 2 OFFSET 3")
    assert repr(plan_from_json(plan_to_json(plan))) == repr(plan)


def test_intersect_except_all():
    ctx = ExecutionContext()
    ctx.register_table("a", Table.from_pydict({"x": np.array([1, 1, 1, 2, 3], np.int32)}))
    ctx.register_table("b", Table.from_pydict({"x": np.array([1, 2, 2], np.int32)}))
    q = lambda sql: sorted(ctx.sql(sql).result_str().splitlines())
    # bag semantics: min / clamped difference of multiplicities
    assert q("SELECT x FROM a INTERSECT ALL SELECT x FROM b") == ["1", "2"]
    assert q("SELECT x FROM a EXCEPT ALL SELECT x FROM b") == ["1", "1", "3"]
    assert q("SELECT x FROM b EXCEPT ALL SELECT x FROM a") == ["2"]
    # set forms unchanged
    assert q("SELECT x FROM a INTERSECT SELECT x FROM b") == ["1", "2"]
    assert q("SELECT x FROM a EXCEPT SELECT x FROM b") == ["3"]


def test_setop_all_multi_column_and_distributed():
    from datafusion_tpu.parallel.mesh import make_mesh

    def mk(mesh=None):
        ctx = ExecutionContext(mesh=mesh)
        ctx.register_table(
            "a",
            Table.from_pydict(
                {"g": ["x", "x", "y", "y"], "v": np.array([1, 1, 2, 3], np.int32)}
            ),
        )
        ctx.register_table(
            "b",
            Table.from_pydict({"g": ["x", "y"], "v": np.array([1, 2], np.int32)}),
        )
        return ctx

    sql = "SELECT g, v FROM a EXCEPT ALL SELECT g, v FROM b"
    single = sorted(mk().sql(sql).result_str().splitlines())
    assert single == ['"x"\t1', '"y"\t3']
    dist = sorted(mk(make_mesh()).sql(sql).result_str().splitlines())
    assert dist == single
