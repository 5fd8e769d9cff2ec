"""CASE WHEN and UNION [ALL] — beyond the reference (its sqlparser 0.2.1
grammar had neither; see SURVEY.md §2 DFParser)."""

import numpy as np
import pytest

import datafusion_tpu as df
from datafusion_tpu.errors import ParserError, PlanError
from datafusion_tpu.plan.logical import plan_from_json, plan_to_json


@pytest.fixture()
def ctx():
    c = df.ExecutionContext()
    c.register_table(
        "t",
        df.Table.from_pydict(
            {
                "a": np.array([1, 2, 3, 4, 5], dtype=np.int64),
                "b": np.array([1.5, 2.5, 3.5, 4.5, 5.5]),
                "s": np.array(["x", "y", "x", "z", "y"], dtype=object),
            }
        ),
    )
    c.register_table(
        "u",
        df.Table.from_pydict(
            {
                "a": np.array([3, 4], dtype=np.int32),
                "s": np.array(["y", "w"], dtype=object),
            }
        ),
    )
    return c


# ---------------------------------------------------------------------------
# CASE
# ---------------------------------------------------------------------------


def test_case_searched(ctx):
    r = ctx.sql(
        "SELECT a, CASE WHEN a < 2 THEN 0 WHEN a < 4 THEN a * 10 ELSE 99 END FROM t"
    )
    assert [row["case"] for row in r.to_pylist()] == [0, 20, 30, 99, 99]


def test_case_no_else_is_null(ctx):
    r = ctx.sql("SELECT CASE WHEN a < 3 THEN b END FROM t")
    vals = [row["case"] for row in r.to_pylist()]
    assert vals == [1.5, 2.5, None, None, None]


def test_case_simple_operand_form(ctx):
    r = ctx.sql("SELECT CASE a WHEN 1 THEN 100 WHEN 5 THEN 500 ELSE 0 END FROM t")
    assert [row["case"] for row in r.to_pylist()] == [100, 0, 0, 0, 500]


def test_case_first_match_wins(ctx):
    r = ctx.sql("SELECT CASE WHEN a > 0 THEN 1 WHEN a > 2 THEN 2 ELSE 3 END FROM t")
    assert [row["case"] for row in r.to_pylist()] == [1, 1, 1, 1, 1]


def test_case_inside_aggregate(ctx):
    r = ctx.sql("SELECT SUM(CASE WHEN a > 2 THEN b ELSE 0.0 END) FROM t")
    assert r.to_pylist()[0]["SUM"] == pytest.approx(3.5 + 4.5 + 5.5)


def test_case_in_where(ctx):
    r = ctx.sql("SELECT a FROM t WHERE CASE WHEN a > 3 THEN TRUE ELSE FALSE END")
    assert [row["a"] for row in r.to_pylist()] == [4, 5]


def test_case_on_string_condition(ctx):
    r = ctx.sql("SELECT CASE WHEN s = 'x' THEN 1 ELSE 0 END FROM t")
    assert [row["case"] for row in r.to_pylist()] == [1, 0, 1, 0, 0]


def test_case_result_type_coercion(ctx):
    # int and float arms coerce to float
    r = ctx.sql("SELECT CASE WHEN a < 3 THEN a ELSE b END FROM t")
    assert [row["case"] for row in r.to_pylist()] == [1.0, 2.0, 3.5, 4.5, 5.5]


def test_case_requires_boolean_condition(ctx):
    with pytest.raises(PlanError):
        ctx.sql("SELECT CASE WHEN a THEN 1 ELSE 0 END FROM t")


def test_case_requires_when(ctx):
    with pytest.raises(ParserError):
        ctx.sql("SELECT CASE ELSE 1 END FROM t")


def test_case_serde_roundtrip(ctx):
    p = ctx.plan("SELECT CASE WHEN a > 2 THEN 1 ELSE 0 END FROM t")
    j = plan_to_json(p)
    assert plan_to_json(plan_from_json(j)) == j


def test_case_plan_pretty(ctx):
    p = ctx.plan("SELECT CASE WHEN a > 2 THEN 1 END FROM t")
    assert "CASE WHEN #0 Gt Int64(2) THEN Int64(1) END" in repr(p)


# ---------------------------------------------------------------------------
# UNION
# ---------------------------------------------------------------------------


def test_union_all_basic(ctx):
    r = ctx.sql("SELECT a FROM t UNION ALL SELECT a FROM u")
    assert sorted(row["a"] for row in r.to_pylist()) == [1, 2, 3, 3, 4, 4, 5]


def test_union_all_type_coercion(ctx):
    # int64 UNION int32 → int64; int UNION float → float
    r = ctx.sql("SELECT b FROM t UNION ALL SELECT a FROM u")
    vals = sorted(row["b"] for row in r.to_pylist())
    assert vals == [1.5, 2.5, 3.0, 3.5, 4.0, 4.5, 5.5]


def test_union_distinct(ctx):
    r = ctx.sql("SELECT s FROM t UNION SELECT s FROM u")
    assert sorted(row["s"] for row in r.to_pylist()) == ["w", "x", "y", "z"]


def test_union_all_string_dict_merge(ctx):
    r = ctx.sql("SELECT s FROM t UNION ALL SELECT s FROM u")
    assert sorted(row["s"] for row in r.to_pylist()) == [
        "w", "x", "x", "y", "y", "y", "z",
    ]


def test_union_in_derived_table(ctx):
    r = ctx.sql(
        "SELECT s, COUNT(a) FROM "
        "(SELECT a, s FROM t UNION ALL SELECT a, s FROM u) q GROUP BY s"
    )
    got = {row["s"]: row["COUNT"] for row in r.to_pylist()}
    assert got == {"x": 2, "y": 3, "z": 1, "w": 1}


def test_union_where_each_side(ctx):
    r = ctx.sql(
        "SELECT a FROM t WHERE a > 4 UNION ALL SELECT a FROM u WHERE a < 4"
    )
    assert sorted(row["a"] for row in r.to_pylist()) == [3, 5]


def test_union_literals(ctx):
    r = ctx.sql("SELECT 1 UNION ALL SELECT 2")
    assert [row["lit"] for row in r.to_pylist()] == [1, 2]


def test_union_arity_mismatch(ctx):
    with pytest.raises(PlanError):
        ctx.sql("SELECT a, b FROM t UNION ALL SELECT a FROM u")


def test_union_chain_left_assoc(ctx):
    r = ctx.sql("SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3")
    assert sorted(row["lit"] for row in r.to_pylist()) == [1, 2, 3]


def test_union_serde_roundtrip(ctx):
    p = ctx.plan("SELECT a FROM t UNION ALL SELECT a FROM u")
    j = plan_to_json(p)
    assert plan_to_json(plan_from_json(j)) == j


def test_union_order_limit_applies_to_whole(ctx):
    # ORDER BY/LIMIT bind to the right SELECT arm per our grammar; wrap in
    # a derived table to order the union
    r = ctx.sql(
        "SELECT a FROM (SELECT a FROM t UNION ALL SELECT a FROM u) q "
        "ORDER BY a DESC LIMIT 3"
    )
    assert [row["a"] for row in r.to_pylist()] == [5, 4, 4]


# ---------------------------------------------------------------------------
# COALESCE / NULLIF (desugared onto CASE)
# ---------------------------------------------------------------------------


def _nullable_ctx():
    from datafusion_tpu import Field, DataType, Schema

    schema = Schema([Field("a", DataType.Float64), Field("b", DataType.Float64)])
    a = np.array([1.0, 0.0, 3.0, 4.0])
    b = np.array([10.0, 2.0, 3.0, 0.0])
    av = np.array([True, False, True, True])
    bv = np.array([False, True, True, False])
    ctx = df.ExecutionContext()
    ctx.register_table("t", df.Table.from_arrays(schema, [a, b], validity=[av, bv]))
    return ctx


def test_coalesce_basic():
    r = _nullable_ctx().sql(
        "SELECT COALESCE(a, b) AS c1, COALESCE(a, -1.0) AS c2 FROM t"
    )
    rows = r.to_pylist()
    assert [row["c1"] for row in rows] == [1.0, 2.0, 3.0, 4.0]
    assert [row["c2"] for row in rows] == [1.0, -1.0, 3.0, 4.0]


def test_coalesce_all_null_stays_null():
    r = _nullable_ctx().sql("SELECT COALESCE(a, b) FROM t WHERE a IS NULL AND b IS NULL")
    assert r.to_pylist() == []


def test_nullif_equal_gives_null():
    r = _nullable_ctx().sql("SELECT NULLIF(a, b) FROM t")
    # row0: b NULL -> a (1.0); row1: a NULL -> NULL; row2: 3=3 -> NULL;
    # row3: b NULL -> 4.0
    assert [row["case"] for row in r.to_pylist()] == [1.0, None, None, 4.0]


def test_nullif_literal():
    r = _nullable_ctx().sql("SELECT NULLIF(b, 2.0) FROM t WHERE b IS NOT NULL")
    assert [row["case"] for row in r.to_pylist()] == [None, 3.0]


def test_coalesce_type_coercion():
    ctx = df.ExecutionContext()
    ctx.register_table(
        "t", df.Table.from_pydict({"i": np.array([1, 2], np.int64)})
    )
    r = ctx.sql("SELECT COALESCE(i, 0.5) FROM t")
    assert [row["case"] for row in r.to_pylist()] == [1.0, 2.0]
