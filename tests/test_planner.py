"""Planner golden tests — the reference's 13 planner unit tests
reproduced verbatim, plan pretty-print compared byte-for-byte
(reference: src/sqlplanner.rs:541-759 quick_test + MockSchemaProvider
:761-789)."""

import pytest

from datafusion_tpu.errors import PlanError
from datafusion_tpu.plan.logical import plan_from_json, plan_to_json
from datafusion_tpu.plan.planner import FunctionMeta, FunctionType, SqlToRel
from datafusion_tpu.schema import Field, Schema
from datafusion_tpu.sql.parser import parse_sql
from datafusion_tpu.types import DataType as D


class MockSchemaProvider:
    """reference: sqlplanner.rs:761-789"""

    def get_table_meta(self, name):
        if name == "orders":
            return Schema(
                [
                    Field("order_id", D.UInt32, False),
                    Field("person_id", D.UInt32, False),
                    Field("amount", D.Float64, False),
                ]
            )
        if name == "person":
            return Schema(
                [
                    Field("id", D.UInt32, False),
                    Field("first_name", D.Utf8, False),
                    Field("last_name", D.Utf8, False),
                    Field("age", D.Int32, False),
                    Field("state", D.Utf8, False),
                    Field("salary", D.Float64, False),
                ]
            )
        return None

    def get_function_meta(self, name):
        if name == "sqrt":
            return FunctionMeta(
                "sqrt", (Field("n", D.Float64, False),), D.Float64, FunctionType.Scalar
            )
        return None


def quick_test(sql: str, expected: str):
    planner = SqlToRel(MockSchemaProvider())
    plan = planner.sql_to_rel(parse_sql(sql))
    assert repr(plan) == expected
    # every plan must survive the JSON round-trip (reference:
    # logicalplan.rs:612-651 serde round-trip)
    assert repr(plan_from_json(plan_to_json(plan))) == expected


def test_select_no_relation():
    quick_test("SELECT 1", "Projection: Int64(1)\n  EmptyRelation")


def test_select_scalar_func_with_literal_no_relation():
    quick_test(
        "SELECT sqrt(9)",
        "Projection: sqrt(CAST(Int64(9) AS Float64))\n  EmptyRelation",
    )


def test_select_simple_selection():
    quick_test(
        "SELECT id, first_name, last_name FROM person WHERE state = 'CO'",
        "Projection: #0, #1, #2\n"
        '  Selection: #4 Eq Utf8("CO")\n'
        "    TableScan: person projection=None",
    )


def test_select_compound_selection():
    quick_test(
        "SELECT id, first_name, last_name FROM person WHERE state = 'CO' AND age >= 21 AND age <= 65",
        "Projection: #0, #1, #2\n"
        '  Selection: #4 Eq Utf8("CO") And CAST(#3 AS Int64) GtEq Int64(21) And CAST(#3 AS Int64) LtEq Int64(65)\n'
        "    TableScan: person projection=None",
    )


def test_select_all_boolean_operators():
    quick_test(
        "SELECT age, first_name, last_name FROM person "
        "WHERE age = 21 AND age != 21 AND age > 21 AND age >= 21 AND age < 65 AND age <= 65",
        "Projection: #3, #1, #2\n"
        "  Selection: CAST(#3 AS Int64) Eq Int64(21) "
        "And CAST(#3 AS Int64) NotEq Int64(21) "
        "And CAST(#3 AS Int64) Gt Int64(21) "
        "And CAST(#3 AS Int64) GtEq Int64(21) "
        "And CAST(#3 AS Int64) Lt Int64(65) "
        "And CAST(#3 AS Int64) LtEq Int64(65)\n"
        "    TableScan: person projection=None",
    )


def test_select_simple_aggregate():
    quick_test(
        "SELECT MIN(age) FROM person",
        "Aggregate: groupBy=[[]], aggr=[[MIN(#3)]]\n  TableScan: person projection=None",
    )


def test_sum_aggregate():
    quick_test(
        "SELECT SUM(age) from person",
        "Aggregate: groupBy=[[]], aggr=[[SUM(#3)]]\n  TableScan: person projection=None",
    )


def test_select_simple_aggregate_with_groupby():
    quick_test(
        "SELECT state, MIN(age), MAX(age) FROM person GROUP BY state",
        "Aggregate: groupBy=[[#4]], aggr=[[MIN(#3), MAX(#3)]]\n"
        "  TableScan: person projection=None",
    )


def test_select_count_one():
    quick_test(
        "SELECT COUNT(1) FROM person",
        "Aggregate: groupBy=[[]], aggr=[[COUNT(#0)]]\n  TableScan: person projection=None",
    )


def test_select_count_star():
    quick_test(
        "SELECT COUNT(*) FROM person",
        "Aggregate: groupBy=[[]], aggr=[[COUNT(#0)]]\n  TableScan: person projection=None",
    )


def test_select_scalar_func():
    quick_test(
        "SELECT sqrt(age) FROM person",
        "Projection: sqrt(CAST(#3 AS Float64))\n  TableScan: person projection=None",
    )


def test_select_order_by():
    quick_test(
        "SELECT id FROM person ORDER BY id",
        "Sort: #0 ASC\n  Projection: #0\n    TableScan: person projection=None",
    )


def test_select_order_by_desc():
    quick_test(
        "SELECT id FROM person ORDER BY id DESC",
        "Sort: #0 DESC\n  Projection: #0\n    TableScan: person projection=None",
    )


def test_select_order_limit():
    quick_test(
        "SELECT id FROM person ORDER BY id DESC LIMIT 10",
        "Limit: 10\n  Sort: #0 DESC\n    Projection: #0\n      TableScan: person projection=None",
    )


def test_select_limit():
    quick_test(
        "SELECT id FROM person LIMIT 10",
        "Limit: 10\n  Projection: #0\n    TableScan: person projection=None",
    )


def test_having_not_implemented():
    with pytest.raises(PlanError):
        SqlToRel(MockSchemaProvider()).sql_to_rel(
            parse_sql("SELECT age FROM person HAVING age > 21")
        )


def test_no_supertype_errors():
    with pytest.raises(PlanError, match="supertype"):
        SqlToRel(MockSchemaProvider()).sql_to_rel(
            parse_sql("SELECT id FROM person WHERE first_name = 21")
        )


def test_unknown_table_errors():
    with pytest.raises(PlanError, match="no schema found"):
        SqlToRel(MockSchemaProvider()).sql_to_rel(parse_sql("SELECT x FROM nope"))


def test_join_plan():
    # beyond the reference: JOIN planning (its 0.7.0 roadmap)
    planner = SqlToRel(MockSchemaProvider())
    plan = planner.sql_to_rel(
        parse_sql(
            "SELECT person.id, orders.amount FROM person "
            "JOIN orders ON person.id = orders.person_id"
        )
    )
    r = repr(plan)
    assert "Join: type=Inner, on=[#0 = #1]" in r
    assert r.startswith("Projection: #0, #8")


def test_wildcard_expansion():
    planner = SqlToRel(MockSchemaProvider())
    plan = planner.sql_to_rel(parse_sql("SELECT * FROM person"))
    assert repr(plan).startswith("Projection: #0, #1, #2, #3, #4, #5")
