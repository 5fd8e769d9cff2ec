"""CREATE TABLE AS SELECT, DROP TABLE, SHOW TABLES, DESCRIBE — catalog
statements beyond the reference (whose PhysicalPlan::Show was vestigial,
physicalplan.rs:31-33)."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.errors import PlanError
from datafusion_tpu.schema import Field, Schema
from datafusion_tpu.types import DataType


def make_ctx(mesh=None):
    ctx = ExecutionContext(mesh=mesh)
    ctx.register_table(
        "t",
        Table.from_pydict(
            {"g": ["a", "a", "b", "b"], "v": np.array([1.0, 2.0, 3.0, 4.0])}
        ),
    )
    return ctx


def test_ctas_roundtrip():
    ctx = make_ctx()
    ctx.sql("CREATE TABLE agg AS SELECT g, SUM(v) AS total FROM t GROUP BY g")
    assert (
        ctx.sql("SELECT g, total FROM agg ORDER BY g").result_str()
        == '"a"\t3.0\n"b"\t7.0\n'
    )
    # the CTAS table joins like any other
    out = ctx.sql(
        "SELECT t.g, v, total FROM t JOIN agg ON t.g = agg.g ORDER BY v"
    ).result_str()
    assert out.splitlines()[0] == '"a"\t1.0\t3.0'


def test_ctas_preserves_nulls_and_dates():
    ctx = ExecutionContext()
    t = Table.from_arrays(
        Schema([Field("x", DataType.Float64, True), Field("d", DataType.Date32)]),
        [
            np.array([1.0, 0.0, 3.0]),
            np.array(["2021-01-01", "2021-06-15", "2022-03-03"], "datetime64[D]"),
        ],
        validity=[np.array([True, False, True]), None],
    )
    ctx.register_table("t2", t)
    ctx.sql("CREATE TABLE c2 AS SELECT x, d, YEAR(d) AS y FROM t2")
    assert (
        ctx.sql("SELECT x, d, y FROM c2 ORDER BY d").result_str()
        == "1.0\t2021-01-01\t2021\nNULL\t2021-06-15\t2021\n3.0\t2022-03-03\t2022\n"
    )


def test_ctas_with_cte_and_setop():
    ctx = make_ctx()
    ctx.sql(
        "CREATE TABLE u AS WITH lo AS (SELECT v FROM t WHERE v < 3) "
        "SELECT v FROM t EXCEPT SELECT v FROM lo"
    )
    assert sorted(ctx.sql("SELECT v FROM u").result_str().splitlines()) == [
        "3.0",
        "4.0",
    ]


def test_show_tables_and_describe():
    ctx = make_ctx()
    ctx.sql("CREATE TABLE agg AS SELECT g, SUM(v) AS total FROM t GROUP BY g")
    assert ctx.sql("SHOW TABLES").result_str() == '"agg"\n"t"\n'
    assert (
        ctx.sql("DESCRIBE agg").result_str()
        == '"g"\t"Utf8"\t"YES"\n"total"\t"Float64"\t"YES"\n'
    )
    with pytest.raises(PlanError):
        ctx.sql("DESCRIBE nope")


def test_drop_table():
    ctx = make_ctx()
    ctx.sql("CREATE TABLE c AS SELECT v FROM t")
    ctx.sql("DROP TABLE c")
    assert ctx.sql("SHOW TABLES").result_str() == '"t"\n'
    ctx.sql("DROP TABLE IF EXISTS c")  # no error
    with pytest.raises(PlanError):
        ctx.sql("DROP TABLE c")
    with pytest.raises(PlanError):
        ctx.sql("SELECT v FROM c")


def test_ctas_distributed_mesh():
    from datafusion_tpu.parallel.mesh import make_mesh

    ctx = make_ctx(mesh=make_mesh())
    ctx.sql("CREATE TABLE agg AS SELECT g, SUM(v) AS total FROM t GROUP BY g")
    out = ctx.sql("SELECT g, total FROM agg ORDER BY g").result_str()
    assert out == '"a"\t3.0\n"b"\t7.0\n'


def test_ddl_has_no_plan():
    ctx = make_ctx()
    with pytest.raises(PlanError):
        ctx.plan("SHOW TABLES")
    with pytest.raises(PlanError):
        ctx.sql("EXPLAIN DROP TABLE t")


def test_join_on_float_keys():
    # float join keys ride their order-preserving int image
    # (ops/join.py _normalize_keys); -0.0 must equal +0.0
    ctx = ExecutionContext()
    ctx.register_table(
        "a",
        Table.from_pydict(
            {"x": np.array([1.5, -0.0, 2.25, 9.0]), "i": np.array([1, 2, 3, 4], np.int32)}
        ),
    )
    ctx.register_table(
        "b",
        Table.from_pydict(
            {"y": np.array([0.0, 2.25, 1.5]), "j": np.array([10, 20, 30], np.int32)}
        ),
    )
    out = ctx.sql("SELECT i, j FROM a JOIN b ON a.x = b.y ORDER BY i").result_str()
    assert out == "1\t30\n2\t10\n3\t20\n"


def test_insert_values_and_select():
    ctx = ExecutionContext()
    ctx.register_table(
        "t", Table.from_pydict({"g": ["x", "y"], "v": np.array([1.0, 2.0])})
    )
    ctx.sql("INSERT INTO t VALUES ('z', 3.5), ('w', 4)")
    assert (
        ctx.sql("SELECT g, v FROM t ORDER BY v").result_str()
        == '"x"\t1.0\n"y"\t2.0\n"z"\t3.5\n"w"\t4.0\n'
    )
    # reordered column list
    ctx.sql("INSERT INTO t (v, g) VALUES (9, 'q')")
    assert '"q"\t9.0\n' in ctx.sql("SELECT g, v FROM t ORDER BY v").result_str()
    # INSERT ... SELECT (self-referential reads the pre-insert snapshot)
    ctx.sql("INSERT INTO t SELECT g, v * 10 FROM t WHERE v < 2")
    assert (
        ctx.sql("SELECT COUNT(v) FROM t").result_str() == "6\n"
    )


def test_insert_preserves_nulls_and_temporals():
    import datetime

    from datafusion_tpu.schema import Field, Schema
    from datafusion_tpu.types import DataType

    ctx = ExecutionContext()
    t = Table.from_arrays(
        Schema([Field("x", DataType.Float64, True), Field("d", DataType.Date32)]),
        [np.array([1.0, 0.0]), np.array(["2021-01-01", "2021-06-15"], "datetime64[D]")],
        validity=[np.array([True, False]), None],
    )
    ctx.register_table("t", t)
    ctx.sql("INSERT INTO t VALUES (7.5, DATE '2022-02-02')")
    assert (
        ctx.sql("SELECT x, d FROM t ORDER BY d").result_str()
        == "1.0\t2021-01-01\nNULL\t2021-06-15\n7.5\t2022-02-02\n"
    )


def test_insert_errors():
    ctx = ExecutionContext()
    ctx.register_table(
        "t", Table.from_pydict({"g": ["x"], "v": np.array([1.0])})
    )
    with pytest.raises(PlanError):
        ctx.sql("INSERT INTO t VALUES ('only-one')")
    with pytest.raises(PlanError):
        ctx.sql("INSERT INTO t (g) VALUES ('partial')")  # must cover all cols
    with pytest.raises(PlanError):
        ctx.sql("INSERT INTO missing VALUES (1, 2)")


def test_values_statement_and_string_literal_projection():
    ctx = ExecutionContext()
    assert ctx.sql("VALUES (1, 'a'), (2, 'b')").result_str() == '1\t"a"\n2\t"b"\n'
    ctx.register_table("t", Table.from_pydict({"v": np.array([1.0, 2.0])}))
    assert (
        ctx.sql("SELECT 'tag', v FROM t ORDER BY v").result_str()
        == '"tag"\t1.0\n"tag"\t2.0\n'
    )
