"""Empty-table edge cases: aggregates over zero rows, empty files,
empty filter results feeding joins and sorts."""

import numpy as np

from datafusion_tpu import DataType as D, ExecutionContext, Field, Schema, Table, read_csv


def empty_ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "e",
        Table.from_pydict(
            {"k": np.array([], np.int32), "v": np.array([], np.float64)}
        ),
    )
    return ctx


def test_scan_empty():
    assert empty_ctx().sql("SELECT k, v FROM e").num_rows == 0


def test_aggregate_empty():
    out = empty_ctx().sql("SELECT COUNT(v), MIN(v), MAX(v), SUM(v) FROM e").result_str()
    # COUNT = 0; MIN/MAX/SUM over nothing are NULL/0-count-gated
    assert out.startswith("0\tNULL\tNULL")


def test_group_by_empty():
    assert empty_ctx().sql("SELECT k, COUNT(v) FROM e GROUP BY k").num_rows == 0


def test_sort_limit_empty():
    assert empty_ctx().sql("SELECT v FROM e ORDER BY v LIMIT 5").num_rows == 0


def test_join_with_empty_side():
    ctx = empty_ctx()
    ctx.register_table(
        "t", Table.from_pydict({"k": np.array([1, 2], np.int32)})
    )
    assert ctx.sql("SELECT t.k FROM t JOIN e ON t.k = e.k").num_rows == 0
    out = ctx.sql(
        "SELECT t.k, e.v FROM t LEFT JOIN e ON t.k = e.k ORDER BY k"
    ).result_str()
    assert out == "1\tNULL\n2\tNULL\n"


def test_empty_csv(tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("a,b\n")
    schema = Schema([Field("a", D.Int32, False), Field("b", D.Float64, False)])
    t = read_csv(str(p), schema, has_header=True)
    assert t.num_rows == 0
    ctx = ExecutionContext()
    ctx.register_table("x", t)
    assert ctx.sql("SELECT COUNT(*) FROM x").result_str() == "0\n"
