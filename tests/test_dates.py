"""Date32 type (beyond the reference): days-since-epoch int32 on device,
so comparisons/sorts/groups/joins/MIN/MAX ride the integer image
(utils/dates.py)."""

import datetime
import os

import numpy as np
import pytest

from datafusion_tpu import (
    DataType as D,
    ExecutionContext,
    Field,
    Schema,
    Table,
    read_csv,
)
from datafusion_tpu.errors import PlanError
from datafusion_tpu.parallel.mesh import make_mesh


def make_ctx(mesh=None):
    ctx = ExecutionContext(mesh=mesh)
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "d": np.array(
                    ["2024-01-15", "2023-06-30", "2024-03-01", "2023-06-30"],
                    dtype="datetime64[D]",
                ),
                "v": np.array([1.0, 2.0, 3.0, 4.0]),
            }
        ),
    )
    return ctx


def test_date_comparisons_and_literals():
    ctx = make_ctx()
    out = ctx.sql("SELECT d, v FROM t WHERE d > DATE '2023-12-31' ORDER BY d").result_str()
    assert out == "2024-01-15\t1.0\n2024-03-01\t3.0\n"
    # bare string literal promotes to DATE against a Date32 column
    out = ctx.sql("SELECT d, v FROM t WHERE d = '2023-06-30' ORDER BY v").result_str()
    assert out == "2023-06-30\t2.0\n2023-06-30\t4.0\n"
    out = ctx.sql(
        "SELECT d FROM t WHERE d BETWEEN '2023-06-01' AND '2023-12-31'"
    ).result_str()
    assert out == "2023-06-30\n2023-06-30\n"


def test_date_aggregates_group_order():
    ctx = make_ctx()
    assert ctx.sql("SELECT MIN(d), MAX(d), COUNT(d) FROM t").result_str() == (
        "2023-06-30\t2024-03-01\t4\n"
    )
    assert ctx.sql("SELECT d, COUNT(v) FROM t GROUP BY d ORDER BY d").result_str() == (
        "2023-06-30\t2\n2024-01-15\t1\n2024-03-01\t1\n"
    )
    with pytest.raises(PlanError, match="not defined for DATE"):
        ctx.sql("SELECT SUM(d) FROM t")


def test_year_month_day_extraction():
    ctx = make_ctx()
    out = ctx.sql("SELECT d, YEAR(d), MONTH(d), DAY(d) FROM t ORDER BY d LIMIT 1").result_str()
    assert out == "2023-06-30\t2023\t6\t30\n"
    out = ctx.sql("SELECT YEAR(d) AS y, COUNT(v) FROM t GROUP BY y ORDER BY y").result_str()
    assert out == "2023\t2\n2024\t2\n"


def test_date_to_pylist_and_python_dates():
    ctx = make_ctx()
    r = ctx.sql("SELECT MIN(d) FROM t").to_pylist()
    assert list(r[0].values())[0] == datetime.date(2023, 6, 30)
    ctx.register_table(
        "p",
        Table.from_pydict({"d": [datetime.date(2020, 2, 29), datetime.date(1969, 12, 31)]}),
    )
    assert ctx.sql("SELECT d FROM p ORDER BY d").result_str() == (
        "1969-12-31\n2020-02-29\n"
    )


def test_date_csv_native_and_python_parity(tmp_path):
    p = tmp_path / "dates.csv"
    p.write_text("d,v\n2024-01-15,1.5\n,2.5\n1969-12-31,3.5\n")
    schema = Schema([Field("d", D.Date32, True), Field("v", D.Float64, False)])
    t_native = read_csv(str(p), schema, has_header=True)
    os.environ["DFTPU_NATIVE_CSV"] = "0"
    try:
        t_py = read_csv(str(p), schema, has_header=True)
    finally:
        del os.environ["DFTPU_NATIVE_CSV"]
    for t in (t_native, t_py):
        ctx = ExecutionContext()
        ctx.register_table("c", t)
        out = ctx.sql("SELECT d, v FROM c ORDER BY v").result_str()
        assert out == "2024-01-15\t1.5\nNULL\t2.5\n1969-12-31\t3.5\n"


def test_date_create_external_table(tmp_path):
    p = tmp_path / "dates.csv"
    p.write_text("d,v\n2024-01-15,1.5\n2023-06-30,2.5\n")
    ctx = ExecutionContext()
    ctx.sql(
        f"CREATE EXTERNAL TABLE e (d DATE, v DOUBLE) STORED AS CSV "
        f"WITH HEADER ROW LOCATION '{p}'"
    )
    assert ctx.sql("SELECT MAX(d) FROM e").result_str() == "2024-01-15\n"


def test_date_join_and_window():
    ctx = make_ctx()
    ctx.register_table(
        "h",
        Table.from_pydict(
            {
                "d": np.array(["2023-06-30", "2024-03-01"], dtype="datetime64[D]"),
                "name": ["summer", "spring"],
            }
        ),
    )
    out = ctx.sql(
        "SELECT t.v, h.name FROM t JOIN h ON t.d = h.d ORDER BY v"
    ).result_str()
    assert out == '2.0\t"summer"\n3.0\t"spring"\n4.0\t"summer"\n'
    out = ctx.sql(
        "SELECT d, v, ROW_NUMBER() OVER (PARTITION BY d ORDER BY v) AS rn "
        "FROM t ORDER BY d, v"
    ).result_str()
    assert out.splitlines()[1] == "2023-06-30\t4.0\t2"


def test_date_distributed_parity():
    sql = "SELECT d, COUNT(v) FROM t GROUP BY d ORDER BY d"
    assert make_ctx().sql(sql).result_str() == make_ctx(make_mesh()).sql(sql).result_str()
