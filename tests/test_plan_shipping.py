"""Self-contained serialized plans (VERDICT r3 next #7): a plan
serialized in one context carries {file_type, path, has_header} on its
TableScans and executes in a FRESH context with no registered tables —
the reference's plan-shipping groundwork (DataSourceMeta,
datasource.rs:78-93; PhysicalPlan, physicalplan.rs:18-34) made real."""

import json

import numpy as np
import pytest

from datafusion_tpu import DataType as D, ExecutionContext, Field, Schema


def test_ship_csv_plan_to_fresh_context(data_dir):
    src = ExecutionContext()
    src.register_csv(
        "cities",
        str(data_dir / "uk_cities.csv"),
        Schema(
            [
                Field("city", D.Utf8, False),
                Field("lat", D.Float64, False),
                Field("lng", D.Float64, False),
            ]
        ),
        has_header=False,
    )
    sql = "SELECT city, lat FROM cities WHERE lat > 52 ORDER BY lat LIMIT 5"
    shipped = src.serialize_plan(sql)
    want = src.sql(sql).result_str()

    fresh = ExecutionContext()
    assert fresh._tables == {}
    got = fresh.execute_plan_json(shipped).result_str()
    assert got == want
    # the fresh context loaded the file from the embedded metadata
    assert "cities" in fresh._tables


def test_shipped_json_names_the_source(data_dir):
    src = ExecutionContext()
    src.register_csv(
        "cities",
        str(data_dir / "uk_cities.csv"),
        Schema([Field("city", D.Utf8, False), Field("lat", D.Float64, False),
                Field("lng", D.Float64, False)]),
        has_header=False,
    )
    shipped = json.loads(src.serialize_plan("SELECT city FROM cities"))

    def find_scan(d):
        (kind, body), = d.items()
        if kind == "TableScan":
            return body
        for key in ("input", "left", "right"):
            if key in body:
                r = find_scan(body[key])
                if r:
                    return r
        return None

    scan = find_scan(shipped)
    assert scan["source"]["file_type"] == "csv"
    assert scan["source"]["has_header"] is False
    assert scan["source"]["path"].endswith("uk_cities.csv")


def test_ship_parquet_plan(data_dir):
    pytest.importorskip("pyarrow")
    src = ExecutionContext()
    src.register_parquet("p", str(data_dir / "alltypes_plain.parquet"))
    sql = "SELECT id, int_col FROM p ORDER BY id LIMIT 4"
    shipped = src.serialize_plan(sql)
    want = src.sql(sql).result_str()
    fresh = ExecutionContext()
    assert fresh.execute_plan_json(shipped).result_str() == want


def test_in_memory_table_plan_still_needs_registration():
    src = ExecutionContext()
    from datafusion_tpu import Table

    src.register_table(
        "m", Table.from_pydict({"a": np.arange(4, dtype=np.int32)})
    )
    shipped = src.serialize_plan("SELECT a FROM m")
    fresh = ExecutionContext()
    from datafusion_tpu.errors import ExecutionError

    with pytest.raises(ExecutionError):
        fresh.execute_plan_json(shipped)
