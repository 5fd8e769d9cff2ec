"""Geospatial host-stage UDFs and the reference docker smoketest.

The reference console registered ST_Point / ST_AsText UDFs (commented
out at main.rs:123-125) and its dockerized smoketest diffed the console
output of test/data/smoketest.sql against test/data/smoketest-expected.txt
(reference: scripts/smoketest.sh:76-96). Here the full smoketest runs
in-process and must match the reference golden byte-for-byte (modulo the
`diff -bBZ` whitespace rules the reference used).
"""

import io
import re

import numpy as np

from datafusion_tpu import DataType as D, ExecutionContext, Field, Schema, Table
from datafusion_tpu.console.main import Console
from datafusion_tpu.errors import ExecutionError
from datafusion_tpu.ops.functions import register_geospatial


def make_ctx():
    ctx = ExecutionContext()
    register_geospatial(ctx)
    return ctx


def register_cities(ctx, data_dir):
    schema = Schema(
        [
            Field("city", D.Utf8, False),
            Field("lat", D.Float64, False),
            Field("lng", D.Float64, False),
        ]
    )
    ctx.register_csv("uk_cities", str(data_dir / "uk_cities.csv"), schema, has_header=False)


def test_st_point_struct_output(data_dir):
    ctx = make_ctx()
    register_cities(ctx, data_dir)
    out = ctx.sql("SELECT ST_Point(lat, lng) FROM uk_cities WHERE lat > 57.5")
    rows = out.column_values(0)
    assert rows == [(57.653484, -3.335724)]
    # Struct Debug rendering (the reference's ScalarValue::Struct was
    # unimplemented!; this is our documented extension)
    assert out.result_str() == "Struct([Float64(57.653484), Float64(-3.335724)])\n"


def test_st_astext(data_dir):
    ctx = make_ctx()
    register_cities(ctx, data_dir)
    out = ctx.sql(
        "SELECT ST_AsText(ST_Point(lat, lng)) FROM uk_cities WHERE lat > 57.5"
    )
    assert out.display_str() == "POINT (57.653484 -3.335724)\n"
    # Debug rendering quotes the Utf8 (tests/sql.rs result_str convention)
    assert out.result_str() == '"POINT (57.653484 -3.335724)"\n'


def test_host_fn_mixed_with_device_columns(data_dir):
    ctx = make_ctx()
    register_cities(ctx, data_dir)
    out = ctx.sql(
        "SELECT city, ST_AsText(ST_Point(lat, lng)), lat + 1.0 "
        "FROM uk_cities WHERE lat > 57.5"
    )
    vals = out.to_pylist()[0]
    assert list(vals.values())[0] == "Elgin, Scotland, the UK"
    assert list(vals.values())[1] == "POINT (57.653484 -3.335724)"
    np.testing.assert_allclose(list(vals.values())[2], 58.653484)


def test_host_fn_under_limit_and_order_by(data_dir):
    # Limit/Sort wrappers above the projection: split pushes through them
    ctx = make_ctx()
    register_cities(ctx, data_dir)
    out = ctx.sql(
        "SELECT lat, ST_AsText(ST_Point(lat, lng)) FROM uk_cities "
        "ORDER BY lat DESC LIMIT 2"
    )
    assert out.display_str() == (
        "57.653484\tPOINT (57.653484 -3.335724)\n"
        "57.477772\tPOINT (57.477772 -4.224721)\n"
    )
    only_limit = ctx.sql(
        "SELECT ST_AsText(ST_Point(lat, lng)) FROM uk_cities WHERE lat > 57 LIMIT 1"
    )
    assert only_limit.num_rows == 1


def test_order_by_host_result_rejected(data_dir):
    ctx = make_ctx()
    register_cities(ctx, data_dir)
    try:
        ctx.sql("SELECT ST_AsText(ST_Point(lat, lng)) FROM uk_cities ORDER BY 1")
    except ExecutionError as e:
        assert "ORDER BY" in str(e)
    else:
        raise AssertionError("expected ORDER BY host-result error")


def test_host_fn_inside_device_expr_rejected(data_dir):
    ctx = make_ctx()
    register_cities(ctx, data_dir)
    try:
        ctx.sql("SELECT ST_Point(lat, lng) FROM uk_cities WHERE ST_AsText(ST_Point(lat, lng)) IS NOT NULL")
    except ExecutionError as e:
        assert "host function" in str(e)
    else:
        raise AssertionError("expected host-function placement error")


def test_smoketest_golden(data_dir, tmp_path):
    """Full reference smoketest: script mode + ref-output format, diffed
    against the reference's expected file with diff -bBZ semantics
    (ignore trailing whitespace and blank lines)."""
    ref_sql = (data_dir / "smoketest.sql").read_text()
    # the reference ran inside docker with the fixture at /test/data;
    # point LOCATION at our copy of the same file
    sql = ref_sql.replace("/test/data/uk_cities.csv", str(data_dir / "uk_cities.csv"))
    script = tmp_path / "smoketest.sql"
    script.write_text(sql)

    out = io.StringIO()
    print("DataFusion Console", file=out)  # main() banner, reference main.rs:86
    console = Console(out=out, ref_output=True)
    console.run_script(str(script))

    def norm(text: str) -> list[str]:
        lines = [re.sub(r"[ \t]+$", "", l) for l in text.splitlines()]
        return [l for l in lines if l]

    expected = (data_dir / "smoketest-expected.txt").read_text()
    assert norm(out.getvalue()) == norm(expected)
