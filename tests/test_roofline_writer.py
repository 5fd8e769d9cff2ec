"""Roofline accounting and CSV writer round-trip."""

import numpy as np

from datafusion_tpu import DataType as D, ExecutionContext, Field, Schema, Table, read_csv
from datafusion_tpu.utils.roofline import (
    achieved_fraction,
    filter_project_cost,
    roofline_seconds,
)


def test_roofline_math():
    cost = filter_project_cost(1_000_000, 8, 4)
    assert cost.bytes_total == 1_000_000 * 13
    t = roofline_seconds(cost, bw_gbps=819.0)
    assert abs(t - cost.bytes_total / 819e9) < 1e-12
    assert abs(achieved_fraction(cost, t, bw_gbps=819.0) - 1.0) < 1e-9


def test_csv_writer_roundtrip(tmp_path):
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "k": np.array([3, 1, 2], np.int32),
                "s": ["x,y", "b", 'q"z'],
                "v": np.array([1.5, 2.5, None is None and 3.5], np.float64),
            }
        ),
    )
    res = ctx.sql("SELECT k, s, v FROM t ORDER BY k")
    out = tmp_path / "out.csv"
    res.to_csv(str(out))
    schema = Schema(
        [Field("k", D.Int32, False), Field("s", D.Utf8, False), Field("v", D.Float64, False)]
    )
    back = read_csv(str(out), schema, has_header=True)
    assert back.num_rows == 3
    np.testing.assert_array_equal(
        back.columns[0].to_numpy(3).astype(np.int32), [1, 2, 3]
    )
    assert list(back.columns[1].to_numpy(3)) == ["b", 'q"z', "x,y"]
