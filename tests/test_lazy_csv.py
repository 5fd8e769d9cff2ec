"""Lazy CSV scans: projection push-down reaches ingest (VERDICT r3
next #6). Registration runs only the row-count/index pass; queries
parse exactly the columns their narrowed TableScans reference."""

import numpy as np
import pytest

from datafusion_tpu import DataType as D, ExecutionContext, Field, Schema


NCOLS = 10


@pytest.fixture()
def wide_csv(tmp_path):
    rng = np.random.default_rng(6)
    n = 500
    p = tmp_path / "wide.csv"
    cols = [rng.random(n) * 100 for _ in range(NCOLS)]
    with open(p, "w") as f:
        f.write(",".join(f"c{j}" for j in range(NCOLS)) + "\n")
        for i in range(n):
            f.write(",".join(f"{cols[j][i]:.6f}" for j in range(NCOLS)) + "\n")
    schema = Schema([Field(f"c{j}", D.Float64, False) for j in range(NCOLS)])
    return str(p), schema, cols


def test_lazy_registration_parses_nothing(wide_csv):
    path, schema, _ = wide_csv
    ctx = ExecutionContext()
    ctx.register_csv("w", path, schema)
    t = ctx._tables["w"]
    assert hasattr(t, "materialized_columns")
    assert t.materialized_columns() == []
    assert t.num_rows == 500


def test_query_parses_only_scanned_columns(wide_csv):
    path, schema, cols = wide_csv
    ctx = ExecutionContext()
    ctx.register_csv("w", path, schema)
    out = ctx.sql("SELECT c2, c7 FROM w WHERE c2 > 50 ORDER BY c2 LIMIT 5")
    rows = out.to_pylist()
    t = ctx._tables["w"]
    assert t.materialized_columns() == [2, 7], t.materialized_columns()
    # the CSV carries 6-decimal roundings of the generator values
    want = sorted(float(f"{c:.6f}") for c in cols[2] if float(f"{c:.6f}") > 50)[:5]
    got = [r["c2"] for r in rows]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_join_narrows_each_side(wide_csv, tmp_path):
    path, schema, cols = wide_csv
    # second table: key + 3 payloads; join touches key + 1 payload
    p2 = tmp_path / "dim.csv"
    with open(p2, "w") as f:
        f.write("k,x,y,z\n")
        for i in range(50):
            f.write(f"{i},{i * 1.5},{i * 2.5},{i * 3.5}\n")
    dschema = Schema(
        [Field("k", D.Int32, False)] + [
            Field(nm, D.Float64, False) for nm in ("x", "y", "z")
        ]
    )
    ctx = ExecutionContext()
    ctx.register_csv("w", path, schema)
    ctx.register_csv("d", str(p2), dschema)
    # c0 casts to an int join key; only c0/c3 from w, k/y from d needed
    ctx.sql(
        "SELECT c3, y FROM w JOIN d ON CAST(c0 AS INT) = d.k WHERE c3 > 10"
    ).to_pylist()
    assert ctx._tables["w"].materialized_columns() == [0, 3]
    assert ctx._tables["d"].materialized_columns() == [0, 2]


def test_lazy_matches_eager_byte_exact(wide_csv):
    path, schema, _ = wide_csv
    lazy_ctx = ExecutionContext()
    lazy_ctx.register_csv("w", path, schema)
    eager_ctx = ExecutionContext()
    eager_ctx.register_csv("w", path, schema, lazy=False)
    for sql in (
        "SELECT c0, c5 + c6 FROM w WHERE c1 < 30 ORDER BY c0 LIMIT 20",
        "SELECT COUNT(c9), MIN(c4), MAX(c4) FROM w",
    ):
        assert lazy_ctx.sql(sql).result_str() == eager_ctx.sql(sql).result_str()


def test_lazy_utf8_and_nulls(tmp_path):
    p = tmp_path / "s.csv"
    with open(p, "w") as f:
        f.write("name,v,unused\nbeta,1,9\nalpha,,8\ngamma,3,7\n")
    schema = Schema(
        [
            Field("name", D.Utf8, False),
            Field("v", D.Int32, True),
            Field("unused", D.Int32, False),
        ]
    )
    ctx = ExecutionContext()
    ctx.register_csv("s", str(p), schema)
    rows = ctx.sql("SELECT name, v FROM s ORDER BY name").to_pylist()
    assert [r["name"] for r in rows] == ["alpha", "beta", "gamma"]
    assert rows[0]["v"] is None and rows[1]["v"] == 1
    assert ctx._tables["s"].materialized_columns() == [0, 1]
