"""Per-dtype conformance matrix over the reference's all_types_flat.csv
fixture (256 rows, one column per supported dtype — the corpus behind
the reference's test/data/expected/ goldens).

Engine results are checked against an independent numpy oracle with the
engine's documented semantics: truncated integer division/modulo (Rust),
cast-as-truncation, null-aware filters.
"""

import csv as _csv

import numpy as np
import pytest

from datafusion_tpu import DataType as D, ExecutionContext, Field, Schema, read_csv

COLS = [
    ("c_bool", D.Boolean),
    ("c_uint8", D.UInt8),
    ("c_uint16", D.UInt16),
    ("c_uint32", D.UInt32),
    ("c_uint64", D.UInt64),
    ("c_int8", D.Int8),
    ("c_int16", D.Int16),
    ("c_int32", D.Int32),
    ("c_int64", D.Int64),
    ("c_float32", D.Float32),
    ("c_float64", D.Float64),
    ("c_utf8", D.Utf8),
]

SCHEMA = Schema([Field(n, t, False) for n, t in COLS])


@pytest.fixture(scope="module")
def raw(data_dir):
    with open(data_dir / "all_types_flat.csv", newline="") as f:
        rows = list(_csv.reader(f))
    cols = {}
    for j, (name, dt) in enumerate(COLS):
        vals = [r[j] for r in rows]
        if dt is D.Boolean:
            cols[name] = np.array([v == "true" for v in vals])
        elif dt is D.Utf8:
            cols[name] = np.array(vals, dtype=object)
        else:
            cols[name] = np.array(vals, dtype=dt.to_np())
    return cols


@pytest.fixture(scope="module")
def ctx(data_dir):
    c = ExecutionContext()
    c.register_csv("t", str(data_dir / "all_types_flat.csv"), SCHEMA, has_header=False)
    return c


NUMERIC = [n for n, t in COLS if t.is_numeric]
INTS = [n for n, t in COLS if t.is_integer]


def col_of(res, j=0):
    return res.column_values(j)


@pytest.mark.parametrize("name", NUMERIC)
@pytest.mark.parametrize("op,npop", [
    (">", np.greater), ("<", np.less), (">=", np.greater_equal),
    ("<=", np.less_equal), ("=", np.equal), ("!=", np.not_equal),
])
def test_comparisons_vs_literal(ctx, raw, name, op, npop):
    data = raw[name]
    pivot = np.sort(data)[len(data) // 2]
    lit = repr(float(pivot)) if "float" in name else str(int(pivot))
    res = ctx.sql(f"SELECT {name} FROM t WHERE {name} {op} {lit}")
    got = np.asarray(col_of(res), dtype=data.dtype)
    want = data[npop(data.astype(np.float64), float(pivot))]
    np.testing.assert_array_equal(got, want)


# c_uint16 vs c_int8 has no supertype in the reference's lattice
# (logicalplan.rs only defines UInt16×{Int16,Int32,Int64}) — faithful error.
@pytest.mark.parametrize("name", ["c_int8", "c_int32", "c_int16", "c_float64"])
def test_col_vs_col_comparison(ctx, raw, name):
    res = ctx.sql(f"SELECT {name} FROM t WHERE {name} > c_int8")
    want = raw[name][raw[name].astype(np.float64) > raw["c_int8"].astype(np.float64)]
    got = np.asarray(col_of(res), dtype=raw[name].dtype)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", NUMERIC)
@pytest.mark.parametrize("target,npdt", [
    ("smallint", np.int16), ("int", np.int32), ("bigint", np.int64), ("double", np.float64),
])
def test_casts(ctx, raw, name, target, npdt):
    res = ctx.sql(f"SELECT CAST({name} AS {target}) FROM t")
    got = np.asarray(col_of(res), dtype=npdt)
    # Rust `as` semantics: trunc toward zero for float→int, wrap for int→int
    src = raw[name]
    if np.issubdtype(src.dtype, np.floating) and np.issubdtype(npdt, np.integer):
        want = np.trunc(src).astype(npdt)
    else:
        want = src.astype(npdt)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("op,sym", [("plus", "+"), ("minus", "-"), ("multiply", "*")])
@pytest.mark.parametrize("name", ["c_int8", "c_int32", "c_uint8", "c_float32", "c_float64"])
def test_arithmetic_same_col(ctx, raw, name, op, sym):
    res = ctx.sql(f"SELECT {name} {sym} {name} FROM t")
    src = raw[name]
    with np.errstate(over="ignore"):
        want = {"plus": src + src, "minus": src - src, "multiply": src * src}[op]
    got = np.asarray(col_of(res), dtype=src.dtype)
    np.testing.assert_array_equal(got, want)


def test_integer_division_truncates(ctx, raw):
    res = ctx.sql("SELECT c_int32 / c_int8 FROM t WHERE c_int8 != 0")
    a = raw["c_int32"][raw["c_int8"] != 0]
    b = raw["c_int8"][raw["c_int8"] != 0].astype(np.int32)
    # Rust/C semantics: trunc toward zero (numpy // floors)
    want = (np.sign(a) * np.sign(b)) * (np.abs(a) // np.abs(b).astype(np.int32))
    got = np.asarray(col_of(res), dtype=np.int32)
    np.testing.assert_array_equal(got, want)


def test_modulus_truncated(ctx, raw):
    res = ctx.sql("SELECT c_int32 % c_int8 FROM t WHERE c_int8 != 0")
    a = raw["c_int32"][raw["c_int8"] != 0]
    b = raw["c_int8"][raw["c_int8"] != 0].astype(np.int32)
    want = a - (np.sign(a) * np.sign(b)) * (np.abs(a) // np.abs(b)) * b  # C-style rem
    got = np.asarray(col_of(res), dtype=np.int32)
    np.testing.assert_array_equal(got, want)


def test_float_division(ctx, raw):
    res = ctx.sql("SELECT c_float64 / c_float32 FROM t")
    want = raw["c_float64"] / raw["c_float32"].astype(np.float64)
    got = np.asarray(col_of(res), dtype=np.float64)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("name", ["c_int8", "c_uint16", "c_int64", "c_float32", "c_float64"])
def test_min_max_sum_whole_column(ctx, raw, name):
    res = ctx.sql(f"SELECT MIN({name}), MAX({name}), COUNT({name}) FROM t")
    got_min, got_max, got_cnt = (res.column_values(j)[0] for j in range(3))
    src = raw[name]
    assert got_min == src.min()
    assert got_max == src.max()
    assert got_cnt == len(src)


def test_group_by_bool(ctx, raw):
    res = ctx.sql(
        "SELECT c_bool, COUNT(c_int32), MIN(c_int32), MAX(c_int32) FROM t GROUP BY c_bool ORDER BY c_bool"
    )
    rows = res.to_pylist()
    for row in rows:
        m = raw["c_bool"] == row["c_bool"]
        assert row["COUNT"] == m.sum()
        assert row["MIN"] == raw["c_int32"][m].min()
        assert row["MAX"] == raw["c_int32"][m].max()


def test_group_by_string_min_max(ctx, raw):
    # strings: every value distinct → every group size 1
    res = ctx.sql("SELECT c_utf8, COUNT(c_utf8) FROM t GROUP BY c_utf8")
    assert res.num_rows == len(set(raw["c_utf8"]))


def test_order_by_each_dtype(ctx, raw):
    for name in ("c_int16", "c_uint64", "c_float32", "c_utf8"):
        res = ctx.sql(f"SELECT {name} FROM t ORDER BY {name}")
        got = col_of(res)
        want = sorted(raw[name])
        assert list(got) == list(want), name
        res_d = ctx.sql(f"SELECT {name} FROM t ORDER BY {name} DESC")
        assert list(col_of(res_d)) == list(reversed(want)), name


def test_limit_exact(ctx, raw):
    for k in (0, 1, 17, 256, 1000):
        res = ctx.sql(f"SELECT c_int32 FROM t LIMIT {k}")
        assert res.num_rows == min(k, 256)
        np.testing.assert_array_equal(
            np.asarray(col_of(res)), raw["c_int32"][: min(k, 256)]
        )


def test_boolean_column_filter(ctx, raw):
    res = ctx.sql("SELECT c_int8 FROM t WHERE c_bool = c_bool")
    assert res.num_rows == 256
