"""Byte-exact diff against the reference's 66 per-dtype goldens
(reference: test/data/expected/*.csv — copied verbatim into
tests/data/expected/ per SURVEY.md §4).

No code in the reference tree references these files (they are leftovers
of a prior, larger suite — SURVEY.md §4 item 5), so each golden's query
is RECONSTRUCTED here from its filename and verified empirically against
the fixture data (all_types_flat.csv/.parquet, numerics.csv, people.csv,
null_test.csv, uk_cities.csv). The goldens render with Rust `{}` Display
semantics (comma-separated, unquoted strings, integral floats without a
trailing .0) — the era suite's ResultSet writer, distinct from the
tab + `{:?}` format of tests/sql.rs that `result_str` reproduces.

Documented deviations (era-engine artifacts we do NOT reproduce):
* csv_aggregate_all_types / parquet_aggregate_all_types field 25
  (MAX(c_utf8)) equals field 24 (the MIN) in the goldens — the era
  engine's ungrouped Utf8 MAX returned the MIN (the grouped golden
  csv_aggregate_by_c_bool has correct per-group maxes, which we match
  byte-exactly). We assert the TRUE max instead.
* parquet_aggregate_all_types SUM(c_int32) is pinned to 2147483647
  (i32::MAX — an era saturation artifact; the true sum is 14391145127)
  and SUM(c_int64) to 269433464379590488 (unexplained; the true sum
  overflows int64 and wraps to 6977084541914051495, which is what this
  engine computes). We assert the arithmetically-derived values.
* parquet_aggregate_all_types SUM(c_float32)/SUM(c_float64) are
  reduction-order-sensitive (the era engine summed sequentially; XLA
  reduces in a tree — BASELINE.md documents float sums as
  tolerance-compared by design): compared at 1e-5 relative tolerance.
"""

import math

import pytest

from datafusion_tpu import DataType as D, ExecutionContext, Field, Schema
from datafusion_tpu.ops.functions import register_geospatial
from datafusion_tpu.utils.fmt import rust_f32, rust_f64

ALL_TYPES_COLS = [
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

# true MAX(c_utf8) (the goldens repeat the MIN here — see module doc)
_TRUE_UTF8_MAX = "ힼઠ靶ゾ瀹蠓藋쫰䌩鸤휛䣧翹굗㪁迾뉪ꖈƋ屍"


def _display(dt, v) -> str:
    """Rust `{}` Display for one cell (the era goldens' format)."""
    if v is None:
        return ""
    if dt is D.Utf8:
        return str(v)
    if dt is D.Boolean:
        return "true" if v else "false"
    if dt is D.Struct:
        # the era's Point UDT Display: "{lat}, {lng}"
        return ", ".join(_strip_dot0(rust_f64(float(x))) for x in v)
    if dt is D.Float32:
        return _strip_dot0(rust_f32(float(v)))
    if dt is D.Float64:
        return _strip_dot0(rust_f64(float(v)))
    return str(int(v))


def _strip_dot0(s: str) -> str:
    # Rust {} prints 2.0f64 as "2" where {:?} prints "2.0"
    return s[:-2] if s.endswith(".0") else s


def _render(res) -> str:
    colvals = [res.column_values(j) for j in range(res.num_columns)]
    dts = [f.dtype for f in res.schema.fields]
    lines = []
    for i in range(res.num_rows):
        lines.append(
            ",".join(_display(dts[j], colvals[j][i]) for j in range(res.num_columns))
        )
    return "".join(line + "\n" for line in lines)


@pytest.fixture(scope="module")
def gctx(data_dir):
    ctx = ExecutionContext()
    register_geospatial(ctx)
    ctx.register_csv(
        "t",
        str(data_dir / "all_types_flat.csv"),
        Schema([Field(n, t, False) for n, t in ALL_TYPES_COLS]),
        has_header=False,
    )
    ctx.register_parquet("p", str(data_dir / "all_types_flat.parquet"))
    num32 = Schema(
        [
            Field("a", D.Int32, False),
            Field("b", D.Int32, False),
            Field("a_f", D.Float32, False),
            Field("b_f", D.Float32, False),
        ]
    )
    num64 = Schema(
        [
            Field("a", D.Int64, False),
            Field("b", D.Int64, False),
            Field("a_f", D.Float64, False),
            Field("b_f", D.Float64, False),
        ]
    )
    ctx.register_csv("num", str(data_dir / "numerics.csv"), num32, has_header=True)
    ctx.register_csv("num64", str(data_dir / "numerics.csv"), num64, has_header=True)
    ctx.register_csv(
        "people",
        str(data_dir / "people.csv"),
        Schema([Field("id", D.Int32, False), Field("first_name", D.Utf8, False)]),
        has_header=True,
    )
    ctx.register_csv(
        "null_test",
        str(data_dir / "null_test.csv"),
        Schema(
            [
                Field("c_int", D.Int32, False),
                Field("c_float", D.Float64, True),
                Field("c_string", D.Utf8, True),
                Field("c_bool", D.Boolean, False),
            ]
        ),
        has_header=True,
    )
    ctx.register_csv(
        "uk_cities",
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
    return ctx


def _minmax_list(cols):
    return ", ".join(f"MIN({c}), MAX({c})" for c in cols)


_AGG_COLS = [n for n, _ in ALL_TYPES_COLS if n != "c_bool"]
_AGG_SELECT = (
    "SELECT COUNT(c_bool), COUNT(c_utf8), MIN(c_bool), MAX(c_bool), "
    + _minmax_list(_AGG_COLS)
)
_AGG_QUERY = _AGG_SELECT + " FROM {src}"
_SUM_TAIL = (
    ", SUM(CAST(c_int8 AS bigint)), SUM(CAST(c_int16 AS bigint)), "
    "SUM(CAST(c_int32 AS bigint)), SUM(CAST(c_int64 AS bigint)), "
    "SUM(CAST(c_uint8 AS bigint)), SUM(CAST(c_uint16 AS bigint)), "
    "SUM(CAST(c_uint32 AS bigint)), SUM(CAST(c_uint64 AS bigint)), "
    "SUM(c_float32), SUM(c_float64)"
)

# (golden file, reconstructed query, field patches, float-tol fields)
CASES: list = []


def _case(name, query, patches=None, float_tol=()):
    CASES.append((name, query, patches or {}, tuple(float_tol)))


for ty in ("int8", "int16", "int32", "int64"):
    _case(f"c_{ty}_negative", f"SELECT c_{ty} FROM t WHERE c_{ty} < 0")
    _case(f"c_{ty}_positive", f"SELECT c_{ty} FROM t WHERE c_{ty} >= 0")
    _case(f"c_{ty}_cast", f"SELECT CAST(c_{ty} AS bigint) FROM t WHERE c_{ty} < 0")
for ty in ("uint8", "uint16", "uint32", "uint64"):
    _case(f"c_{ty}_cast", f"SELECT CAST(c_{ty} AS bigint) FROM t")

_case("c_float32_high", "SELECT c_float32 FROM t WHERE c_float32 > 0.5")
_case("c_float32_low", "SELECT c_float32 FROM t WHERE c_float32 < 0.5")
_case("c_float32_cast", "SELECT c_float32 FROM t WHERE c_float32 < 0.5")
_case("c_float64_high", "SELECT c_float64 FROM t WHERE c_float64 > 0.5")
_case("c_float64_low", "SELECT c_float64 FROM t WHERE c_float64 < 0.5")
_case("c_float64_cast", "SELECT c_float64 FROM t WHERE c_float64 < 0.5")
# the *_uint32 goldens hold the WHOLE column (an always-true uint32
# predicate in the era suite)
for nm in ("c_float32_cast_uint32", "c_float32_high_uint32", "c_float32_low_uint32"):
    _case(nm, "SELECT c_float32 FROM t WHERE c_uint32 >= 0")

# int8 vs int16 column comparisons
for op, sym in (
    ("gt", ">"), ("gteq", ">="), ("lt", "<"),
    ("lteq", "<="), ("eq", "="), ("noteq", "<>"),
):
    _case(f"c_int8_col_{op}", f"SELECT c_int8 FROM t WHERE c_int8 {sym} c_int16")

# int8 vs scalar: the five empty goldens (out-of-range scalars), the
# != 0 golden (255 of 256 rows), and the two range predicates
_case("c_int8_gt", "SELECT c_int8 FROM t WHERE c_int8 > 127")
_case("c_int8_gteq", "SELECT c_int8 FROM t WHERE c_int8 >= 128")
_case("c_int8_lt", "SELECT c_int8 FROM t WHERE c_int8 < -128")
_case("c_int8_lteq", "SELECT c_int8 FROM t WHERE c_int8 <= -129")
_case("c_int8_eq", "SELECT c_int8 FROM t WHERE c_int8 = 128")
_case("c_int8_scalar_gt", "SELECT c_int8 FROM t WHERE -129 > c_int8")
_case("c_int8_noteq", "SELECT c_int8 FROM t WHERE c_int8 <> 0")
_case(
    "c_int8_range_inclusive",
    "SELECT c_int8 FROM t WHERE c_int8 >= 2 AND c_int8 <= 100",
)
_case(
    "c_int8_range_exclusive",
    "SELECT c_int8 FROM t WHERE c_int8 > 100 AND c_int8 < 128",
)

# numerics.csv arithmetic (int32/float32 and int64/float64 variants)
for op, sym in (
    ("plus", "+"), ("minus", "-"), ("multiply", "*"),
    ("divide", "/"), ("modulo", "%"),
):
    expr = f"a {sym} b, a {sym} 2, a {sym} 2.5, a_f {sym} b_f, a_f {sym} 2, a_f {sym} 2.5"
    _case(f"numerics_{op}", f"SELECT {expr} FROM num")
    _case(f"numerics_{op}_f64", f"SELECT {expr} FROM num64")

_case("test_sqrt", "SELECT id, sqrt(id) FROM people")
_case("test_limit", "SELECT id, sqrt(id) FROM people LIMIT 5")
_case("test_filter", "SELECT city, lat, lng FROM uk_cities WHERE lat > 52.0")
_case(
    "test_sql_min_max",
    "SELECT MIN(lat), MAX(lat), MIN(lng), MAX(lng) FROM uk_cities",
)
_case(
    "test_simple_predicate",
    "SELECT ST_AsText(ST_Point(lat, lng)) FROM uk_cities WHERE lat < 52.6",
)
_case(
    "test_chaining_functions",
    "SELECT ST_AsText(ST_Point(lat, lng)) FROM uk_cities",
)
# the era's Point UDT rendered "{lat}, {lng}" under Display — both the
# DataFrame-API and SQL variants of the same query
_case("test_df_udf_udt", "SELECT ST_Point(lat, lng) FROM uk_cities")
_case("test_sql_udf_udt", "SELECT ST_Point(lat, lng) FROM uk_cities")

_case(
    "test_cast",
    "SELECT c_int, CAST(c_int AS smallint), CAST(c_int AS int), "
    "CAST(c_int AS bigint), c_float, CAST(c_float AS double), "
    "c_string, c_string FROM null_test WHERE c_int < 3",
)
_case("is_null_csv", "SELECT c_int FROM null_test WHERE c_float IS NULL")
_case("is_not_null_csv", "SELECT c_int FROM null_test WHERE c_float IS NOT NULL")

_case("csv_query_all_types", "SELECT * FROM t WHERE c_float64 < 0.1")
_case("parquet_query_all_types", "SELECT * FROM p WHERE c_float64 < 0.1")

_case(
    "csv_aggregate_all_types",
    _AGG_QUERY.format(src="t"),
    patches={25: _TRUE_UTF8_MAX},
)
_case(
    "csv_aggregate_by_c_bool",
    "SELECT c_bool, " + _minmax_list(_AGG_COLS)
    + " FROM t GROUP BY c_bool ORDER BY c_bool",
)
_case(
    "parquet_aggregate_all_types",
    _AGG_SELECT + _SUM_TAIL + " FROM p",
    patches={25: _TRUE_UTF8_MAX, 28: "14391145127", 29: "6977084541914051495"},
    float_tol=(34, 35),
)

assert len({c[0] for c in CASES}) == 66, len({c[0] for c in CASES})


@pytest.mark.parametrize("name,query,patches,float_tol", CASES, ids=[c[0] for c in CASES])
def test_reference_golden(gctx, data_dir, name, query, patches, float_tol):
    expected = (data_dir / "expected" / f"{name}.csv").read_text()
    got = _render(gctx.sql(query))
    if not patches and not float_tol:
        assert got == expected, f"{name}: output differs from reference golden"
        return
    exp_lines = expected.splitlines()
    got_lines = got.splitlines()
    assert len(got_lines) == len(exp_lines)
    for el, gl in zip(exp_lines, got_lines):
        ef, gf = el.split(","), gl.split(",")
        assert len(ef) == len(gf)
        for k, (e, g) in enumerate(zip(ef, gf)):
            if k in patches:
                assert g == patches[k], f"{name} field {k} (documented deviation)"
            elif k in float_tol:
                assert math.isclose(float(e), float(g), rel_tol=1e-5), (
                    f"{name} field {k}: {g} !~ {e}"
                )
            else:
                assert g == e, f"{name} field {k}: {g!r} != {e!r}"
