"""Type-system tests: the supertype lattice and coercion predicate must
match the reference's tables (reference: logicalplan.rs:446-605)."""

from datafusion_tpu.types import DataType as D, ScalarValue, can_coerce_from, get_supertype


def test_supertype_signed_unsigned():
    assert get_supertype(D.UInt8, D.Int16) is D.Int16
    assert get_supertype(D.Int16, D.UInt8) is D.Int16
    assert get_supertype(D.UInt64, D.Int64) is D.Int64
    assert get_supertype(D.Int32, D.UInt32) is D.Int32


def test_supertype_widening():
    assert get_supertype(D.Int8, D.Int64) is D.Int64
    assert get_supertype(D.Int64, D.Int8) is D.Int64
    assert get_supertype(D.UInt16, D.UInt32) is D.UInt32
    assert get_supertype(D.Int32, D.Float64) is D.Float64
    assert get_supertype(D.Float32, D.Float64) is D.Float64
    assert get_supertype(D.UInt64, D.Float32) is D.Float32


def test_supertype_same():
    for dt in (D.Int32, D.Float64, D.Utf8, D.Boolean):
        assert get_supertype(dt, dt) is dt


def test_supertype_none():
    assert get_supertype(D.Utf8, D.Int32) is None
    assert get_supertype(D.Boolean, D.Int32) is None


def test_can_coerce_from():
    assert can_coerce_from(D.Int64, D.Int32)
    assert not can_coerce_from(D.Int32, D.Int64)
    assert can_coerce_from(D.Float64, D.UInt64)
    assert can_coerce_from(D.Float32, D.Int64)  # reference allows (lossy in practice)
    assert not can_coerce_from(D.Int64, D.Float32)
    assert not can_coerce_from(D.Utf8, D.Int32)


def test_scalar_repr():
    assert repr(ScalarValue.int64(9)) == "Int64(9)"
    assert repr(ScalarValue.utf8("CO")) == 'Utf8("CO")'
    assert repr(ScalarValue.float64(1.5)) == "Float64(1.5)"
    assert repr(ScalarValue.boolean(True)) == "Boolean(true)"


def test_is_distinct_from():
    import numpy as np

    from datafusion_tpu import ExecutionContext, Table
    from datafusion_tpu.schema import Field, Schema
    from datafusion_tpu.types import DataType

    schema = Schema([Field("k", DataType.Int32), Field("v", DataType.Float64, True)])
    t = Table.from_arrays(
        schema,
        [np.array([1, 2, 3, 4], np.int32), np.array([1.0, 0.0, 3.0, 3.0])],
        validity=[None, np.array([True, False, True, True])],
    )
    ctx = ExecutionContext()
    ctx.register_table("t", t)
    # NULL IS DISTINCT FROM 3.0 → TRUE (null-safe, never NULL)
    assert (
        ctx.sql("SELECT k FROM t WHERE v IS DISTINCT FROM 3.0 ORDER BY k").result_str()
        == "1\n2\n"
    )
    assert (
        ctx.sql(
            "SELECT k FROM t WHERE v IS NOT DISTINCT FROM 3.0 ORDER BY k"
        ).result_str()
        == "3\n4\n"
    )
    # NULL vs NULL compares equal under IS NOT DISTINCT FROM
    ctx.register_table("u", t)
    out = ctx.sql(
        "SELECT t.k FROM t JOIN u ON t.k = u.k "
        "WHERE t.v IS NOT DISTINCT FROM u.v ORDER BY 1"
    ).result_str()
    assert out == "1\n2\n3\n4\n"


def test_cast_utf8_to_values():
    import numpy as np

    from datafusion_tpu import ExecutionContext, Table

    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "k": np.array([1, 2, 3, 4, 5], np.int32),
                "s": ["12", "3.5", "oops", "2021-01-05", "true"],
            }
        ),
    )
    q = lambda sql: ctx.sql(sql).result_str()
    # TRY_CAST semantics (documented): bad strings yield NULL
    assert q("SELECT CAST(s AS DOUBLE) FROM t ORDER BY k") == (
        "12.0\n3.5\nNULL\nNULL\nNULL\n"
    )
    # integer casts round half away from zero
    assert q("SELECT CAST(s AS INT) FROM t WHERE k = 2") == "4\n"
    assert q("SELECT CAST(s AS DATE) FROM t WHERE k = 4") == "2021-01-05\n"
    assert q("SELECT CAST(s AS BOOLEAN) FROM t WHERE k = 5") == "true\n"
    assert (
        q("SELECT k FROM t WHERE CAST(s AS DOUBLE) > 4 ORDER BY k") == "1\n"
    )
