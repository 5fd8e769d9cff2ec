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
