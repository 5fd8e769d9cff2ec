"""Native (C++) CSV loader vs the pure-Python parser — must agree on
every fixture, including quoted strings with embedded commas and null
(empty) fields."""

import numpy as np
import pytest

from datafusion_tpu import DataType as D, Field, Schema, read_csv
from datafusion_tpu.io.native import get_lib, parse_csv_native

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")

CASES = [
    (
        "uk_cities.csv",
        Schema([Field("city", D.Utf8, False), Field("lat", D.Float64, False), Field("lng", D.Float64, False)]),
        False,
    ),
    (
        "aggregate_test_1.csv",
        Schema([Field("a", D.Int32, False), Field("b", D.Float64, False)]),
        True,
    ),
    (
        "null_test.csv",
        Schema(
            [
                Field("c_int", D.Int32, True),
                Field("c_float", D.Float64, True),
                Field("c_string", D.Utf8, True),
                Field("c_bool", D.Boolean, True),
            ]
        ),
        True,
    ),
]


@pytest.mark.parametrize("fname,schema,header", CASES)
def test_native_matches_python(data_dir, fname, schema, header, monkeypatch):
    path = str(data_dir / fname)
    native = read_csv(path, schema, has_header=header)
    monkeypatch.setenv("DFTPU_NATIVE_CSV", "0")
    python = read_csv(path, schema, has_header=header)
    assert native.num_rows == python.num_rows
    for j in range(len(schema)):
        a = native.columns[j].to_numpy(native.num_rows)
        b = python.columns[j].to_numpy(python.num_rows)
        np.testing.assert_array_equal(a, b)


def test_quoted_commas(data_dir):
    schema = CASES[0][1]
    t = read_csv(str(data_dir / "uk_cities.csv"), schema, has_header=False)
    cities = t.columns[0].to_numpy(t.num_rows)
    assert "Elgin, Scotland, the UK" in set(cities)


def test_multichunk_quoted_newlines(tmp_path, monkeypatch):
    """The parallel row index splits the buffer at arbitrary byte offsets
    and reconstructs quote state via prefix parity — stress it with a
    multi-MB file full of quoted fields containing embedded newlines,
    commas, and escaped quotes, and check exact agreement with the
    pure-Python parser."""
    rng = np.random.default_rng(3)
    n = 60_000
    rows = []
    for i in range(n):
        r = int(rng.integers(0, 5))
        if r == 0:
            s = f'"line1-{i}\nline2,with comma\nline3"'
        elif r == 1:
            s = f'"quote "" inside {i}"'
        elif r == 2:
            s = f'"{i:06d}-' + "x" * int(rng.integers(0, 60)) + '"'
        else:
            s = f"plain{i}"
        rows.append(f"{i},{s},{float(i) / 7!r}")
    p = tmp_path / "chunky.csv"
    p.write_text("id,s,v\n" + "\n".join(rows) + "\n")
    assert p.stat().st_size > 2 << 20  # multiple 1 MiB index chunks
    schema = Schema(
        [Field("id", D.Int64, False), Field("s", D.Utf8, False), Field("v", D.Float64, False)]
    )
    native = read_csv(str(p), schema, has_header=True)
    monkeypatch.setenv("DFTPU_NATIVE_CSV", "0")
    python = read_csv(str(p), schema, has_header=True)
    assert native.num_rows == python.num_rows == n
    # to_numpy decodes dictionary columns, so column 1 compares the
    # actual string values (embedded newlines, commas, escaped quotes)
    for j in range(3):
        np.testing.assert_array_equal(
            native.columns[j].to_numpy(n), python.columns[j].to_numpy(n)
        )


def test_large_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 50_000
    a = rng.integers(-1000, 1000, n)
    b = rng.random(n)
    lines = ["a,b"] + [f"{int(a[i])},{float(b[i])!r}" for i in range(n)]
    p = tmp_path / "big.csv"
    p.write_text("\n".join(lines) + "\n")
    schema = Schema([Field("a", D.Int64, False), Field("b", D.Float64, False)])
    t = read_csv(str(p), schema, has_header=True)
    assert t.num_rows == n
    np.testing.assert_array_equal(t.columns[0].to_numpy(n).astype(np.int64), a)
    np.testing.assert_array_equal(t.columns[1].to_numpy(n), b)
