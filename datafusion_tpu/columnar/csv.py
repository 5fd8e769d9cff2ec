"""Host-side CSV ingest → device Table.

Plays the role of the reference's CsvDataSource + arrow::csv::Reader
(reference: src/execution/datasource.rs:33-58). Ingest happens once on
the host; the whole file becomes one padded, device-resident Table
instead of a stream of 1024-row batches (SURVEY.md §7).

Parity note: the reference constructs its CSV reader with
has_header=true unconditionally (datasource.rs:41), which swallows the
first data row of headerless files like uk_cities.csv — its test goldens
depend on this. `CsvDataSource` mirrors that default; `read_csv` lets
callers choose.
"""

from __future__ import annotations

import csv as _csv
from dataclasses import dataclass
from typing import Optional

import numpy as np

from datafusion_tpu.columnar.table import Table
from datafusion_tpu.errors import ExecutionError
from datafusion_tpu.schema import Schema
from datafusion_tpu.types import DataType


def _parse_column(values: list[str], dtype: DataType):
    """Parse one column of raw CSV strings; returns (array, validity|None)."""
    if dtype is DataType.Utf8:
        return values, None
    if dtype is DataType.Date32:
        from datafusion_tpu.utils.dates import parse_iso_date

        n = len(values)
        arr = np.zeros((n,), dtype=np.int32)
        validity = np.ones((n,), dtype=np.bool_)
        for i, v in enumerate(values):
            if v == "":
                validity[i] = False
            else:
                arr[i] = parse_iso_date(v)
        return arr, (None if validity.all() else validity)
    if dtype is DataType.Timestamp:
        from datafusion_tpu.utils.dates import parse_iso_timestamp

        n = len(values)
        arr = np.zeros((n,), dtype=np.int64)
        validity = np.ones((n,), dtype=np.bool_)
        for i, v in enumerate(values):
            if v == "":
                validity[i] = False
            else:
                arr[i] = parse_iso_timestamp(v)
        return arr, (None if validity.all() else validity)
    n = len(values)
    np_dtype = dtype.to_np()
    missing = [i for i, v in enumerate(values) if v == ""]
    if not missing:
        if dtype is DataType.Boolean:
            arr = np.array([v.strip().lower() in ("true", "1", "t") for v in values])
        else:
            arr = np.array(values, dtype=np_dtype)
        return arr, None
    arr = np.zeros((n,), dtype=np_dtype)
    validity = np.ones((n,), dtype=np.bool_)
    for i, v in enumerate(values):
        if v == "":
            validity[i] = False
        elif dtype is DataType.Boolean:
            arr[i] = v.strip().lower() in ("true", "1", "t")
        else:
            arr[i] = np_dtype.type(v)
    return arr, validity


def read_csv(
    path: str,
    schema: Schema,
    *,
    has_header: bool = True,
    device=None,
) -> Table:
    """Read a CSV file into a device Table using the provided schema.

    Uses the multithreaded native (C++) parser when available
    (io/native.py); falls back to the pure-Python path otherwise or when
    DFTPU_NATIVE_CSV=0."""
    import os as _os

    if _os.environ.get("DFTPU_NATIVE_CSV", "1") == "1":
        from datafusion_tpu.io.native import parse_csv_native

        native = parse_csv_native(path, schema, has_header)
        if native is not None:
            arrays, validity = native
            return Table.from_arrays(schema, arrays, validity=validity, device=device)

    with open(path, newline="") as f:
        rows = list(_csv.reader(f))
    if has_header and rows:
        rows = rows[1:]
    ncols = len(schema)
    raw_cols: list[list[str]] = [[] for _ in range(ncols)]
    for r in rows:
        if len(r) < ncols:
            raise ExecutionError(f"CSV row has {len(r)} fields, schema has {ncols}")
        for j in range(ncols):
            raw_cols[j].append(r[j])
    arrays = []
    validity = []
    for j, field in enumerate(schema.fields):
        arr, valid = _parse_column(raw_cols[j], field.dtype)
        arrays.append(arr)
        validity.append(valid)
    if all(v is None for v in validity):
        validity = None
    return Table.from_arrays(schema, arrays, validity=validity, device=device)


@dataclass
class CsvDataSource:
    """Named CSV data source registered with an ExecutionContext
    (reference: CsvDataSource::new(filename, schema, batch_size),
    datasource.rs:39 — batch_size is obsolete here; the whole file is one
    device table; has_header defaults to True like the reference)."""

    filename: str
    schema: Schema
    has_header: bool = True
    _table: Optional[Table] = None

    def table(self) -> Table:
        if self._table is None:
            self._table = read_csv(self.filename, self.schema, has_header=self.has_header)
        return self._table


def read_csv_columns(
    path: str, schema: Schema, has_header: bool, columns
):
    """Host-side parse of ONLY the given column indices (one file pass).
    Returns (arrays, validity, nrows) with None entries for columns not
    requested — the lazy-scan primitive (projection push-down reaches
    ingest: unused columns are never type-converted; the native parser
    skips them in C++)."""
    import os as _os

    columns = sorted(set(columns))
    if _os.environ.get("DFTPU_NATIVE_CSV", "1") == "1":
        from datafusion_tpu.io.native import parse_csv_native

        native = parse_csv_native(path, schema, has_header, columns=columns)
        if native is not None:
            arrays, validity = native
            if validity is None:
                validity = [None] * len(schema)
            n = 0
            for a in arrays:
                if a is not None:
                    n = len(a[0]) if isinstance(a, tuple) else len(a)
                    break
            return arrays, validity, n

    with open(path, newline="") as f:
        rows = list(_csv.reader(f))
    if has_header and rows:
        rows = rows[1:]
    ncols = len(schema)
    want = set(columns)
    raw_cols: list = [[] if j in want else None for j in range(ncols)]
    for r in rows:
        if len(r) < ncols:
            raise ExecutionError(f"CSV row has {len(r)} fields, schema has {ncols}")
        for j in want:
            raw_cols[j].append(r[j])
    arrays: list = [None] * ncols
    validity: list = [None] * ncols
    for j in columns:
        arr, valid = _parse_column(raw_cols[j], schema.fields[j].dtype)
        arrays[j] = arr
        validity[j] = valid
    return arrays, validity, len(rows)


def count_csv_rows(path: str, has_header: bool) -> int:
    """Data-row count without parsing any field values."""
    import os as _os

    if _os.environ.get("DFTPU_NATIVE_CSV", "1") == "1":
        from datafusion_tpu.io.native import count_csv_rows_native

        n = count_csv_rows_native(path, has_header)
        if n is not None:
            return n
    with open(path, newline="") as f:
        n = sum(1 for _ in _csv.reader(f))
    return max(0, n - 1) if has_header else n


class _LazyColumn:
    """Column stand-in that materializes its owner's real column on
    first data access (same attribute surface as columnar.table.Column)."""

    __slots__ = ("_owner", "_idx", "dtype")

    def __init__(self, owner: "LazyCsvTable", idx: int, dtype: DataType):
        self._owner = owner
        self._idx = idx
        self.dtype = dtype

    @property
    def data(self):
        return self._owner._col(self._idx).data

    @property
    def validity(self):
        return self._owner._col(self._idx).validity

    @property
    def dictionary(self):
        return self._owner._col(self._idx).dictionary

    @property
    def capacity(self) -> int:
        return self._owner.capacity

    def valid_mask(self):
        return self._owner._col(self._idx).valid_mask()

    def to_numpy(self, num_rows: int):
        return self._owner._col(self._idx).to_numpy(num_rows)


class LazyCsvTable(Table):
    """A CSV-backed Table whose columns parse ON DEMAND: registration
    runs only the native row-count/index pass; the compiler's
    projection push-down then calls ensure_columns() with exactly the
    scanned columns, so columns no query references are NEVER parsed
    (VERDICT r3 next #6 — the reference's push-down existed for exactly
    this IO win and was disabled, context.rs:89)."""

    def __init__(self, path: str, schema: Schema, has_header: bool = True):
        n = count_csv_rows(path, has_header)
        object.__setattr__(self, "schema", schema)
        object.__setattr__(self, "num_rows", n)
        object.__setattr__(self, "_path", path)
        object.__setattr__(self, "_has_header", has_header)
        object.__setattr__(self, "_real", {})
        object.__setattr__(
            self,
            "columns",
            tuple(
                _LazyColumn(self, i, f.dtype)
                for i, f in enumerate(schema.fields)
            ),
        )

    @property
    def capacity(self) -> int:
        from datafusion_tpu.columnar.table import round_up

        return round_up(self.num_rows)

    def ensure_columns(self, indices) -> None:
        """Parse the given (table) column indices in one file pass."""
        todo = sorted(i for i in set(indices) if i not in self._real)
        if not todo:
            return
        arrays, validity, n = read_csv_columns(
            self._path, self.schema, self._has_header, todo
        )
        if n != self.num_rows:
            raise ExecutionError(
                f"CSV changed between index and parse: {n} rows vs "
                f"{self.num_rows} at registration"
            )
        sub = Table.from_arrays(
            self.schema.project(todo),
            [arrays[i] for i in todo],
            validity=[validity[i] for i in todo],
        )
        for j, i in enumerate(todo):
            self._real[i] = sub.columns[j]

    def materialized_columns(self) -> list:
        return sorted(self._real)

    def _col(self, i: int):
        if i not in self._real:
            self.ensure_columns([i])
        return self._real[i]
