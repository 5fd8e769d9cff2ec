"""Columnar device tables — the engine's memory model.

Replaces the reference's streamed Arrow RecordBatches (reference:
src/execution/datasource.rs + arrow 0.12 arrays) with whole-table,
HBM-resident columnar buffers: one padded device array per column plus a
validity bitmap, with strings dictionary-encoded on the host into
order-preserving int32 codes (SURVEY.md §7 design stance).

Padding: every column is padded to a tile-aligned capacity so all
downstream pipelines see static shapes — the XLA idiom for the
reference's dynamic row counts (SURVEY.md §7 'Dynamic shapes under XLA').
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Iterable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from datafusion_tpu.errors import ExecutionError
from datafusion_tpu.schema import Field, Schema
from datafusion_tpu.types import DataType, from_np, physical_np

# Lane-aligned padding unit. 1024 rows = 8 sublanes × 128 lanes at f32,
# and keeps per-column buffers tile-aligned for Pallas kernels.
PAD_UNIT = 1024


def round_up(n: int, unit: int = PAD_UNIT) -> int:
    return max(unit, ((n + unit - 1) // unit) * unit)


def encode_dictionary(values: Sequence[str]) -> tuple[np.ndarray, tuple[str, ...]]:
    """Dictionary-encode strings with an order-preserving (sorted) vocab.

    Sorted vocab ⇒ code comparisons are order-isomorphic to string
    comparisons, so <, >, MIN, MAX, ORDER BY all run on int32 codes on
    device and only decode at output (SURVEY.md §7 'Strings on TPU').
    """
    arr = np.asarray(values, dtype=object)
    vocab, codes = np.unique(arr.astype(str), return_inverse=True)
    return codes.astype(np.int32), tuple(vocab.tolist())


def _split_nulls(vals) -> tuple[object, Optional[np.ndarray]]:
    """Split Python-level NULLs out of one raw column.

    Returns `(cleaned_values, validity_or_None)`. `None` entries (and
    datetime64 NaT) mark NULL rows; the column's type is inferred from
    the NON-NULL values, and NULL slots hold a type-appropriate fill
    that is never observable (validity gates every consumer). Without
    this, `np.asarray([1.0, None])` yields an object array that was
    mis-classified Utf8 and SUM returned the string 'None'.
    """
    arr = np.asarray(vals)
    if arr.dtype.kind == "M":
        nat = np.isnat(arr)
        if not nat.any():
            return vals, None
        filled = arr.copy()
        filled[nat] = np.zeros((), arr.dtype)
        return filled, ~nat
    if arr.dtype.kind != "O":
        return vals, None
    flat = list(arr.flat)
    valid = np.array([v is not None for v in flat], dtype=bool)
    if valid.all():
        return vals, None
    non_null = [v for v in flat if v is not None]
    if not non_null:
        # all-NULL, untyped: Float64 by convention (Arrow's null→double)
        return np.zeros(len(flat), dtype=np.float64), valid
    import datetime as _dtm

    ex = non_null[0]
    if isinstance(ex, str):
        return np.array(["" if v is None else v for v in flat], dtype=object), valid
    if isinstance(ex, _dtm.datetime):
        fill = _dtm.datetime(1970, 1, 1)
        return np.array([fill if v is None else v for v in flat], dtype=object), valid
    if isinstance(ex, _dtm.date):
        fill = _dtm.date(1970, 1, 1)
        return np.array([fill if v is None else v for v in flat], dtype=object), valid
    if isinstance(ex, bool) and all(isinstance(v, bool) for v in non_null):
        return np.array([bool(v) for v in flat], dtype=np.bool_), valid
    base = np.asarray(non_null)
    if base.dtype.kind in ("i", "u", "f", "b"):
        cleaned = np.zeros(len(flat), dtype=base.dtype)
        cleaned[valid] = base
        return cleaned, valid
    # heterogeneous objects: render as strings (matches np.asarray's
    # str coercion for fully-valid object columns)
    return np.array(["" if v is None else str(v) for v in flat], dtype=object), valid


@dataclass(frozen=True)
class Column:
    """One column: logical type + padded device buffer (+ validity, + dict).

    `data` has length == capacity of the owning Table; rows past
    Table.num_rows are padding. `validity` is None when all rows are
    non-null (the common case — mirrors Arrow's omitted bitmap).
    """

    dtype: DataType
    data: jax.Array
    validity: Optional[jax.Array] = None
    dictionary: Optional[tuple[str, ...]] = None

    @property
    def capacity(self) -> int:
        return int(self.data.shape[0])

    def valid_mask(self) -> jax.Array:
        if self.validity is not None:
            return self.validity
        return jnp.ones((self.capacity,), dtype=jnp.bool_)

    def to_numpy(self, num_rows: int):
        """Materialize to host, decoding dictionaries; nulls become None."""
        data = np.asarray(jax.device_get(self.data))[:num_rows]
        if self.dtype is DataType.Utf8:
            vocab = np.asarray(self.dictionary, dtype=object)
            out = vocab[np.clip(data, 0, len(vocab) - 1)]
        else:
            out = data
        if self.validity is not None:
            valid = np.asarray(jax.device_get(self.validity))[:num_rows]
            out = np.asarray(out, dtype=object)
            out[~valid] = None
        return out


@dataclass(frozen=True)
class Table:
    """An HBM-resident table: schema + columns + logical row count."""

    schema: Schema
    columns: tuple[Column, ...]
    num_rows: int

    def __post_init__(self):
        caps = {c.capacity for c in self.columns}
        if len(caps) > 1:
            raise ExecutionError(f"ragged column capacities: {sorted(caps)}")

    @property
    def capacity(self) -> int:
        return self.columns[0].capacity if self.columns else 0

    def column(self, i: int) -> Column:
        return self.columns[i]

    # ------------------------------------------------------------------
    @staticmethod
    def from_arrays(
        schema: Schema,
        arrays: Sequence,
        *,
        validity: Optional[Sequence[Optional[np.ndarray]]] = None,
        device=None,
    ) -> "Table":
        """Build a device table from host arrays (numpy columns; Utf8
        columns may be lists of str, or pre-encoded `(int32 codes,
        sorted vocab tuple)` pairs from the native loader)."""
        if len(arrays) != len(schema):
            raise ExecutionError(
                f"{len(arrays)} arrays for schema of {len(schema)} fields"
            )

        def _col_len(a) -> int:
            if isinstance(a, tuple) and len(a) == 2 and isinstance(a[1], tuple):
                return len(a[0])
            return len(a)

        n = _col_len(arrays[0]) if arrays else 0
        cap = round_up(n)
        cols = []
        for i, field in enumerate(schema.fields):
            arr = arrays[i]
            vocab = None
            if field.dtype is DataType.Utf8:
                if isinstance(arr, tuple) and len(arr) == 2 and isinstance(arr[1], tuple):
                    host = np.asarray(arr[0], dtype=np.int32)
                    vocab = arr[1]
                else:
                    codes, vocab = encode_dictionary(arr)
                    host = codes
            elif field.dtype is DataType.Date32:
                from datafusion_tpu.utils.dates import to_days_array

                host = to_days_array(arr)
            elif field.dtype is DataType.Timestamp:
                from datafusion_tpu.utils.dates import to_seconds_array

                host = to_seconds_array(arr).astype(
                    physical_np(DataType.Timestamp)
                )
            else:
                host = np.asarray(arr, dtype=physical_np(field.dtype))
            if len(host) != n:
                raise ExecutionError("ragged input arrays")
            padded = np.zeros((cap,), dtype=physical_np(field.dtype))
            padded[:n] = host
            data = jax.device_put(padded, device)
            vmask = None
            if validity is not None and validity[i] is not None:
                v = np.zeros((cap,), dtype=np.bool_)
                v[:n] = np.asarray(validity[i], dtype=np.bool_)
                vmask = jax.device_put(v, device)
            cols.append(Column(field.dtype, data, vmask, vocab))
        return Table(schema, tuple(cols), n)

    @staticmethod
    def from_pydict(data: dict, schema: Optional[Schema] = None) -> "Table":
        """Convenience constructor from {name: values}.

        Python `None` entries become SQL NULLs: the column's type is
        inferred from the non-None values and a validity mask is set
        (a numeric list containing None must NOT silently become a
        Utf8 column or a NaN data value — Arrow ingest semantics).
        """
        arrays: list = []
        validity: list = []
        any_valid = False
        for vals in data.values():
            cleaned, vmask = _split_nulls(vals)
            arrays.append(cleaned)
            validity.append(vmask)
            any_valid = any_valid or vmask is not None
        if schema is None:
            fields = []
            for name, vals in zip(data.keys(), arrays):
                v0 = np.asarray(vals)
                if v0.dtype.kind == "M":
                    # datetime64: day-or-coarser units → Date32, finer
                    # (h/m/s/ms/us/ns) → Timestamp
                    unit = np.datetime_data(v0.dtype)[0]
                    coarse = unit in ("D", "W", "M", "Y")
                    fields.append(
                        Field(name, DataType.Date32 if coarse else DataType.Timestamp)
                    )
                elif v0.dtype.kind in ("U", "O", "S"):
                    import datetime as _dtm

                    if len(v0) and isinstance(v0.flat[0], _dtm.datetime):
                        fields.append(Field(name, DataType.Timestamp))
                    elif len(v0) and isinstance(v0.flat[0], _dtm.date):
                        fields.append(Field(name, DataType.Date32))
                    else:
                        fields.append(Field(name, DataType.Utf8))
                else:
                    fields.append(Field(name, from_np(v0.dtype)))
            schema = Schema(fields)
        return Table.from_arrays(
            schema, arrays, validity=validity if any_valid else None
        )

    # ------------------------------------------------------------------
    def to_pylist(self) -> list[dict]:
        cols = [c.to_numpy(self.num_rows) for c in self.columns]
        names = self.schema.names()
        return [
            {names[j]: cols[j][i] for j in range(len(cols))}
            for i in range(self.num_rows)
        ]
