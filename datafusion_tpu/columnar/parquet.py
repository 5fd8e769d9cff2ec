"""Parquet ingest → device Table.

The reference declared the parquet crate, parsed `STORED AS PARQUET`,
shipped .parquet fixtures — and never implemented a reader
(reference: Cargo.toml:29, dfparser.rs:34, SURVEY.md §2). Implemented
here on the host via pandas; columns are coerced to the declared schema
(or inferred when none is given), with nulls tracked in validity.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from datafusion_tpu.columnar.table import Table
from datafusion_tpu.errors import ExecutionError
from datafusion_tpu.schema import Field, Schema
from datafusion_tpu.types import DataType, from_np


def _decode(v):
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    return str(v)


def read_parquet(path: str, schema: Optional[Schema] = None, *, device=None) -> Table:
    try:
        import pandas as pd
    except ImportError as e:  # pragma: no cover
        raise ExecutionError("parquet support requires pandas") from e
    df = pd.read_parquet(path)

    if schema is None:
        fields = []
        for name in df.columns:
            s = df[name]
            # pandas may surface parquet strings as object, "string", or
            # the "str" extension dtype depending on version/backend
            if s.dtype == object or str(s.dtype) in ("string", "str") or str(
                s.dtype
            ).startswith("string"):
                fields.append(Field(str(name), DataType.Utf8))
            elif str(s.dtype).startswith("datetime"):
                fields.append(Field(str(name), DataType.Int64))  # epoch ns
            elif s.dtype == np.bool_:
                fields.append(Field(str(name), DataType.Boolean))
            else:
                fields.append(Field(str(name), from_np(s.dtype)))
        schema = Schema(fields)

    n = len(df)
    arrays = []
    validity: list = []
    any_null = False
    for field in schema.fields:
        if field.name not in df.columns:
            raise ExecutionError(f"parquet file has no column '{field.name}'")
        s = df[field.name]
        isna = s.isna().to_numpy()
        valid = None if not isna.any() else ~isna
        if valid is not None:
            any_null = True
        if field.dtype is DataType.Utf8:
            arrays.append([("" if isna[i] else _decode(s.iloc[i])) for i in range(n)])
        elif field.dtype is DataType.Boolean:
            arrays.append(s.fillna(False).to_numpy(dtype=np.bool_))
        elif str(s.dtype).startswith("datetime"):
            arrays.append(s.astype("int64").to_numpy())
        else:
            arrays.append(
                s.fillna(0).to_numpy().astype(field.dtype.to_np(), copy=False)
            )
        validity.append(valid)
    return Table.from_arrays(
        schema, arrays, validity=validity if any_null else None, device=device
    )
