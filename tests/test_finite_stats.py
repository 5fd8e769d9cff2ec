"""Ingest-probed finite statistics (exec/compiler.py
_scanned_float_finite): SUM/AVG over a pure scanned non-nullable float
column that is probed all-finite skips the zero-sanitize and the
ieee_sum_cond conditional — results must be identical either way, and
columns that DO contain NaN/±inf must keep full IEEE semantics."""

import math

import numpy as np
import pytest


def _ctx(vals, force=None):
    import datafusion_tpu as df

    n = len(vals)
    t = df.Table.from_pydict(
        {
            "k": (np.arange(n) % 5).astype(np.int32),
            "v": np.asarray(vals, dtype=np.float32),
        }
    )
    ctx = df.ExecutionContext()
    ctx.register_table("t", t)
    return ctx


def test_finite_column_sums_match_generic():
    rng = np.random.default_rng(0)
    vals = rng.random(4096).astype(np.float32) * 100 - 50
    ctx = _ctx(vals)
    got = ctx.sql("SELECT k, SUM(v), AVG(v) FROM t GROUP BY k ORDER BY k")
    sums = {}
    cnts = {}
    for i, v in enumerate(vals):
        sums[i % 5] = sums.get(i % 5, 0.0) + float(v)
        cnts[i % 5] = cnts.get(i % 5, 0) + 1
    for row, k in zip(range(5), sorted(sums)):
        s = got.column_values(1)[row]
        a = got.column_values(2)[row]
        assert abs(s - sums[k]) <= 1e-3 * max(1.0, abs(sums[k]))
        assert abs(a - sums[k] / cnts[k]) <= 1e-3


@pytest.mark.parametrize("special", [float("nan"), float("inf"), float("-inf")])
def test_nonfinite_column_keeps_ieee(special):
    vals = [1.0, 2.0, special, 3.0] * 256
    ctx = _ctx(vals)
    got = ctx.sql("SELECT k, SUM(v) FROM t GROUP BY k ORDER BY k")
    # every group receives at least one special (positions cycle mod 4
    # vs groups mod 5 → all residues hit)
    for row in range(5):
        s = got.column_values(1)[row]
        if math.isnan(special):
            assert s is None or math.isnan(s)
        else:
            assert s == special


def test_probe_declines_nullable_and_expression():
    import datafusion_tpu as df

    n = 1024
    t = df.Table.from_pydict(
        {
            "k": (np.arange(n) % 3).astype(np.int32),
            "v": np.arange(n, dtype=np.float32),
        }
    )
    ctx = df.ExecutionContext()
    ctx.register_table("t", t)
    # expression args can't use the column stat — must still be correct
    got = ctx.sql("SELECT k, SUM(v * 2.0) FROM t GROUP BY k ORDER BY k")
    ref = {}
    for i in range(n):
        ref[i % 3] = ref.get(i % 3, 0.0) + 2.0 * i
    for row in range(3):
        s = got.column_values(1)[row]
        assert abs(s - ref[row]) <= 1e-6 * ref[row]
