"""End-to-end group-by through the pallas segmented-reduce path
(DFTPU_PALLAS=1 runs the kernel in interpret mode on CPU) vs the XLA
path — results must agree."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table


def run_query(monkeypatch, pallas: bool):
    monkeypatch.setenv("DFTPU_PALLAS", "1" if pallas else "0")
    ctx = ExecutionContext()
    rng = np.random.default_rng(3)
    n = 3000
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "k": rng.integers(0, 50, n).astype(np.int32),
                "v": rng.random(n).astype(np.float32),
                "w": rng.integers(-100, 100, n).astype(np.int32),
            }
        ),
    )
    return ctx.sql(
        "SELECT k, COUNT(v), MIN(v), MAX(v), AVG(v), MIN(w), MAX(w) "
        "FROM t WHERE v > 0.25 GROUP BY k ORDER BY k"
    ).result_str()


def test_pallas_groupby_matches_xla(monkeypatch):
    a = run_query(monkeypatch, pallas=False)
    b = run_query(monkeypatch, pallas=True)
    # float sums/averages may differ in final ulp (different reduction
    # trees); compare cell-wise with tolerance
    la, lb = a.splitlines(), b.splitlines()
    assert len(la) == len(lb) == 50
    for ra, rb in zip(la, lb):
        for x, y in zip(ra.split("\t"), rb.split("\t")):
            if x != y:
                assert abs(float(x) - float(y)) < 1e-5 * max(1, abs(float(x)))


def test_nan_data_sums_do_not_poison_neighbor_groups(monkeypatch):
    """A NaN in one group's SUM input must not contaminate OTHER groups
    sharing its accumulator window (0 * NaN = NaN used to spread across
    the whole one-hot product — PERFLOG r3.4/r3.6: non-finite inputs now
    ride zero-sanitized and ieee_sum_cond's exact path restores the IEEE
    per-group result, NaN only for the contaminated group)."""
    import numpy as np
    import os

    monkeypatch.setenv("DFTPU_PALLAS", "1")
    from datafusion_tpu import ExecutionContext, Table

    n = 2048
    rng = np.random.default_rng(11)
    k = rng.integers(0, 50, n).astype(np.int32)
    v = rng.random(n).astype(np.float32)
    v[k == 7] = np.nan  # exactly group 7 contaminated
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"k": k, "v": v}))
    rows = ctx.sql("SELECT k, SUM(v) FROM t GROUP BY k ORDER BY k").to_pylist()
    for r in rows:
        kk, s = r["k"], float(r["SUM"])
        if kk == 7:
            assert np.isnan(s), rows
        else:
            want = v[(k == kk)].sum()
            assert not np.isnan(s) and abs(s - want) < 1e-2, (kk, s, want)
