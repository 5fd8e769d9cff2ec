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
