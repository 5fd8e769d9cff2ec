"""Sort-free dense group-by (dictionary-coded keys) vs the sorted path —
results must agree exactly for count/min/max and within float tolerance
for sums/averages."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table


def build(monkeypatch, pallas: bool, seed=1, n=5000, ncity=200):
    monkeypatch.setenv("DFTPU_PALLAS", "1" if pallas else "0")
    rng = np.random.default_rng(seed)
    cities = [f"city{i:03d}" for i in range(ncity)]
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "city": [cities[i] for i in rng.integers(0, ncity, n)],
                "v": rng.random(n).astype(np.float32),
                "w": rng.integers(-100, 100, n).astype(np.int32),
            }
        ),
    )
    return ctx


SQL = (
    "SELECT city, COUNT(v), MIN(v), MAX(v), SUM(v), AVG(v), MIN(w), MAX(w) "
    "FROM t WHERE v > 0.1 GROUP BY city ORDER BY city"
)


def test_dense_matches_sorted_path(monkeypatch):
    a = build(monkeypatch, pallas=False).sql(SQL).result_str()
    b = build(monkeypatch, pallas=True).sql(SQL).result_str()
    la, lb = a.splitlines(), b.splitlines()
    assert len(la) == len(lb)
    for ra, rb in zip(la, lb):
        for x, y in zip(ra.split("\t"), rb.split("\t")):
            if x != y:
                assert abs(float(x) - float(y)) <= 1e-4 * max(1.0, abs(float(x))), (
                    ra,
                    rb,
                )


def test_dense_groups_absent_from_data(monkeypatch):
    # vocab entries filtered out entirely must not appear
    ctx = build(monkeypatch, pallas=True)
    res = ctx.sql("SELECT city, COUNT(v) FROM t WHERE v > 0.999 GROUP BY city")
    # far fewer groups than the 200-entry vocabulary
    assert 0 < res.num_rows < 200


def test_dense_empty_result(monkeypatch):
    ctx = build(monkeypatch, pallas=True)
    res = ctx.sql("SELECT city, COUNT(v) FROM t WHERE v > 2.0 GROUP BY city")
    assert res.num_rows == 0
