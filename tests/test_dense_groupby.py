"""Sort-free dense group-by (dictionary-coded keys) vs the sorted path —
results must agree exactly for count/min/max and within float tolerance
for sums/averages."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu import DataType, Field, Schema


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


def test_dense_null_key_group(monkeypatch):
    # nullable dict key: NULL keys form their own group on both paths
    import numpy as np

    from datafusion_tpu import DataType as D, Field, Schema, Table

    vals = ["a", "b", "a", "b", "a"]
    validity = np.array([True, True, False, True, False])
    for pallas in (False, True):
        monkeypatch.setenv("DFTPU_PALLAS", "1" if pallas else "0")
        ctx = ExecutionContext()
        schema = Schema([Field("s", D.Utf8, True), Field("x", D.Int32, False)])
        ctx.register_table(
            "t",
            Table.from_arrays(
                schema,
                [vals, np.arange(5, dtype=np.int32)],
                validity=[validity, None],
            ),
        )
        out = ctx.sql("SELECT s, COUNT(x) FROM t GROUP BY s").result_str()
        lines = sorted(out.splitlines())
        assert lines == ['"a"\t1', '"b"\t2', "NULL\t2"], (pallas, lines)


def test_dense_distributed(monkeypatch):
    # distributed dense path: psum/pmin/pmax slot merges over the mesh
    import numpy as np

    from datafusion_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("DFTPU_PALLAS", "1")
    rng = np.random.default_rng(5)
    n = 4096
    cities = [f"c{i:02d}" for i in range(50)]
    data = {
        "city": [cities[i] for i in rng.integers(0, 50, n)],
        "v": rng.random(n).astype(np.float32),
    }
    sql = "SELECT city, COUNT(v), MIN(v), MAX(v), AVG(v) FROM t GROUP BY city ORDER BY city"
    ctx1 = ExecutionContext()
    ctx1.register_table("t", Table.from_pydict(data))
    ctx2 = ExecutionContext(mesh=make_mesh())
    ctx2.register_table("t", Table.from_pydict(data))
    a, b = ctx1.sql(sql).result_str(), ctx2.sql(sql).result_str()
    la, lb = a.splitlines(), b.splitlines()
    assert len(la) == len(lb) == 50
    for ra, rb in zip(la, lb):
        for x, y in zip(ra.split("\t"), rb.split("\t")):
            if x != y:
                assert abs(float(x) - float(y)) <= 1e-4 * max(1.0, abs(float(x)))


def test_dense_int_key_range(monkeypatch):
    """Integer keys with a small probed min..max range take the dense
    sort-free path (key_offset shifts the range onto slots)."""
    import subprocess, sys, os

    code = """
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, datafusion_tpu as df
ctx = df.ExecutionContext()
n = 4096
ctx.register_table("t", df.Table.from_pydict({
    "k": (np.arange(n) % 37 + 1000).astype(np.int32),
    "v": np.arange(n).astype(np.float32),
}))
r = ctx.sql("EXPLAIN VERBOSE SELECT k, COUNT(v), MIN(v), SUM(v) FROM t GROUP BY k")
assert "int[1000,1036]" in r.result_str(), r.result_str()
out = ctx.sql("SELECT k, COUNT(v), MIN(v) FROM t WHERE k < 1003 GROUP BY k ORDER BY k").result_str()
import os
os.environ["DFTPU_PALLAS"] = "0"
ctx2 = df.ExecutionContext()
ctx2.register_table("t", ctx.table("t"))
out2 = ctx2.sql("SELECT k, COUNT(v), MIN(v) FROM t WHERE k < 1003 GROUP BY k ORDER BY k").result_str()
assert out == out2, (out, out2)
print("ok")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "DFTPU_X64": "0", "DFTPU_PALLAS": "1", "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    assert "ok" in proc.stdout


def test_dense_multi_key(monkeypatch):
    """Multiple small-domain keys pack into one mixed-radix dense id —
    the TPC-H Q1 shape (GROUP BY returnflag, linestatus) runs sort-free."""
    monkeypatch.setenv("DFTPU_PALLAS", "1")
    import numpy as np

    from datafusion_tpu import ExecutionContext, Table

    rng = np.random.default_rng(3)
    n = 4096
    data = {
        "f": [["A", "N", "R"][i] for i in rng.integers(0, 3, n)],
        "s": [["F", "O"][i] for i in rng.integers(0, 2, n)],
        "k": (rng.integers(0, 5, n) + 10).astype(np.int32),
        "v": rng.random(n).astype(np.float32),
    }
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict(data))
    notes = ctx.sql(
        "EXPLAIN VERBOSE SELECT f, s, k, SUM(v), COUNT(v) FROM t GROUP BY f, s, k"
    ).result_str()
    assert "dense sort-free group-by (dict=3 x dict=2 x int[10,14])" in notes, notes
    out = ctx.sql(
        "SELECT f, s, k, COUNT(v) FROM t GROUP BY f, s, k ORDER BY f, s, k"
    ).result_str()
    monkeypatch.setenv("DFTPU_PALLAS", "0")
    ctx2 = ExecutionContext()
    ctx2.register_table("t", Table.from_pydict(data))
    ref = ctx2.sql(
        "SELECT f, s, k, COUNT(v) FROM t GROUP BY f, s, k ORDER BY f, s, k"
    ).result_str()
    assert out == ref
