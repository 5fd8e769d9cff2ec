"""Overflow-retry on the RAGGED shuffle sites (VERDICT r2 next #9).

The fixed-slab path's split_cap overflow retry is covered by
test_overflow_retry.py; these exercise the `pmax(max_split)` growth loop
on both ragged sites: the ragged repartition exchange and the fused
exchange+fold aggregate. Skewed keys route (nearly) every row to one
device, so the per-destination split overflows the 2*local/n default
split capacity and the first execution must recompile bigger and retry
to reproduce single-chip results.
"""

import os

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.parallel.mesh import make_mesh


def _skewed_data(n=8192, seed=9):
    rng = np.random.default_rng(seed)
    # ~95% of rows share one group key: after hash-repartition, one
    # device receives ~n*0.95 rows while split_cap ~ 2*(n/8)/8
    k = np.where(rng.random(n) < 0.95, 7, rng.integers(0, 50, n)).astype(
        np.int32
    )
    return {"k": k, "v": rng.random(n).astype(np.float32)}


def _run(sql, data, **env_kv):
    env = dict(os.environ)
    os.environ.update(env_kv)
    try:
        dist = ExecutionContext(mesh=make_mesh())
        dist.register_table("t", Table.from_pydict(dict(data)))
        got = dist.sql(sql).result_str()
    finally:
        os.environ.clear()
        os.environ.update(env)
    single = ExecutionContext()
    single.register_table("t", Table.from_pydict(dict(data)))
    want = single.sql(sql).result_str()
    return got, want


def _approx(a, b):
    la, lb = a.splitlines(), b.splitlines()
    if len(la) != len(lb):
        return False
    for ra, rb in zip(la, lb):
        if ra == rb:
            continue
        for x, y in zip(ra.split("\t"), rb.split("\t")):
            if x == y:
                continue
            try:
                if abs(float(x) - float(y)) <= 1e-3 * (1 + abs(float(y))):
                    continue
            except ValueError:
                return False
            else:
                continue
            return False
    return True


def test_ragged_repartition_split_overflow_retries():
    data = _skewed_data()
    # MEDIAN forces the repartition path; ragged shuffle moves the rows
    got, want = _run(
        "SELECT k, MEDIAN(v), COUNT(v) FROM t GROUP BY k ORDER BY k",
        data,
        DFTPU_SHUFFLE="ragged",
        DFTPU_AGG_STRATEGY="repartition",
        DFTPU_PALLAS="1",
    )
    assert _approx(got, want), f"--- ragged ---\n{got}\n--- single ---\n{want}"


def test_fold_split_overflow_retries():
    data = _skewed_data()
    got, want = _run(
        "SELECT k, SUM(v), COUNT(v) FROM t GROUP BY k ORDER BY k",
        data,
        DFTPU_AGG_STRATEGY="fold",
        DFTPU_PALLAS="1",
    )
    assert _approx(got, want), f"--- fold ---\n{got}\n--- single ---\n{want}"


def test_ragged_shuffle_join_split_overflow_retries():
    data = _skewed_data()
    rng = np.random.default_rng(3)
    dim = {
        "pk": np.arange(64, dtype=np.int32),
        "w": rng.random(64).astype(np.float32),
    }
    env = dict(os.environ)
    os.environ.update(
        DFTPU_SHUFFLE="ragged", DFTPU_JOIN_STRATEGY="shuffle", DFTPU_PALLAS="1"
    )
    sql = (
        "SELECT t.k, COUNT(d.w), MAX(d.w) FROM t JOIN d ON t.k = d.pk "
        "GROUP BY t.k ORDER BY k"
    )
    try:
        dist = ExecutionContext(mesh=make_mesh())
        dist.register_table("t", Table.from_pydict(dict(data)))
        dist.register_table("d", Table.from_pydict(dict(dim)))
        got = dist.sql(sql).result_str()
    finally:
        os.environ.clear()
        os.environ.update(env)
    single = ExecutionContext()
    single.register_table("t", Table.from_pydict(dict(data)))
    single.register_table("d", Table.from_pydict(dict(dim)))
    want = single.sql(sql).result_str()
    assert _approx(got, want), f"--- ragged join ---\n{got}\n--- single ---\n{want}"
