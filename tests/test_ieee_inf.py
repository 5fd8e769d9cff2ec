"""IEEE-754 float SUM semantics for NaN/±inf inputs on EVERY kernel
path (VERDICT r3 next #4: the r3 NANSAFE_K encoding collapsed ±inf to
NaN on pallas paths while XLA paths kept IEEE — a path-dependent
semantic fork). Expected per-group results, matching the reference
engine's IEEE accumulation (aggregate.rs sum accumulators add natively):

  group with +inf only            -> +inf
  group with -inf only            -> -inf
  group with both +inf and -inf   -> NaN
  group with any NaN              -> NaN
  all-finite groups               -> exact finite sum

Each test crafts key shapes that engage one strategy; correctness is
asserted on values (so a strategy fallback can't silently pass the
wrong path) plus XLA-vs-pallas string parity."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.parallel.mesh import make_mesh


def _specials_data(n, kmax, seed=7):
    """Groups 1..5 poisoned as per the table above (group ids are k %
    kmax but the special rows use small fixed keys so they exist at any
    kmax >= 8)."""
    rng = np.random.default_rng(seed)
    k = rng.integers(6, kmax, n).astype(np.int32)
    v = rng.random(n).astype(np.float32)
    # reserve keys 0..5: finite control, +inf, -inf, both, NaN, inf+NaN
    k[:12] = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    v[:12] = [1.0, 2.0, np.inf, 1.0, -np.inf, 1.0, np.inf, -np.inf,
              np.nan, 1.0, np.inf, np.nan]
    return k, v


EXPECT = {0: 3.0, 1: np.inf, 2: -np.inf, 3: np.nan, 4: np.nan, 5: np.nan}


def _check(rows):
    got = {r["k"]: float(r["SUM"]) for r in rows if r["k"] in EXPECT}
    assert set(got) == set(EXPECT), rows[:8]
    for kk, want in EXPECT.items():
        if np.isnan(want):
            assert np.isnan(got[kk]), (kk, got[kk])
        else:
            assert got[kk] == want, (kk, got[kk], want)


def _run(sql, tables, mesh=None, env=None, monkeypatch=None):
    if env:
        for kk, vv in env.items():
            monkeypatch.setenv(kk, vv)
    ctx = ExecutionContext(mesh=mesh) if mesh else ExecutionContext()
    for name, t in tables.items():
        ctx.register_table(name, t)
    return ctx.sql(sql)


SQL = "SELECT k, SUM(v) FROM t GROUP BY k ORDER BY k"


def test_ieee_specials_packed_sort(monkeypatch):
    # wide probed int domain (> bigdense cap) -> packed-gid co-sort +
    # segreduce kernel
    monkeypatch.setenv("DFTPU_PALLAS", "1")
    k, v = _specials_data(4096, 100_000)
    t = Table.from_pydict({"k": k, "v": v})
    _check(_run(SQL, {"t": t}).to_pylist())


def test_ieee_specials_dense_window(monkeypatch):
    # small probed domain -> sort-free dense segreduce
    monkeypatch.setenv("DFTPU_PALLAS", "1")
    k, v = _specials_data(4096, 40)
    t = Table.from_pydict({"k": k, "v": v})
    _check(_run(SQL, {"t": t}).to_pylist())


def test_ieee_specials_bigdense(monkeypatch):
    # domain past the dense window with the bigdense slab path opted in
    monkeypatch.setenv("DFTPU_PALLAS", "1")
    monkeypatch.setenv("DFTPU_BIGDENSE", "1")
    k, v = _specials_data(8192, 4000)
    t = Table.from_pydict({"k": k, "v": v})
    _check(_run(SQL, {"t": t}).to_pylist())


def test_ieee_specials_matches_xla_string(monkeypatch):
    # byte parity between the kernel path and the XLA fallback on the
    # same specials-containing input (the r3 fork this fixes)
    k, v = _specials_data(4096, 100_000)
    t = Table.from_pydict({"k": k, "v": v})
    monkeypatch.setenv("DFTPU_PALLAS", "0")
    a = _run(SQL, {"t": t}).result_str()
    monkeypatch.setenv("DFTPU_PALLAS", "1")
    b = _run(SQL, {"t": t}).result_str()
    assert a == b


@pytest.mark.parametrize("strategy", ["fold", "repartition", "auto"])
def test_ieee_specials_distributed(monkeypatch, strategy):
    monkeypatch.setenv("DFTPU_PALLAS", "1")
    monkeypatch.setenv("DFTPU_AGG_STRATEGY", strategy)
    k, v = _specials_data(8192, 3000)
    t = Table.from_pydict({"k": k, "v": v})
    ctx = ExecutionContext(mesh=make_mesh())
    ctx.register_table("t", t)
    _check(ctx.sql(SQL).to_pylist())


def test_ieee_specials_dense_dist(monkeypatch):
    # dictionary (string) key with a small vocab -> the dense-dist
    # per-shard table merge (this path fed RAW float sums to the kernel
    # before r4 — one-hot poisoning)
    monkeypatch.setenv("DFTPU_PALLAS", "1")
    k, v = _specials_data(8192, 30)
    s = np.array([f"g{i:03d}" for i in k], dtype=object)
    t = Table.from_pydict({"s": s, "v": v})
    ctx = ExecutionContext(mesh=make_mesh())
    ctx.register_table("t", t)
    rows = ctx.sql("SELECT s, SUM(v) FROM t GROUP BY s ORDER BY s").to_pylist()
    got = {r["s"]: float(r["SUM"]) for r in rows}
    for kk, want in EXPECT.items():
        name = f"g{kk:03d}"
        if np.isnan(want):
            assert np.isnan(got[name]), (name, got[name])
        else:
            assert got[name] == want, (name, got[name], want)


def test_ieee_specials_ungrouped(monkeypatch):
    # whole-column SUM rides jnp.sum on raw values — IEEE by
    # construction; pin it so a future kernel path can't regress it
    monkeypatch.setenv("DFTPU_PALLAS", "1")
    v = np.array([1.0, np.inf, 2.0], dtype=np.float32)
    t = Table.from_pydict({"v": v})
    rows = _run("SELECT SUM(v) FROM t", {"t": t}).to_pylist()
    assert float(rows[0]["SUM"]) == np.inf
