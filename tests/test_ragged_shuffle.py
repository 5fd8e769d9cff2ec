"""Ragged Pallas RDMA shuffle (DFTPU_SHUFFLE=ragged) parity vs the
fixed-slab lax.all_to_all path, on the 8-virtual-device CPU mesh in
Pallas interpret mode (ops/pallas/ragged_shuffle.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

import datafusion_tpu as df
from datafusion_tpu.parallel.mesh import AXIS, make_mesh


def _run_repartition(strategy, n_per_dev, split_cap, seed=0, monkeypatch=None):
    from datafusion_tpu.parallel import shuffle as sh

    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    rng = np.random.default_rng(seed)
    n = n_dev * n_per_dev
    data_f = rng.random(n).astype(np.float32) * 100
    data_i = rng.integers(-1000, 1000, n).astype(np.int32)
    valid_i = rng.random(n) < 0.8
    sel = rng.random(n) < 0.7
    dst = rng.integers(0, n_dev, n).astype(np.int32)

    def body(df_, di, vi, s, d):
        cols, new_sel, mx = sh.repartition(
            [(df_, None), (di, vi)], d, s, n_dev, split_cap
        )
        return cols[0][0], cols[1][0], cols[1][1], new_sel, mx[None]

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS),) * 5,
        out_specs=(P(AXIS),) * 5,
        check_vma=False,
    )
    monkeypatch.setenv("DFTPU_SHUFFLE", strategy)
    out = jax.jit(f)(
        jnp.array(data_f), jnp.array(data_i), jnp.array(valid_i),
        jnp.array(sel), jnp.array(dst),
    )
    fd, idata, ivalid, nsel, mx = (np.asarray(x) for x in out)
    # canonical comparison: selected rows per receiving device, as a
    # sorted multiset (region order inside a device is an impl detail)
    per_dev = []
    for dev in range(n_dev):
        lo, hi = dev * n_dev * split_cap, (dev + 1) * n_dev * split_cap
        m = nsel[lo:hi]
        rows = sorted(
            zip(
                fd[lo:hi][m].tolist(),
                idata[lo:hi][m].tolist(),
                ivalid[lo:hi][m].tolist(),
            )
        )
        per_dev.append(rows)
    return per_dev, int(mx.max())


@pytest.mark.parametrize("split_cap", [128, 256, 1024])
def test_ragged_matches_fixed(split_cap, monkeypatch):
    fixed, mxf = _run_repartition("fixed", 256, split_cap, monkeypatch=monkeypatch)
    ragged, mxr = _run_repartition("ragged", 256, split_cap, monkeypatch=monkeypatch)
    assert mxf == mxr
    assert fixed == ragged


def test_ragged_matches_expected_rows(monkeypatch):
    # ground truth: every selected row lands exactly once on hash dst
    from datafusion_tpu.parallel import shuffle as sh

    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    per_dev, _ = _run_repartition("ragged", 64, 128, seed=3, monkeypatch=monkeypatch)
    rng = np.random.default_rng(3)
    n = n_dev * 64
    data_f = rng.random(n).astype(np.float32) * 100
    data_i = rng.integers(-1000, 1000, n).astype(np.int32)
    valid_i = rng.random(n) < 0.8
    sel = rng.random(n) < 0.7
    dst = rng.integers(0, n_dev, n).astype(np.int32)
    for dev in range(n_dev):
        m = sel & (dst == dev)
        want = sorted(
            zip(data_f[m].tolist(), data_i[m].tolist(), valid_i[m].tolist())
        )
        assert per_dev[dev] == want


def test_ragged_end_to_end_queries(monkeypatch):
    """Whole queries through the SPMD compiler with the ragged exchange
    underneath every repartition site (sample sort, shuffle join,
    repartition aggregate) — byte-parity with single-chip results."""
    monkeypatch.setenv("DFTPU_SHUFFLE", "ragged")
    rng = np.random.default_rng(17)
    n = 8192
    data = {
        "k": rng.integers(0, 500, n).astype(np.int64),
        "v": rng.random(n).astype(np.float64),
        "w": rng.integers(-100, 100, n).astype(np.int32),
    }
    build = {
        "k": np.arange(500, dtype=np.int64),
        "name": np.array([f"n{i:03d}" for i in range(500)], dtype=object),
    }
    sqls = [
        ("SELECT k, v FROM t ORDER BY v LIMIT 4200", {}),
        ("SELECT w, COUNT(v), SUM(v) FROM t GROUP BY w ORDER BY w",
         {"DFTPU_AGG_STRATEGY": "repartition"}),
        ("SELECT t.k, b.name, t.v FROM t JOIN b ON t.k = b.k "
         "ORDER BY t.v LIMIT 900",
         {"DFTPU_JOIN_STRATEGY": "shuffle"}),
    ]
    for sql, env in sqls:
        for key, val in env.items():
            monkeypatch.setenv(key, val)
        ctx1 = df.ExecutionContext()
        ctx1.register_table("t", df.Table.from_pydict(dict(data)))
        ctx1.register_table("b", df.Table.from_pydict(dict(build)))
        ctx2 = df.ExecutionContext(mesh=make_mesh())
        ctx2.register_table("t", df.Table.from_pydict(dict(data)))
        ctx2.register_table("b", df.Table.from_pydict(dict(build)))
        assert ctx1.sql(sql).result_str() == ctx2.sql(sql).result_str(), sql
        for key in env:
            monkeypatch.delenv(key)
