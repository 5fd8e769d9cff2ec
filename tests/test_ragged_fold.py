"""Fused ragged-exchange + dense aggregate fold kernel
(ops/pallas/ragged_shuffle.py ragged_exchange_fold): windows match a
numpy oracle on the 8-virtual-device CPU mesh (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from datafusion_tpu.parallel.mesh import AXIS, make_mesh


@pytest.mark.parametrize("dom,ops", [
    (40, ("sum", "count")),
    (300, ("sum", "count", "min", "max")),
    (2048 * 8, ("sum", "count")),  # local window at the 2048 cap
])
def test_exchange_fold_matches_oracle(dom, ops):
    from datafusion_tpu.ops.pallas.ragged_shuffle import ragged_exchange_fold

    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    split_cap = 1024  # fused fold requires 1024-row chunks
    rng = np.random.default_rng(dom)
    num_groups = -(-dom // n_dev)

    # per-device region-layout inputs, built host-side: each device's
    # rows already sorted into per-destination regions
    gid_r = np.zeros((n_dev, n_dev * split_cap), np.int32)
    val_r = np.zeros((n_dev, n_dev * split_cap), np.float32)
    ival_r = np.zeros((n_dev, n_dev * split_cap), np.int32)
    msk_r = np.zeros((n_dev, n_dev * split_cap), np.int8)
    sizes = np.zeros((n_dev, n_dev), np.int32)
    all_g, all_v, all_iv, all_m = [], [], [], []
    for dev in range(n_dev):
        n_rows = int(rng.integers(100, 900))
        g = rng.integers(0, dom, n_rows).astype(np.int32)
        v = (rng.random(n_rows) * 100 - 50).astype(np.float32)
        iv = rng.integers(-(2**30), 2**30, n_rows).astype(np.int32)
        m = (rng.random(n_rows) < 0.8).astype(np.int8)
        all_g.append(g); all_v.append(v); all_iv.append(iv); all_m.append(m)
        dst = g % n_dev
        for d in range(n_dev):
            rows = np.flatnonzero(dst == d)
            sizes[dev, d] = len(rows)
            s = d * split_cap
            gid_r[dev, s : s + len(rows)] = g[rows] // n_dev
            val_r[dev, s : s + len(rows)] = v[rows]
            ival_r[dev, s : s + len(rows)] = iv[rows]
            msk_r[dev, s : s + len(rows)] = m[rows]

    def body(g, v, iv, m, sz):
        outs = ragged_exchange_fold(
            g,
            (v, v, iv, iv)[: len(ops)],
            (m,),
            sz.reshape(n_dev, n_dev),
            ops=ops,
            mask_map=(1,) * len(ops),  # 0 = implicit all-valid
            n_dev=n_dev,
            split_cap=split_cap,
            chunk=1024,
            num_groups=num_groups,
            interpret=True,
        )
        return outs

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS),) * len(ops),
        check_vma=False,
    )
    outs = jax.jit(f)(
        jnp.array(gid_r.reshape(-1)),
        jnp.array(val_r.reshape(-1)),
        jnp.array(ival_r.reshape(-1)),
        jnp.array(msk_r.reshape(-1)),
        jnp.array(np.tile(sizes.reshape(-1), n_dev).reshape(n_dev, -1).reshape(-1)),
    )
    outs = [np.asarray(o).reshape(n_dev, num_groups) for o in outs]

    # oracle: global fold, then per-device slices (group g lives at
    # window g // n_dev on device g % n_dev)
    G = np.concatenate(all_g)
    V = np.concatenate(all_v)
    IV = np.concatenate(all_iv)
    M = np.concatenate(all_m).astype(bool)
    for a, op in enumerate(ops):
        got = outs[a]
        for g in range(dom):
            rows = (G == g) & M
            dev, w = g % n_dev, g // n_dev
            if op == "sum":
                want = V[rows].sum(dtype=np.float64)
                assert np.isclose(got[dev, w], want, rtol=1e-5, atol=1e-4), (op, g)
            elif op == "count":
                assert got[dev, w] == rows.sum(), (op, g)
            elif op == "min":
                want = IV[rows].min() if rows.any() else np.iinfo(np.int32).max
                assert got[dev, w] == want, (op, g)
            elif op == "max":
                want = IV[rows].max() if rows.any() else np.iinfo(np.int32).min
                assert got[dev, w] == want, (op, g)
