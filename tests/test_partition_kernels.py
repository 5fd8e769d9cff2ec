"""Kernel-level tests for the slab partition + windowed reduce
(ops/pallas/partition.py), pallas interpret mode on CPU.

The SQL-level bigdense tests (test_bigdense_groupby.py) cover the
aggregate contract; these pin the kernels' own invariants:
  * every input row appears exactly once in the slab, payloads aligned
  * every SLAB_CHUNK-aligned chunk holds rows of ONE bucket
  * alignment gaps decode to SENTINEL (the -SENTINEL placement trick)
  * the windowed reduce matches numpy reductions for every op
  * skewed bucket distributions and multiple grid blocks
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from datafusion_tpu.ops.pallas.partition import (
    SENTINEL,
    SLAB_CHUNK,
    WINDOW,
    pick_pblock,
    slab_partition,
    windowed_reduce,
)


def _slab(gid, cols, nslots, pblock=None):
    n = len(gid)
    gcap = nslots + 1
    id_mod = 1 << (gcap - 1).bit_length()
    nb = -(-gcap // WINDOW)
    outs = slab_partition(
        jnp.asarray(gid.astype(np.float32)),
        tuple(jnp.asarray(c) for c in cols),
        n_buckets=nb,
        id_mod=id_mod,
        pblock=pblock or pick_pblock(n),
        interpret=True,
    )
    return [np.asarray(jax.device_get(o)) for o in outs], id_mod


@pytest.mark.parametrize(
    "n,nslots,skew",
    [(2048, 3000, False), (4096, 66000, False), (8192, 10000, True)],
)
def test_slab_partition_invariants(n, nslots, skew):
    rng = np.random.default_rng(7)
    if skew:
        gid = np.where(
            rng.random(n) < 0.8, 9999, rng.integers(0, nslots, n)
        ).astype(np.int32)
    else:
        gid = rng.integers(0, nslots, n).astype(np.int32)
    v = np.arange(n, dtype=np.float32)  # unique payloads = row identity
    (og, ov), id_mod = _slab(gid, [v], nslots)
    sel = og < SENTINEL
    # exactly the input rows survive, with aligned payloads
    assert sel.sum() == n
    got = sorted(zip(og[sel].astype(np.int64).tolist(), ov[sel].tolist()))
    want = sorted(zip(gid.astype(np.int64).tolist(), v.tolist()))
    assert got == want
    # single bucket per chunk
    og_i = og.astype(np.int64)
    for c in range(len(og) // SLAB_CHUNK):
        s = og_i[c * SLAB_CHUNK : (c + 1) * SLAB_CHUNK]
        s = s[s < SENTINEL]
        if len(s):
            w = (s % id_mod) // WINDOW
            assert (w == w[0]).all(), f"chunk {c}: {np.unique(w)}"


def test_windowed_reduce_all_ops():
    rng = np.random.default_rng(3)
    nslots = 9000
    n = 4096
    gid = rng.integers(0, nslots, n).astype(np.int32)
    f = (rng.random(n) * 100 - 50).astype(np.float32)
    iv = rng.integers(-(2**30), 2**30, n).astype(np.int32)
    mask = rng.random(n) < 0.7
    iv16 = (iv % 65536).astype(np.float32)  # int mod FIRST: f32(iv)
    # rounds above 2^24 and would change the residue
    (og, ofv, oiv, omk), id_mod = _slab(
        gid, [f, iv16, mask.astype(np.float32)], nslots
    )
    # NOTE: i32 transport as halves is the aggregate layer's job; here
    # iv rides mod 65536 (exact in f32) just to exercise an int op
    sel = og < SENTINEL
    gk = jnp.asarray(np.where(sel, og % id_mod, SENTINEL).astype(np.int32))
    m_all = jnp.asarray(sel)
    m_op = jnp.asarray(sel & (omk > 0.5))
    vals = (
        jnp.asarray(ofv),
        jnp.asarray(ofv),
        jnp.asarray(oiv.astype(np.int32)),
        jnp.asarray(ofv),
    )
    outs = windowed_reduce(
        gk,
        vals,
        (m_all, m_op, m_all, m_op),
        ops=("count", "sum", "min", "max"),
        num_groups=nslots + 1,
        interpret=True,
    )
    cnt, sm, mn, mx = [np.asarray(jax.device_get(o)) for o in outs]
    wc = np.bincount(gid, minlength=nslots)
    ws = np.zeros(nslots)
    np.add.at(ws, gid[mask], f[mask].astype(np.float64))
    wm = np.full(nslots, np.iinfo(np.int32).max)
    np.minimum.at(wm, gid, (iv % 65536).astype(np.int64))
    wx = np.full(nslots, -np.inf)
    np.maximum.at(wx, gid[mask], f[mask])
    assert np.array_equal(cnt[:nslots], wc.astype(np.float32))
    assert np.allclose(sm[:nslots], ws, rtol=1e-4, atol=1e-3)
    assert np.array_equal(mn[:nslots], wm.astype(np.int32))
    present = wx > -np.inf
    assert np.array_equal(mx[:nslots][present], wx[present].astype(np.float32))
