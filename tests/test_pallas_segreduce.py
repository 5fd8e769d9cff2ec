"""Pallas segmented-reduce kernel vs XLA segment ops (interpret mode on
CPU; the real kernel runs on TPU hardware)."""

import numpy as np
import pytest

import jax.numpy as jnp

from datafusion_tpu.ops.pallas.segreduce import BLOCK, segmented_reduce_sorted


def make_case(n, g, seed=0, invalid_tail=0):
    rng = np.random.default_rng(seed)
    # ascending gids over valid rows, then invalid tail parked at g
    n_valid = n - invalid_tail
    gid = np.sort(rng.integers(0, g, n_valid).astype(np.int32))
    # re-index to consecutive group ids (as the engine produces)
    _, gid = np.unique(gid, return_inverse=True)
    gid = gid.astype(np.int32)
    num_groups = int(gid.max()) + 1 if n_valid else 0
    full_gid = np.concatenate([gid, np.full(invalid_tail, num_groups, np.int32)])
    vals = rng.random(n).astype(np.float32) * 100
    mask = np.concatenate(
        [np.ones(n_valid, np.bool_), np.zeros(invalid_tail, np.bool_)]
    )
    return full_gid, vals, mask, num_groups


@pytest.mark.parametrize("invalid_tail", [0, 700])
def test_against_numpy(invalid_tail):
    n = BLOCK * 8
    gid, vals, mask, g = make_case(n, 300, invalid_tail=invalid_tail)
    outs = segmented_reduce_sorted(
        jnp.asarray(gid),
        (jnp.asarray(vals),) * 4,
        (jnp.asarray(mask),) * 4,
        ops=("sum", "count", "min", "max"),
        num_groups=g,
        interpret=True,
    )
    s, c, mn, mx = (np.asarray(o) for o in outs)
    for grp in range(g):
        m = (gid == grp) & mask
        np.testing.assert_allclose(s[grp], vals[m].sum(dtype=np.float64), rtol=1e-5)
        assert c[grp] == m.sum()
        assert mn[grp] == vals[m].min()
        assert mx[grp] == vals[m].max()


def test_single_group():
    n = BLOCK * 2
    gid = np.zeros(n, np.int32)
    vals = np.ones(n, np.float32)
    mask = np.ones(n, np.bool_)
    outs = segmented_reduce_sorted(
        jnp.asarray(gid),
        (jnp.asarray(vals),),
        (jnp.asarray(mask),),
        ops=("sum",),
        num_groups=1,
        interpret=True,
    )
    assert float(outs[0][0]) == n


def test_every_row_its_own_group():
    n = BLOCK * 2
    gid = np.arange(n, dtype=np.int32)
    vals = np.arange(n, dtype=np.float32)
    mask = np.ones(n, np.bool_)
    outs = segmented_reduce_sorted(
        jnp.asarray(gid),
        (jnp.asarray(vals),),
        (jnp.asarray(mask),),
        ops=("max",),
        num_groups=n,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(outs[0]), vals)
