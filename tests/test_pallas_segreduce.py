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


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_with_masks(seed):
    """Random sorted gids + random per-op masks (validity patterns),
    min/max via the scanned path, sums, counts — vs numpy."""
    rng = np.random.default_rng(seed)
    n = BLOCK * 4
    g = rng.integers(20, 400)
    gid = np.sort(rng.integers(0, g, n)).astype(np.int32)
    _, gid = np.unique(gid, return_inverse=True)
    gid = gid.astype(np.int32)
    num_groups = int(gid.max()) + 1
    vals = (rng.standard_normal(n) * 50).astype(np.float32)
    m1 = rng.random(n) < 0.8
    m2 = rng.random(n) < 0.5
    outs = segmented_reduce_sorted(
        jnp.asarray(gid),
        (jnp.asarray(vals),) * 4,
        (jnp.asarray(m1), jnp.asarray(m1), jnp.asarray(m2), jnp.asarray(m2)),
        ops=("min", "max", "sum", "count"),
        num_groups=num_groups,
        interpret=True,
    )
    mn, mx, s, c = (np.asarray(o) for o in outs)
    for grp in range(num_groups):
        sel1 = (gid == grp) & m1
        sel2 = (gid == grp) & m2
        if sel1.any():
            assert mn[grp] == vals[sel1].min(), (grp, "min")
            assert mx[grp] == vals[sel1].max(), (grp, "max")
        else:
            assert np.isinf(mn[grp]) and np.isinf(mx[grp])
        np.testing.assert_allclose(
            s[grp], vals[sel2].sum(dtype=np.float64), rtol=2e-5, atol=1e-3
        )
        assert c[grp] == sel2.sum()


def test_run_spanning_blocks():
    """A single group spanning multiple blocks must combine correctly
    through the scanned min/max path."""
    n = BLOCK * 3
    gid = np.zeros(n, np.int32)
    gid[2 * BLOCK + 100 :] = 1
    vals = np.arange(n, dtype=np.float32)
    vals[BLOCK + 7] = -99.0  # min in the middle block of group 0
    mask = np.ones(n, np.bool_)
    outs = segmented_reduce_sorted(
        jnp.asarray(gid),
        (jnp.asarray(vals), jnp.asarray(vals)),
        (jnp.asarray(mask), jnp.asarray(mask)),
        ops=("min", "max"),
        num_groups=2,
        interpret=True,
    )
    mn, mx = (np.asarray(o) for o in outs)
    assert mn[0] == -99.0 and mx[0] == 2 * BLOCK + 99
    assert mn[1] == 2 * BLOCK + 100 and mx[1] == n - 1
