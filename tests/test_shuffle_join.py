"""Hash-repartitioned (shuffle) distributed join vs single-chip results,
including a skewed-key case that exercises the overflow→recompile path."""

import numpy as np
import pytest

import jax

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def join_case(seed=0, n_fact=4000, n_dim=800, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # 60% of fact rows hit one hot key
        hot = np.full(int(n_fact * 0.6), 7, np.int32)
        cold = rng.integers(0, n_dim, n_fact - len(hot)).astype(np.int32)
        fk = np.concatenate([hot, cold])
        rng.shuffle(fk)
    else:
        fk = rng.integers(0, n_dim * 2, n_fact).astype(np.int32)
    fact = {"fk": fk, "x": rng.integers(0, 1000, n_fact).astype(np.int64)}
    dim = {
        "pk": np.arange(n_dim, dtype=np.int32),
        "w": rng.random(n_dim).astype(np.float64),
    }
    return fact, dim


SQL = (
    "SELECT fact.fk, COUNT(fact.x), SUM(fact.x) FROM fact "
    "JOIN dim ON fact.fk = dim.pk GROUP BY fk ORDER BY fk"
)


def run(mesh_or_none, fact, dim, monkeypatch, strategy):
    monkeypatch.setenv("DFTPU_JOIN_STRATEGY", strategy)
    ctx = ExecutionContext(mesh=mesh_or_none)
    ctx.register_table("fact", Table.from_pydict(fact))
    ctx.register_table("dim", Table.from_pydict(dim))
    return ctx.sql(SQL).result_str()


def test_shuffle_join_matches_single(mesh, monkeypatch):
    fact, dim = join_case()
    single = run(None, fact, dim, monkeypatch, "auto")
    shuffled = run(mesh, fact, dim, monkeypatch, "shuffle")
    assert single == shuffled


def test_shuffle_join_skewed_keys(mesh, monkeypatch):
    # the hot key concentrates 2400 rows on one destination device —
    # far beyond the balanced split capacity → overflow + recompile
    fact, dim = join_case(skew=True)
    single = run(None, fact, dim, monkeypatch, "auto")
    shuffled = run(mesh, fact, dim, monkeypatch, "shuffle")
    assert single == shuffled


def test_broadcast_vs_shuffle_agree(mesh, monkeypatch):
    fact, dim = join_case(seed=5)
    b = run(mesh, fact, dim, monkeypatch, "broadcast")
    s = run(mesh, fact, dim, monkeypatch, "shuffle")
    assert b == s


def test_shuffle_join_extreme_skew_salted(mesh, monkeypatch):
    # 90% of rows on one key: needed salt exceeds 2 — probe rows spread
    # across salted destinations and build rows replicate to match
    fact, dim = join_case(skew=False, n_fact=6000)
    fact["fk"][: int(6000 * 0.9)] = 3
    single = run(None, fact, dim, monkeypatch, "auto")
    shuffled = run(mesh, fact, dim, monkeypatch, "shuffle")
    assert single == shuffled


def test_shuffle_left_join_skewed(mesh, monkeypatch):
    fact, dim = join_case(skew=True)
    sql = (
        "SELECT fact.fk, COUNT(fact.x) FROM fact "
        "LEFT JOIN dim ON fact.fk = dim.pk GROUP BY fk ORDER BY fk"
    )
    monkeypatch.setenv("DFTPU_JOIN_STRATEGY", "auto")
    ctx1 = ExecutionContext()
    ctx1.register_table("fact", Table.from_pydict(fact))
    ctx1.register_table("dim", Table.from_pydict(dim))
    monkeypatch.setenv("DFTPU_JOIN_STRATEGY", "shuffle")
    ctx2 = ExecutionContext(mesh=mesh)
    ctx2.register_table("fact", Table.from_pydict(fact))
    ctx2.register_table("dim", Table.from_pydict(dim))
    assert ctx1.sql(sql).result_str() == ctx2.sql(sql).result_str()
