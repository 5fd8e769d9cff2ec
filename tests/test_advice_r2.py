"""Regression tests for the round-1 advisor findings (ADVICE.md) and the
round-1 judge's STDDEV-numerics item (VERDICT.md weak #7)."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.errors import ParserError


def _ctx(**cols):
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict(cols))
    return ctx


# ---------------------------------------------- PERCENTILE_DISC ... DESC
def test_percentile_disc_desc_ansi_boundary():
    # ANSI: first value in DESC order with cume_dist >= q. Over [1,2,3,4]
    # q=0.5 DESC must return 3 (the q->1-q flip returned 2 — off by one
    # exactly on cumulative-fraction boundaries).
    ctx = _ctx(x=np.array([1.0, 2.0, 3.0, 4.0]))
    q = lambda s: ctx.sql(s).result_str()
    assert q(
        "SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x DESC) FROM t"
    ) == "3.0\n"
    # q=0 -> the first DESC value = max; q=1 -> the last = min
    assert q(
        "SELECT PERCENTILE_DISC(0.0) WITHIN GROUP (ORDER BY x DESC) FROM t"
    ) == "4.0\n"
    assert q(
        "SELECT PERCENTILE_DISC(1.0) WITHIN GROUP (ORDER BY x DESC) FROM t"
    ) == "1.0\n"
    # off-boundary fraction: q=0.4 over n=4 -> ceil(1.6)=2nd DESC value
    assert q(
        "SELECT PERCENTILE_DISC(0.4) WITHIN GROUP (ORDER BY x DESC) FROM t"
    ) == "3.0\n"
    # ASC semantics unchanged
    assert q(
        "SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x) FROM t"
    ) == "2.0\n"


def test_percentile_disc_desc_grouped_and_distributed():
    from datafusion_tpu.parallel.mesh import make_mesh

    def mk(mesh=None):
        ctx = ExecutionContext(mesh=mesh)
        ctx.register_table(
            "g",
            Table.from_pydict(
                {
                    "k": ["a", "a", "a", "a", "b", "b", "b"],
                    "x": np.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0]),
                }
            ),
        )
        return ctx

    sql = (
        "SELECT k, PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x DESC) "
        "FROM g GROUP BY k ORDER BY k"
    )
    out = mk().sql(sql).result_str()
    assert out == '"a"\t3.0\n"b"\t20.0\n'
    assert mk(make_mesh()).sql(sql).result_str() == out


# ------------------------------------------------- window frame bounds
def test_unbounded_following_start_rejected():
    ctx = _ctx(x=np.array([1.0, 2.0, 3.0]))
    with pytest.raises(ParserError, match="start"):
        ctx.sql(
            "SELECT SUM(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED "
            "FOLLOWING AND CURRENT ROW) FROM t"
        )
    with pytest.raises(ParserError, match="end"):
        ctx.sql(
            "SELECT SUM(x) OVER (ORDER BY x ROWS BETWEEN CURRENT ROW "
            "AND UNBOUNDED PRECEDING) FROM t"
        )
    with pytest.raises(ParserError, match="after"):
        ctx.sql(
            "SELECT SUM(x) OVER (ORDER BY x ROWS BETWEEN 1 FOLLOWING "
            "AND 1 PRECEDING) FROM t"
        )
    # the valid frames still parse and execute
    out = ctx.sql(
        "SELECT SUM(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING "
        "AND 1 FOLLOWING) FROM t"
    ).result_str()
    assert out == "3.0\n6.0\n5.0\n"


# ---------------------------------------------------- STDDEV stability
def test_stddev_stable_when_mean_dominates():
    # mean ~ 1e6, stddev ~ 1e-2: the old single-pass E[x^2]-E[x]^2 form
    # cancels catastrophically (under f32 physical dtype it returns 0 or
    # garbage); the two-pass form stays accurate.
    rng = np.random.default_rng(7)
    base = 1.0e6
    noise = rng.normal(0.0, 1e-2, size=4096)
    vals = base + noise
    ctx = _ctx(v=vals)
    out = ctx.sql("SELECT STDDEV_POP(v), VAR_POP(v) FROM t").result_str()
    got_std, got_var = (float(c) for c in out.strip().split("\t"))
    assert abs(got_std - np.std(vals)) / np.std(vals) < 1e-3
    assert abs(got_var - np.var(vals)) / np.var(vals) < 1e-3


def test_stddev_stable_grouped_and_distributed():
    from datafusion_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    n = 512
    ks = np.array(["a", "b"] * (n // 2))
    vals = 5.0e5 + rng.normal(0.0, 0.5, size=n)

    def mk(mesh=None):
        ctx = ExecutionContext(mesh=mesh)
        ctx.register_table("g", Table.from_pydict({"k": list(ks), "v": vals}))
        return ctx

    sql = "SELECT k, STDDEV(v), VAR_POP(v) FROM g GROUP BY k ORDER BY k"
    out = mk().sql(sql).result_str()
    for line, key in zip(out.strip().split("\n"), ("a", "b")):
        cells = line.split("\t")
        sub = vals[ks == key]
        assert abs(float(cells[1]) - np.std(sub, ddof=1)) / np.std(sub, ddof=1) < 1e-3
        assert abs(float(cells[2]) - np.var(sub)) / np.var(sub) < 1e-3
    # distributed: var/stddev localize their groups via repartition
    assert mk(make_mesh()).sql(sql).result_str() == out


def test_stddev_null_and_small_n_semantics():
    ctx = _ctx(v=np.array([42.0]))
    # sample variants NULL at n<=1; population defined at n=1
    assert ctx.sql("SELECT STDDEV(v), VARIANCE(v) FROM t").result_str() == "NULL\tNULL\n"
    assert ctx.sql("SELECT STDDEV_POP(v), VAR_POP(v) FROM t").result_str() == "0.0\t0.0\n"
