"""Packed-gid co-sort GROUP BY (the wide-domain sort path).

When the compiler's int-range/dictionary probe finds a full key domain
that is too wide for the dense window (> ops/aggregate.DENSE_MAX_GROUPS)
but fits PACKED_MAX_GROUPS, grouped_aggregate packs (sel, keys) into ONE
dense i32 sort key: the notsel/per-key operands and the iota tie-break
drop out of the dominant co-sort, and group keys decode arithmetically
from the packed id. Parity is checked against the generic multi-operand
path (DFTPU_PACKED_AGG=0) — float sums tolerance-compared (summation
order differs by design, CLAUDE.md conventions).
"""

import os

import numpy as np
import pytest

import datafusion_tpu as df


def _run(q, tables, packed):
    env = dict(os.environ)
    os.environ["DFTPU_PACKED_AGG"] = "1" if packed else "0"
    try:
        ctx = df.ExecutionContext()
        for name, t in tables.items():
            ctx.register_datasource(name, t)
        return ctx.sql(q).to_pylist(), ctx
    finally:
        os.environ.clear()
        os.environ.update(env)


def _assert_parity(q, tables):
    got, _ = _run(q, tables, packed=True)
    want, _ = _run(q, tables, packed=False)
    assert len(got) == len(want)
    for ra, rb in zip(got, want):
        va = list(ra.values()) if isinstance(ra, dict) else list(ra)
        vb = list(rb.values()) if isinstance(rb, dict) else list(rb)
        assert len(va) == len(vb)
        for ca, cb in zip(va, vb):
            if isinstance(ca, float) and cb is not None:
                assert ca == pytest.approx(cb, rel=1e-4, abs=1e-4), (ra, rb)
            else:
                assert ca == cb, (ra, rb)
    return got


def _table(n=4096, dom=5000, seed=7, with_nulls=False):
    rng = np.random.default_rng(seed)
    cols = {
        "k": rng.integers(0, dom, n).astype(np.int32),
        "k2": rng.integers(0, 3, n).astype(np.int32),
        "lat": (rng.random(n) * 40 + 30).astype(np.float32),
        "lng": (rng.random(n) * 360 - 180).astype(np.float32),
    }
    if with_nulls:
        from datafusion_tpu.schema import DataType, Field, Schema

        schema = Schema(
            [
                Field("k", DataType.Int32),
                Field("k2", DataType.Int32),
                Field("lat", DataType.Float32, True),
                Field("lng", DataType.Float32),
            ]
        )
        return df.Table.from_arrays(
            schema,
            list(cols.values()),
            validity=[None, None, np.arange(n) % 7 != 0, None],
        )
    return df.Table.from_pydict(cols)


def test_packed_note_engages():
    t = _table()
    ctx = df.ExecutionContext()
    ctx.register_datasource("big", t)
    r = ctx.sql("EXPLAIN VERBOSE SELECT k, MIN(lat) FROM big GROUP BY k")
    assert "packed-gid co-sort (int[" in (r.raw_text or "")


def test_packed_parity_minmax_sum_count_avg():
    t = _table()
    rows = _assert_parity(
        "SELECT k, MIN(lat), MAX(lat), SUM(lng), COUNT(lat), AVG(lat) "
        "FROM big WHERE lat > 31 GROUP BY k ORDER BY k",
        {"big": t},
    )
    assert len(rows) > 2000  # wide domain actually exercised


def test_packed_parity_multikey():
    _assert_parity(
        "SELECT k, k2, COUNT(lat), MAX(lng) FROM big GROUP BY k, k2 "
        "ORDER BY k, k2 LIMIT 500",
        {"big": _table(dom=1200)},  # 1200*4 > 2047 -> packed multi-key
    )


def test_packed_parity_numpy_oracle():
    t = _table(n=2048, dom=3000, seed=3)
    rows, _ = _run(
        "SELECT k, SUM(lng), COUNT(lat) FROM big GROUP BY k ORDER BY k",
        {"big": t},
        packed=True,
    )
    lst = t.to_pylist()
    want = {}
    for r in lst:
        ki, li = r["k"], r["lng"]
        s, c = want.get(ki, (0.0, 0))
        want[ki] = (s + li, c + 1)
    assert len(rows) == len(want)
    for r in rows:
        vals = list(r.values()) if isinstance(r, dict) else list(r)
        rk, rs, rc = vals
        ws, wc = want[rk]
        assert rc == wc
        assert rs == pytest.approx(ws, rel=1e-4, abs=1e-3)


def test_packed_parity_nullable_arg_and_distinct():
    t = _table(with_nulls=True)
    _assert_parity(
        "SELECT k, COUNT(lat), SUM(lat), COUNT(DISTINCT k2) "
        "FROM big GROUP BY k ORDER BY k LIMIT 400",
        {"big": t},
    )


def test_packed_parity_stddev():
    _assert_parity(
        "SELECT k, STDDEV(lat), VAR_POP(lng) FROM big GROUP BY k "
        "ORDER BY k LIMIT 300",
        {"big": _table(dom=2500)},
    )


def test_packed_parity_median_ride():
    # medians keep the value-order ride; packed head + ride keys compose
    _assert_parity(
        "SELECT k, MEDIAN(lat), MAX(lat) FROM big GROUP BY k "
        "ORDER BY k LIMIT 300",
        {"big": _table(dom=2500)},
    )


def test_packed_distributed_repartition_parity():
    """Distributed repartition aggregate takes the packed local sort when
    the probed domain is wide; parity vs single-chip execution."""
    import jax

    from datafusion_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    env = dict(os.environ)
    # force the repartition strategy: in auto mode a 5000-slot domain
    # would take the fused ragged fold instead
    os.environ["DFTPU_AGG_STRATEGY"] = "repartition"
    try:
        t = _table(n=8192, dom=5000, seed=11)
        single = df.ExecutionContext()
        dist = df.ExecutionContext(mesh=make_mesh())
        for ctx in (single, dist):
            ctx.register_datasource("big", t)
        q = (
            "SELECT k, MIN(lat), MAX(lat), SUM(lng), COUNT(lat) "
            "FROM big GROUP BY k ORDER BY k"
        )
        a = single.sql(q).to_pylist()
        b = dist.sql(q).to_pylist()
        assert len(a) == len(b) and len(a) > 2000
        for ra, rb in zip(a, b):
            va, vb = list(ra.values()), list(rb.values())
            for ca, cb in zip(va, vb):
                if isinstance(ca, float):
                    assert ca == pytest.approx(cb, rel=1e-4, abs=1e-4), (ra, rb)
                else:
                    assert ca == cb, (ra, rb)
    finally:
        os.environ.clear()
        os.environ.update(env)


def test_packed_engages_past_vmem_budget_domains():
    """Domains past the reduce kernel's VMEM budget still take the
    packed SORT (the kernel self-gates via accum_fits_vmem and the XLA
    segment ops take over — r3: PACKED_MAX_GROUPS raised to 2^22 so
    TPC-H-Q3-scale post-join GROUP BYs keep the packed head)."""
    rng = np.random.default_rng(3)
    n = 8192
    t = df.Table.from_pydict({
        "k": rng.integers(0, 1 << 21, n).astype(np.int32),
        "v": rng.random(n).astype(np.float32),
    })
    got, ctx = _run("SELECT k, SUM(v), COUNT(v) FROM t GROUP BY k ORDER BY k LIMIT 20", {"t": t}, packed=True)
    want, _ = _run("SELECT k, SUM(v), COUNT(v) FROM t GROUP BY k ORDER BY k LIMIT 20", {"t": t}, packed=False)
    assert len(got) == len(want)
    for ra, rb in zip(got, want):
        va, vb = list(ra.values()), list(rb.values())
        assert va[0] == vb[0] and va[2] == vb[2]
        assert abs(va[1] - vb[1]) < 1e-3 * (1 + abs(vb[1]))
    txt = ctx.sql(
        "EXPLAIN VERBOSE SELECT k, SUM(v) FROM t GROUP BY k LIMIT 3"
    ).raw_text or ""
    assert "packed-gid co-sort" in txt, txt
