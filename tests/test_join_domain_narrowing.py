"""Key-domain propagation through inner direct-index joins (r3).

An INNER equi-join whose build side has a statically probed dense key
domain narrows the probe key's value bounds to that domain (surviving
keys are a subset of the build keys). A downstream GROUP BY on the join
key then probes the POST-join domain — small enough for the dense or
packed path — instead of the scan's full range (VERDICT r2 next #1a:
"the domain doesn't survive a join").

Parity for each narrowed shape is checked against pandas; EXPLAIN
VERBOSE is asserted to show the narrowed domain.
"""

import numpy as np
import pandas as pd
import pytest

import datafusion_tpu as df


def _setup(n=1 << 13, kdom=1 << 16, nd=1 << 11, seed=3):
    rng = np.random.default_rng(seed)
    kk = rng.integers(0, kdom, n).astype(np.int32)
    lat = (rng.random(n) * 40 + 30).astype(np.float32)
    w = rng.random(nd).astype(np.float32)
    ctx = df.ExecutionContext()
    ctx.register_table("big", df.Table.from_pydict({"k": kk, "lat": lat}))
    ctx.register_table(
        "dim",
        df.Table.from_pydict(
            {"pk": np.arange(nd, dtype=np.int32), "w": w}
        ),
    )
    pdf = pd.DataFrame({"k": kk, "lat": lat})
    ddf = pd.DataFrame({"pk": np.arange(nd), "w": w})
    return ctx, pdf, ddf, nd


def test_inner_join_narrows_groupby_domain():
    ctx, pdf, ddf, nd = _setup()
    sql = (
        "SELECT big.k, COUNT(big.lat), MAX(dim.w) FROM big "
        "JOIN dim ON big.k = dim.pk WHERE big.lat > 40 GROUP BY k ORDER BY k"
    )
    txt = ctx.sql("EXPLAIN VERBOSE " + sql).raw_text or ""
    # scan domain is [0, 65535]; the build side narrows the upper bound
    # to nd-1 (the lower bound intersects with the scanned min)
    assert f",{nd - 1}]" in txt, txt

    rows = ctx.sql(sql).to_pylist()
    m = pdf[pdf.lat > 40].merge(ddf, left_on="k", right_on="pk")
    exp = (
        m.groupby("k")
        .agg(c=("lat", "count"), mw=("w", "max"))
        .reset_index()
        .sort_values("k")
    )
    assert [r["k"] for r in rows] == exp.k.tolist()
    assert [r["COUNT"] for r in rows] == exp.c.tolist()
    assert np.allclose([r["MAX"] for r in rows], exp.mw.values)


def test_left_join_does_not_narrow():
    ctx, pdf, ddf, nd = _setup()
    sql = (
        "SELECT big.k, COUNT(big.lat) FROM big "
        "LEFT JOIN dim ON big.k = dim.pk GROUP BY k ORDER BY k LIMIT 5"
    )
    txt = ctx.sql("EXPLAIN VERBOSE " + sql).raw_text or ""
    # unmatched probe keys survive a LEFT join: the full scan domain must
    # remain (narrowing here would clip real groups)
    assert f",{nd - 1}]" not in txt, txt

    rows = ctx.sql(sql).to_pylist()
    exp = (
        pdf.merge(ddf, left_on="k", right_on="pk", how="left")
        .groupby("k")
        .agg(c=("lat", "count"))
        .reset_index()
        .sort_values("k")
        .head(5)
    )
    assert [r["k"] for r in rows] == exp.k.tolist()
    assert [r["COUNT"] for r in rows] == exp.c.tolist()


def test_narrowed_domain_small_enough_for_dense_window(monkeypatch):
    # build domain under DENSE_MAX_GROUPS: the post-join GROUP BY must
    # take the fully sort-free dense path (pallas interpret mode on CPU)
    monkeypatch.setenv("DFTPU_PALLAS", "1")
    ctx, pdf, ddf, nd = _setup(nd=1000)
    sql = (
        "SELECT big.k, SUM(big.lat), COUNT(big.lat) FROM big "
        "JOIN dim ON big.k = dim.pk GROUP BY k ORDER BY k"
    )
    txt = ctx.sql("EXPLAIN VERBOSE " + sql).raw_text or ""
    assert "dense sort-free group-by" in txt, txt

    rows = ctx.sql(sql).to_pylist()
    m = pdf.merge(ddf, left_on="k", right_on="pk")
    exp = (
        m.groupby("k")
        .agg(s=("lat", "sum"), c=("lat", "count"))
        .reset_index()
        .sort_values("k")
    )
    assert [r["k"] for r in rows] == exp.k.tolist()
    assert np.allclose([r["SUM"] for r in rows], exp.s.values, rtol=1e-4)
    assert [r["COUNT"] for r in rows] == exp.c.tolist()
