"""Window functions (beyond the reference) — one co-sort per
(PARTITION BY, ORDER BY) spec, boundaries via scans, results ride a
row-id sort back to source order (ops/window.py)."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.errors import PlanError
from datafusion_tpu.parallel.mesh import make_mesh


def make_ctx(mesh=None):
    ctx = ExecutionContext(mesh=mesh)
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "g": ["a", "a", "a", "b", "b", "c"],
                "k": np.array([3, 1, 2, 5, 4, 9], np.int32),
                "v": np.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0]),
            }
        ),
    )
    return ctx


def q(ctx, sql):
    return ctx.sql(sql).result_str()


def test_row_number():
    out = q(
        make_ctx(),
        "SELECT g, k, ROW_NUMBER() OVER (PARTITION BY g ORDER BY k) AS rn "
        "FROM t ORDER BY g, k",
    )
    assert out == (
        '"a"\t1\t1\n"a"\t2\t2\n"a"\t3\t3\n"b"\t4\t1\n"b"\t5\t2\n"c"\t9\t1\n'
    )


def test_rank_and_dense_rank_with_ties():
    out = q(make_ctx(), "SELECT k, RANK() OVER (ORDER BY g) AS r FROM t ORDER BY k")
    assert out == "1\t1\n2\t1\n3\t1\n4\t4\n5\t4\n9\t6\n"
    out = q(
        make_ctx(), "SELECT k, DENSE_RANK() OVER (ORDER BY g) AS r FROM t ORDER BY k"
    )
    assert out == "1\t1\n2\t1\n3\t1\n4\t2\n5\t2\n9\t3\n"


def test_partition_aggregates():
    out = q(
        make_ctx(),
        "SELECT g, SUM(v) OVER (PARTITION BY g) AS s, "
        "MIN(v) OVER (PARTITION BY g) AS lo, MAX(v) OVER (PARTITION BY g) AS hi, "
        "COUNT(*) OVER (PARTITION BY g) AS c, AVG(v) OVER (PARTITION BY g) AS m "
        "FROM t ORDER BY g",
    )
    lines = out.splitlines()
    assert lines[0] == '"a"\t60.0\t10.0\t30.0\t3\t20.0'
    assert lines[3] == '"b"\t90.0\t40.0\t50.0\t2\t45.0'
    assert lines[5] == '"c"\t60.0\t60.0\t60.0\t1\t60.0'


def test_running_sum_and_count():
    out = q(
        make_ctx(),
        "SELECT g, k, SUM(v) OVER (PARTITION BY g ORDER BY k) AS rs "
        "FROM t ORDER BY g, k",
    )
    assert out == (
        '"a"\t1\t20.0\n"a"\t2\t50.0\n"a"\t3\t60.0\n'
        '"b"\t4\t50.0\n"b"\t5\t90.0\n"c"\t9\t60.0\n'
    )


def test_lag_lead():
    out = q(
        make_ctx(),
        "SELECT g, k, LAG(v) OVER (PARTITION BY g ORDER BY k) AS p, "
        "LEAD(k, 1) OVER (PARTITION BY g ORDER BY k) AS n FROM t ORDER BY g, k",
    )
    assert out == (
        '"a"\t1\tNULL\t2\n"a"\t2\t20.0\t3\n"a"\t3\t30.0\tNULL\n'
        '"b"\t4\tNULL\t5\n"b"\t5\t50.0\tNULL\n"c"\t9\tNULL\tNULL\n'
    )


def test_window_over_where_filtered_rows():
    # windows see only the WHERE-surviving rows
    out = q(
        make_ctx(),
        "SELECT g, k, ROW_NUMBER() OVER (PARTITION BY g ORDER BY k) AS rn "
        "FROM t WHERE k > 1 ORDER BY g, k",
    )
    assert out == '"a"\t2\t1\n"a"\t3\t2\n"b"\t4\t1\n"b"\t5\t2\n"c"\t9\t1\n'


def test_lag_of_string_column_keeps_dictionary():
    out = q(
        make_ctx(),
        "SELECT k, LAG(g) OVER (ORDER BY k) AS pg FROM t ORDER BY k",
    )
    assert out == (
        '1\tNULL\n2\t"a"\n3\t"a"\n4\t"a"\n5\t"b"\n9\t"b"\n'
    )


def test_window_distributed_parity():
    mesh = make_mesh()
    for sql in (
        "SELECT g, k, ROW_NUMBER() OVER (PARTITION BY g ORDER BY k) AS rn "
        "FROM t ORDER BY g, k",
        "SELECT g, k, SUM(v) OVER (PARTITION BY g ORDER BY k) AS rs "
        "FROM t ORDER BY g, k",
        "SELECT g, k, MIN(v) OVER (PARTITION BY g) AS lo FROM t ORDER BY g, k",
    ):
        assert q(make_ctx(), sql) == q(make_ctx(mesh), sql)


def test_window_errors():
    ctx = make_ctx()
    # windows + GROUP BY are now supported (aggregate-subquery desugar)
    assert (
        ctx.sql(
            "SELECT g, ROW_NUMBER() OVER (ORDER BY g) FROM t GROUP BY g"
        ).result_str()
        == '"a"\t1\n"b"\t2\n"c"\t3\n'
    )
    with pytest.raises(PlanError, match="not a window function"):
        ctx.sql("SELECT SQRT(v) OVER (ORDER BY k) FROM t")
    with pytest.raises(PlanError, match="SELECT items"):
        ctx.sql("SELECT k FROM t WHERE ROW_NUMBER() OVER (ORDER BY k) < 3")


def test_running_min_max():
    # segmented associative_scan: running extremes within each partition
    out = q(
        make_ctx(),
        "SELECT g, k, MIN(v) OVER (PARTITION BY g ORDER BY k) AS lo, "
        "MAX(v) OVER (PARTITION BY g ORDER BY k) AS hi FROM t ORDER BY g, k",
    )
    # partition a in k order sees v = 20, 30, 10
    assert out == (
        '"a"\t1\t20.0\t20.0\n"a"\t2\t20.0\t30.0\n"a"\t3\t10.0\t30.0\n'
        '"b"\t4\t50.0\t50.0\n"b"\t5\t40.0\t50.0\n"c"\t9\t60.0\t60.0\n'
    )


def test_first_last_value_ntile():
    out = q(
        make_ctx(),
        "SELECT g, k, FIRST_VALUE(v) OVER (PARTITION BY g ORDER BY k) AS f, "
        "LAST_VALUE(v) OVER (PARTITION BY g ORDER BY k) AS l, "
        "NTILE(2) OVER (PARTITION BY g ORDER BY k) AS t2 FROM t ORDER BY g, k",
    )
    assert out == (
        '"a"\t1\t20.0\t10.0\t1\n"a"\t2\t20.0\t10.0\t1\n"a"\t3\t20.0\t10.0\t2\n'
        '"b"\t4\t50.0\t40.0\t1\n"b"\t5\t50.0\t40.0\t2\n"c"\t9\t60.0\t60.0\t1\n'
    )


def test_window_in_derived_table():
    # rank-filter via derived table (windows not allowed in WHERE directly)
    out = q(
        make_ctx(),
        "SELECT g, k FROM (SELECT g, k, ROW_NUMBER() OVER "
        "(PARTITION BY g ORDER BY v DESC) AS rn FROM t) s "
        "WHERE rn = 1 ORDER BY g",
    )
    assert out == '"a"\t2\n"b"\t4\n"c"\t9\n'


def test_window_distributed_repartition_larger():
    """PARTITION BY windows hash-repartition over the mesh instead of
    gathering; EXPLAIN shows the strategy and results match single-chip."""
    rng = np.random.default_rng(1)
    n = 3000
    data = {
        "g": rng.integers(0, 13, n).astype(np.int32),
        "v": rng.random(n).round(4),
    }
    sqls = [
        "SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn "
        "FROM t ORDER BY g, v, rn LIMIT 80",
        "SELECT g, SUM(v) OVER (PARTITION BY g) AS s FROM t ORDER BY g, s LIMIT 80",
    ]
    for sql in sqls:
        c1 = ExecutionContext()
        c1.register_table("t", Table.from_pydict(dict(data)))
        c2 = ExecutionContext(mesh=make_mesh())
        c2.register_table("t", Table.from_pydict(dict(data)))
        assert sorted(c1.sql(sql).result_str().splitlines()) == sorted(
            c2.sql(sql).result_str().splitlines()
        ), sql
        assert "hash-repartition by PARTITION BY" in c2.sql(
            "EXPLAIN VERBOSE " + sql
        ).result_str()


def test_window_over_group_by():
    # windows over aggregate output (ANSI: GROUP BY → HAVING → window)
    import numpy as np

    from datafusion_tpu import ExecutionContext, Table

    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "g": ["a", "a", "b", "b", "c", "c"],
                "r": ["e", "e", "e", "w", "w", "w"],
                "v": np.array([10.0, 20.0, 30.0, 40.0, 50.0, 65.0]),
            }
        ),
    )
    assert (
        ctx.sql(
            "SELECT g, SUM(v) AS s, RANK() OVER (ORDER BY SUM(v) DESC) "
            "FROM t GROUP BY g ORDER BY g"
        ).result_str()
        == '"a"\t30.0\t3\n"b"\t70.0\t2\n"c"\t115.0\t1\n'
    )
    assert (
        ctx.sql(
            "SELECT r, g, SUM(v), ROW_NUMBER() OVER "
            "(PARTITION BY r ORDER BY SUM(v) DESC) FROM t "
            "GROUP BY r, g ORDER BY 1, 2"
        ).result_str()
        == '"e"\t"a"\t30.0\t1\n"e"\t"b"\t30.0\t2\n"w"\t"b"\t40.0\t2\n"w"\t"c"\t115.0\t1\n'
    )
    # window of an aggregate inside an expression
    assert (
        ctx.sql(
            "SELECT g, SUM(v) - AVG(SUM(v)) OVER () AS diff FROM t "
            "GROUP BY g ORDER BY g"
        ).result_str()
        == '"a"\t-41.66666666666667\n"b"\t-1.6666666666666714\n"c"\t43.33333333333333\n'
    )
    # HAVING filters before the window ranks
    assert (
        ctx.sql(
            "SELECT g, SUM(v) AS s, RANK() OVER (ORDER BY SUM(v) DESC) AS rk "
            "FROM t GROUP BY g HAVING SUM(v) > 40 ORDER BY rk"
        ).result_str()
        == '"c"\t115.0\t1\n"b"\t70.0\t2\n'
    )


def test_window_in_order_by():
    import numpy as np

    from datafusion_tpu import ExecutionContext, Table

    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "g": ["a", "a", "b", "b"],
                "v": np.array([10.0, 20.0, 30.0, 40.0]),
            }
        ),
    )
    assert (
        ctx.sql(
            "SELECT g, v FROM t ORDER BY "
            "ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC), g"
        ).result_str()
        == '"a"\t20.0\n"b"\t40.0\n"a"\t10.0\n"b"\t30.0\n'
    )
    assert (
        ctx.sql(
            "SELECT g, SUM(v) AS s FROM t GROUP BY g "
            "ORDER BY RANK() OVER (ORDER BY SUM(v))"
        ).result_str()
        == '"a"\t30.0\n"b"\t70.0\n'
    )


def test_percent_rank_cume_dist_nth_value():
    import numpy as np

    from datafusion_tpu import ExecutionContext, Table

    ctx = ExecutionContext()
    ctx.register_table(
        "w",
        Table.from_pydict(
            {
                "g": ["a", "a", "a", "a", "b", "b"],
                "v": np.array([10.0, 20.0, 20.0, 40.0, 5.0, 7.0]),
            }
        ),
    )
    assert ctx.sql(
        "SELECT g, v, PERCENT_RANK() OVER (PARTITION BY g ORDER BY v) FROM w "
        "ORDER BY g, v"
    ).result_str() == (
        '"a"\t10.0\t0.0\n"a"\t20.0\t0.3333333333333333\n'
        '"a"\t20.0\t0.3333333333333333\n"a"\t40.0\t1.0\n'
        '"b"\t5.0\t0.0\n"b"\t7.0\t1.0\n'
    )
    assert ctx.sql(
        "SELECT g, v, CUME_DIST() OVER (PARTITION BY g ORDER BY v) FROM w "
        "ORDER BY g, v"
    ).result_str() == (
        '"a"\t10.0\t0.25\n"a"\t20.0\t0.75\n"a"\t20.0\t0.75\n"a"\t40.0\t1.0\n'
        '"b"\t5.0\t0.5\n"b"\t7.0\t1.0\n'
    )
    assert ctx.sql(
        "SELECT g, NTH_VALUE(v, 2) OVER (PARTITION BY g ORDER BY v) FROM w "
        "ORDER BY g, 2"
    ).result_str() == (
        '"a"\t20.0\n"a"\t20.0\n"a"\t20.0\n"a"\t20.0\n"b"\t7.0\n"b"\t7.0\n'
    )
    # NTH_VALUE past the partition size is NULL
    out = ctx.sql(
        "SELECT NTH_VALUE(v, 5) OVER (PARTITION BY g ORDER BY v) FROM w"
    ).result_str()
    assert out == "NULL\n" * 6


def test_window_sum_precision_at_scale():
    """Regression for the grave f32 precision bug (r5): running/framed
    sums were cumsum DIFFERENCES of a global f32 prefix, whose ULP at
    scale dwarfs partition-local sums — measured rel error up to 3.0 at
    33.5M rows on chip, and ~1e-3 even at 20k rows. The limb machinery
    (_sum_limbs) keeps errors at f32-epsilon class."""
    import numpy as np
    import pandas as pd
    import jax

    from datafusion_tpu.ops.window import WindowCall, window_spec

    n = 1 << 16
    rng = np.random.default_rng(0)
    k = rng.integers(0, 64, n).astype(np.int32)
    u = (rng.random(n, dtype=np.float32) * 360 - 180)
    v = (rng.random(n, dtype=np.float32) * 40 + 30)
    sel = np.ones(n, np.bool_)
    kd, vd, ud, seld = map(jax.device_put, (k, v, u, sel))
    outs = jax.jit(
        lambda e: window_spec(
            [(e[0], None)],
            [((e[2], None), True)],
            [
                WindowCall("sum", (e[1], None)),
                WindowCall("sum", (e[1], None), frame=(-3, 3)),
            ],
            e[3],
        )
    )((kd, vd, ud, seld))
    run, frm = np.asarray(outs[0][0]), np.asarray(outs[1][0])
    df = pd.DataFrame({"k": k, "v": v.astype(np.float64), "u": u})
    df["row"] = np.arange(n)
    df = df.sort_values(["k", "u", "row"], kind="stable")
    run_ref = df.groupby("k", sort=False).v.cumsum().to_numpy()
    frm_ref = (
        df.groupby("k", sort=False).v
        .rolling(7, min_periods=1, center=True).sum()
        .reset_index(level=0, drop=True).to_numpy()
    )
    order = df.row.to_numpy()
    re = np.abs(run[order] - run_ref) / (np.abs(run_ref) + 1)
    fe = np.abs(frm[order] - frm_ref) / (np.abs(frm_ref) + 1)
    # the old cumsum-difference formulation measured ~3e-3 at this scale
    assert re.max() < 2e-5, re.max()
    assert fe.max() < 2e-5, fe.max()
