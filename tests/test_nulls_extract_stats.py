"""ORDER BY ... NULLS FIRST/LAST, EXTRACT(unit FROM date), trailing
ORDER BY/LIMIT over set operations, STDDEV/VARIANCE aggregates — all
beyond the reference's grammar."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.errors import PlanError
from datafusion_tpu.schema import Field, Schema
from datafusion_tpu.types import DataType


def null_ctx():
    schema = Schema([Field("k", DataType.Int32), Field("v", DataType.Float64, True)])
    t = Table.from_arrays(
        schema,
        [np.array([1, 2, 3, 4], np.int32), np.array([10.0, 0.0, 30.0, 0.0])],
        validity=[None, np.array([True, False, True, False])],
    )
    ctx = ExecutionContext()
    ctx.register_table("t", t)
    return ctx


# ----------------------------------------------------- NULLS FIRST/LAST
def test_nulls_default_last():
    ctx = null_ctx()
    assert (
        ctx.sql("SELECT k, v FROM t ORDER BY v").result_str()
        == "1\t10.0\n3\t30.0\n2\tNULL\n4\tNULL\n"
    )
    # default holds for DESC too (engine default, documented)
    assert (
        ctx.sql("SELECT k, v FROM t ORDER BY v DESC").result_str()
        == "3\t30.0\n1\t10.0\n2\tNULL\n4\tNULL\n"
    )


def test_nulls_first():
    ctx = null_ctx()
    assert (
        ctx.sql("SELECT k, v FROM t ORDER BY v NULLS FIRST").result_str()
        == "2\tNULL\n4\tNULL\n1\t10.0\n3\t30.0\n"
    )
    assert (
        ctx.sql("SELECT k, v FROM t ORDER BY v DESC NULLS FIRST").result_str()
        == "2\tNULL\n4\tNULL\n3\t30.0\n1\t10.0\n"
    )


def test_nulls_first_with_limit():
    # NULLS FIRST disables the top-k fusion; result must still be exact
    ctx = null_ctx()
    assert (
        ctx.sql("SELECT k, v FROM t ORDER BY v NULLS FIRST LIMIT 3").result_str()
        == "2\tNULL\n4\tNULL\n1\t10.0\n"
    )
    assert (
        ctx.sql("SELECT k, v FROM t ORDER BY v NULLS LAST LIMIT 2").result_str()
        == "1\t10.0\n3\t30.0\n"
    )


def test_nulls_order_plan_rendering_and_serde():
    from datafusion_tpu.plan.logical import plan_from_json, plan_to_json

    ctx = null_ctx()
    plan = ctx.plan("SELECT k, v FROM t ORDER BY v DESC NULLS FIRST")
    assert "NULLS FIRST" in repr(plan)
    assert repr(plan_from_json(plan_to_json(plan))) == repr(plan)
    # unspecified null order renders exactly as before (golden parity)
    assert "NULLS" not in repr(ctx.plan("SELECT k, v FROM t ORDER BY v DESC"))


# ------------------------------------------------------------- EXTRACT
def test_extract_from_date():
    ctx = ExecutionContext()
    ctx.register_table(
        "d",
        Table.from_pydict(
            {
                "k": np.array([1, 2, 3], np.int32),
                "d": np.array(
                    ["2021-03-15", "2022-07-01", "2021-12-31"], "datetime64[D]"
                ),
            }
        ),
    )
    assert (
        ctx.sql("SELECT k, EXTRACT(YEAR FROM d) FROM d ORDER BY k").result_str()
        == "1\t2021\n2\t2022\n3\t2021\n"
    )
    assert (
        ctx.sql(
            "SELECT k FROM d WHERE EXTRACT(MONTH FROM d) = 12"
        ).result_str()
        == "3\n"
    )
    assert (
        ctx.sql("SELECT EXTRACT(DAY FROM d) FROM d ORDER BY 1").result_str()
        == "1\n15\n31\n"
    )


# ----------------------------------------- trailing ORDER BY on set ops
def test_setop_trailing_order_limit():
    ctx = ExecutionContext()
    ctx.register_table(
        "t", Table.from_pydict({"k": np.array([1, 2, 3, 4, 5, 6], np.int32)})
    )
    # ANSI: ORDER BY/LIMIT after a set op applies to the WHOLE compound
    assert (
        ctx.sql(
            "SELECT k FROM t WHERE k < 3 UNION ALL SELECT k FROM t WHERE k > 4 "
            "ORDER BY k DESC LIMIT 3"
        ).result_str()
        == "6\n5\n2\n"
    )
    assert (
        ctx.sql(
            "SELECT k FROM t WHERE k < 5 INTERSECT SELECT k FROM t WHERE k > 1 "
            "ORDER BY 1 LIMIT 2 OFFSET 1"
        ).result_str()
        == "3\n4\n"
    )


# ------------------------------------------------- STDDEV / VARIANCE
def stats_ctx():
    vals = np.array([2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0])
    ctx = ExecutionContext()
    ctx.register_table(
        "t", Table.from_pydict({"g": ["a"] * 4 + ["b"] * 4, "v": vals})
    )
    return ctx, vals


def test_stddev_variants_ungrouped():
    ctx, vals = stats_ctx()
    assert ctx.sql("SELECT STDDEV_POP(v) FROM t").result_str() == f"{np.std(vals)}\n"
    assert (
        ctx.sql("SELECT STDDEV(v) FROM t").result_str()
        == f"{np.std(vals, ddof=1)}\n"
    )
    assert ctx.sql("SELECT VAR_POP(v) FROM t").result_str() == f"{np.var(vals)}\n"
    assert (
        ctx.sql("SELECT VARIANCE(v) FROM t").result_str()
        == f"{np.var(vals, ddof=1)}\n"
    )


def test_variance_grouped():
    ctx, vals = stats_ctx()
    out = ctx.sql("SELECT g, VARIANCE(v) FROM t GROUP BY g ORDER BY g").result_str()
    assert out == '"a"\t1.0\n"b"\t3.6666666666666665\n'


def test_stddev_over_ints():
    ctx = ExecutionContext()
    ctx.register_table(
        "t", Table.from_pydict({"w": np.array([1, 2, 3, 4], np.int64)})
    )
    out = ctx.sql("SELECT VAR_POP(w) FROM t").result_str()
    assert out == "1.25\n"


def test_sample_stats_null_for_single_row():
    ctx, _ = stats_ctx()
    assert ctx.sql("SELECT STDDEV(v) FROM t WHERE v > 8").result_str() == "NULL\n"
    assert ctx.sql("SELECT VAR_SAMP(v) FROM t WHERE v > 8").result_str() == "NULL\n"
    # population variants are defined for n = 1
    assert ctx.sql("SELECT VAR_POP(v) FROM t WHERE v > 8").result_str() == "0.0\n"


def test_stddev_rejects_strings():
    ctx, _ = stats_ctx()
    with pytest.raises(PlanError):
        ctx.sql("SELECT STDDEV(g) FROM t")


# ---------------------------------------------------- ROWS window frames
def frames_ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "g": ["a", "a", "a", "a", "b", "b"],
                "k": np.array([1, 2, 3, 4, 1, 2], np.int32),
                "v": np.array([10.0, 20.0, 30.0, 40.0, 5.0, 7.0], np.float64),
            }
        ),
    )
    return ctx


def test_rows_frame_sliding_sum():
    ctx = frames_ctx()
    out = ctx.sql(
        "SELECT k, SUM(v) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t ORDER BY 1"
    ).result_str()
    assert out == "1\t10.0\n1\t5.0\n2\t30.0\n2\t12.0\n3\t50.0\n4\t70.0\n"


def test_rows_frame_centered():
    ctx = frames_ctx()
    out = ctx.sql(
        "SELECT k, SUM(v) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM t ORDER BY 1"
    ).result_str()
    assert out == "1\t30.0\n1\t12.0\n2\t60.0\n2\t12.0\n3\t90.0\n4\t70.0\n"


def test_rows_frame_short_form():
    # ROWS n PRECEDING = BETWEEN n PRECEDING AND CURRENT ROW
    ctx = frames_ctx()
    out = ctx.sql(
        "SELECT k, AVG(v) OVER (ORDER BY k, v ROWS 2 PRECEDING) FROM t ORDER BY 1"
    ).result_str()
    assert out == (
        "1\t7.5\n1\t5.0\n2\t12.333333333333334\n2\t7.333333333333333\n"
        "3\t19.0\n4\t30.0\n"
    )


def test_rows_frame_current_to_unbounded():
    ctx = frames_ctx()
    out = ctx.sql(
        "SELECT k, COUNT(v) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) FROM t ORDER BY 1"
    ).result_str()
    assert out == "1\t4\n1\t2\n2\t3\n2\t1\n3\t2\n4\t1\n"


def test_rows_frame_last_value_to_current():
    # explicit frame fixes LAST_VALUE's whole-partition default deviation
    ctx = frames_ctx()
    out = ctx.sql(
        "SELECT k, LAST_VALUE(v) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM t ORDER BY 1"
    ).result_str()
    assert out == "1\t10.0\n1\t5.0\n2\t20.0\n2\t7.0\n3\t30.0\n4\t40.0\n"


def test_rows_frame_empty_is_null():
    ctx = frames_ctx()
    out = ctx.sql(
        "SELECT k, SUM(v) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 3 FOLLOWING AND 4 FOLLOWING) FROM t ORDER BY 1"
    ).result_str()
    assert out == "1\t40.0\n1\tNULL\n2\tNULL\n2\tNULL\n3\tNULL\n4\tNULL\n"


def test_rows_frame_min_running_allowed():
    ctx = frames_ctx()
    out = ctx.sql(
        "SELECT k, MIN(v) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM t ORDER BY 1"
    ).result_str()
    assert out == "1\t10.0\n1\t5.0\n2\t10.0\n2\t5.0\n3\t10.0\n4\t10.0\n"


def test_rows_frame_errors():
    from datafusion_tpu.errors import ParserError

    ctx = frames_ctx()
    with pytest.raises(PlanError):
        ctx.sql(
            "SELECT ROW_NUMBER() OVER (ORDER BY k ROWS 1 PRECEDING) FROM t"
        )
    with pytest.raises(PlanError):
        # bounded sliding extremes not implemented
        ctx.sql(
            "SELECT MIN(v) OVER (ORDER BY k ROWS BETWEEN 1 PRECEDING "
            "AND CURRENT ROW) FROM t"
        )
    with pytest.raises(PlanError):
        # frame requires ORDER BY
        ctx.sql("SELECT SUM(v) OVER (PARTITION BY g ROWS 1 PRECEDING) FROM t")
    with pytest.raises(ParserError):
        ctx.sql("SELECT SUM(v) OVER (ORDER BY k RANGE 1 PRECEDING) FROM t")


def test_rows_frame_plan_rendering_serde():
    from datafusion_tpu.plan.logical import plan_from_json, plan_to_json

    ctx = frames_ctx()
    plan = ctx.plan(
        "SELECT SUM(v) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) FROM t"
    )
    assert "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING" in repr(plan)
    assert repr(plan_from_json(plan_to_json(plan))) == repr(plan)


# ----------------------------------- ORDER BY over non-selected columns
def test_order_by_hidden_column():
    ctx = ExecutionContext()
    ctx.register_table(
        "h",
        Table.from_pydict(
            {"k": np.array([1, 2, 3, 4], np.int32), "v": np.array([40.0, 10.0, 30.0, 20.0])}
        ),
    )
    assert ctx.sql("SELECT k FROM h ORDER BY v").result_str() == "2\n4\n3\n1\n"
    # expression keys and mixed hidden/output keys
    assert (
        ctx.sql("SELECT k FROM h ORDER BY v * -1, k").result_str() == "1\n3\n4\n2\n"
    )
    # limit sits under the hidden-column drop: top-k fusion still fires
    out = ctx.sql("EXPLAIN VERBOSE SELECT k FROM h ORDER BY v LIMIT 2").result_str()
    assert "fused lax.top_k" in out
    assert (
        ctx.sql("SELECT k FROM h ORDER BY v DESC LIMIT 2 OFFSET 1").result_str()
        == "3\n4\n"
    )
    # qualified hidden keys work too
    assert (
        ctx.sql("SELECT k FROM h AS a ORDER BY a.v LIMIT 1").result_str() == "2\n"
    )


# ------------------------------------------------ MEDIAN / PERCENTILE
def test_median_percentile():
    ctx = ExecutionContext()
    ctx.register_table(
        "m",
        Table.from_pydict(
            {
                "g": ["a", "a", "a", "a", "b", "b", "b"],
                "v": np.array([1.0, 3.0, 2.0, 10.0, 5.0, 7.0, 6.0]),
            }
        ),
    )
    q = lambda sql: ctx.sql(sql).result_str()
    assert q("SELECT MEDIAN(v) FROM m") == "5.0\n"
    assert q("SELECT g, MEDIAN(v) FROM m GROUP BY g ORDER BY g") == (
        '"a"\t2.5\n"b"\t6.0\n'
    )
    # PERCENTILE_CONT linear interpolation (numpy-checked values)
    assert q(
        "SELECT g, PERCENTILE(v, 0.25), PERCENTILE(v, 1.0) FROM m "
        "GROUP BY g ORDER BY g"
    ) == '"a"\t1.75\t10.0\n"b"\t5.5\t7.0\n'
    # mixes with other aggregates (median rides the value sort)
    assert q(
        "SELECT g, MEDIAN(v), MIN(v), MAX(v), COUNT(v) FROM m GROUP BY g ORDER BY g"
    ) == '"a"\t2.5\t1.0\t10.0\t4\n"b"\t6.0\t5.0\t7.0\t3\n'


def test_median_with_nulls_and_distributed():
    from datafusion_tpu.parallel.mesh import make_mesh

    schema = Schema([Field("g", DataType.Utf8), Field("v", DataType.Float64, True)])

    def mk(mesh=None):
        ctx = ExecutionContext(mesh=mesh)
        t = Table.from_arrays(
            schema,
            [
                ["a", "a", "a", "b", "b"],
                np.array([4.0, 0.0, 2.0, 8.0, 6.0]),
            ],
            validity=[None, np.array([True, False, True, True, True])],
        )
        ctx.register_table("m", t)
        return ctx

    sql = "SELECT g, MEDIAN(v), COUNT(v) FROM m GROUP BY g ORDER BY g"
    out = mk().sql(sql).result_str()
    # NULL excluded: a has [2, 4] -> 3.0
    assert out == '"a"\t3.0\t2\n"b"\t7.0\t2\n'
    assert mk(make_mesh()).sql(sql).result_str() == out


def test_median_limits():
    ctx = ExecutionContext()
    ctx.register_table(
        "m",
        Table.from_pydict(
            {"v": np.array([1.0, 2.0]), "w": np.array([3.0, 4.0])}
        ),
    )
    from datafusion_tpu.errors import NotImplementedError_, PlanError

    with pytest.raises(NotImplementedError_):
        # two DIFFERENT median arguments cannot share the one value ride
        ctx.sql("SELECT MEDIAN(v), MEDIAN(w), COUNT(v) FROM m GROUP BY v")
    with pytest.raises(PlanError):
        ctx.sql("SELECT PERCENTILE(v, 1.5) FROM m")


def test_sum_avg_distinct():
    from datafusion_tpu.parallel.mesh import make_mesh

    def mk(mesh=None):
        ctx = ExecutionContext(mesh=mesh)
        ctx.register_table(
            "d",
            Table.from_pydict(
                {
                    "g": ["a", "a", "a", "b", "b"],
                    "v": np.array([1.0, 1.0, 3.0, 5.0, 5.0]),
                }
            ),
        )
        return ctx

    q = lambda ctx, sql: ctx.sql(sql).result_str()
    assert q(
        mk(), "SELECT SUM(DISTINCT v), AVG(DISTINCT v), COUNT(DISTINCT v), SUM(v) FROM d"
    ) == "9.0\t3.0\t3\t15.0\n"
    sql = "SELECT g, SUM(DISTINCT v), AVG(DISTINCT v), MIN(DISTINCT v) FROM d GROUP BY g ORDER BY g"
    out = q(mk(), sql)
    assert out == '"a"\t4.0\t2.0\t1.0\n"b"\t5.0\t5.0\t5.0\n'
    # distributed: holistic aggregates localize their groups first
    assert q(mk(make_mesh()), sql) == out
    with pytest.raises(PlanError):
        mk().sql("SELECT STDDEV(DISTINCT v) FROM d")


def test_percentile_within_group_sugar():
    ctx = ExecutionContext()
    ctx.register_table(
        "wg", Table.from_pydict({"g": ["a"] * 4, "v": np.array([1.0, 2.0, 3.0, 10.0])})
    )
    assert (
        ctx.sql(
            "SELECT g, PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY v) FROM wg GROUP BY g"
        ).result_str()
        == '"a"\t2.5\n'
    )
    # DESC flips the fraction: 0.25 desc = 0.75 asc
    assert (
        ctx.sql(
            "SELECT PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY v DESC) FROM wg"
        ).result_str()
        == "4.75\n"
    )
