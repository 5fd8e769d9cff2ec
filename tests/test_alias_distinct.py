"""Column aliases (SELECT expr AS name) and SELECT DISTINCT — beyond the
reference's grammar."""

import numpy as np

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.parallel.mesh import make_mesh


def ctx_with_t(mesh=None):
    ctx = ExecutionContext(mesh=mesh)
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "a": np.array([1, 2, 2, 3, 3, 3], np.int32),
                "b": np.array([1.0, 2.0, 2.0, 3.0, 9.0, 3.0], np.float64),
                "s": ["x", "y", "y", "z", "z", "z"],
            }
        ),
    )
    return ctx


def test_alias_names_output():
    ctx = ctx_with_t()
    res = ctx.sql("SELECT a + a AS double_a, b half FROM t LIMIT 1")
    assert res.schema.names() == ["double_a", "half"]
    assert res.result_str() == "2\t1.0\n"


def test_alias_usable_in_order_by():
    ctx = ctx_with_t()
    out = ctx.sql("SELECT a * a AS sq FROM t ORDER BY sq DESC LIMIT 2").result_str()
    assert out == "9\n9\n"


def test_aliased_aggregate():
    ctx = ctx_with_t()
    res = ctx.sql("SELECT a, SUM(b) AS total FROM t GROUP BY a ORDER BY a")
    assert res.schema.names() == ["a", "total"]
    assert res.result_str() == "1\t1.0\n2\t4.0\n3\t15.0\n"


def test_distinct_single_column():
    ctx = ctx_with_t()
    assert ctx.sql("SELECT DISTINCT a FROM t ORDER BY a").result_str() == "1\n2\n3\n"


def test_distinct_multi_column():
    ctx = ctx_with_t()
    out = ctx.sql("SELECT DISTINCT a, b FROM t ORDER BY a, b").result_str()
    assert out == "1\t1.0\n2\t2.0\n3\t3.0\n3\t9.0\n"


def test_distinct_strings():
    ctx = ctx_with_t()
    out = ctx.sql("SELECT DISTINCT s FROM t ORDER BY s").result_str()
    assert out == '"x"\n"y"\n"z"\n'


def test_distinct_distributed():
    single = ctx_with_t().sql("SELECT DISTINCT a, b FROM t ORDER BY a, b").result_str()
    dist = ctx_with_t(make_mesh()).sql(
        "SELECT DISTINCT a, b FROM t ORDER BY a, b"
    ).result_str()
    assert single == dist


def test_group_by_float_keys():
    # beyond the reference: its GroupByScalar had no float variant
    # (aggregate.rs:66-76) so float GROUP BY panicked; here it works via
    # an order-preserving float->int bijection
    ctx = ExecutionContext()
    ctx.register_table(
        "f",
        Table.from_pydict(
            {
                "price": np.array([1.5, -2.25, 1.5, 0.0, -2.25, 1.5], np.float64),
                "q": np.array([1, 2, 3, 4, 5, 6], np.int32),
            }
        ),
    )
    out = ctx.sql(
        "SELECT price, COUNT(q), SUM(q) FROM f GROUP BY price ORDER BY price"
    ).result_str()
    assert out == "-2.25\t2\t7\n0.0\t1\t4\n1.5\t3\t10\n"


def test_distinct_float():
    ctx = ExecutionContext()
    ctx.register_table(
        "f", Table.from_pydict({"x": np.array([2.5, 1.5, 2.5, -1.0], np.float32)})
    )
    out = ctx.sql("SELECT DISTINCT x FROM f ORDER BY x").result_str()
    assert out == "-1.0\n1.5\n2.5\n"


def test_having():
    # beyond the reference (it raised 'HAVING is not implemented yet')
    ctx = ctx_with_t()
    out = ctx.sql(
        "SELECT a, COUNT(b) AS n FROM t GROUP BY a HAVING n > 1 ORDER BY a"
    ).result_str()
    assert out == "2\t2\n3\t3\n"
    out2 = ctx.sql(
        "SELECT a, SUM(b) AS s FROM t GROUP BY a HAVING s > 3.5 ORDER BY a"
    ).result_str()
    assert out2 == "2\t4.0\n3\t15.0\n"


def test_having_without_aggregate_errors():
    import pytest

    from datafusion_tpu.errors import PlanError

    ctx = ctx_with_t()
    with pytest.raises(PlanError):
        ctx.sql("SELECT a FROM t HAVING a > 1")


def test_count_distinct():
    # the reference declared AggregateType::CountDistinct but never
    # implemented it (expression.rs:36, aggregate.rs:319-342)
    ctx = ctx_with_t()
    out = ctx.sql(
        "SELECT a, COUNT(DISTINCT b), COUNT(b) FROM t GROUP BY a ORDER BY a"
    ).result_str()
    # a=1: b={1.0}; a=2: b={2.0,2.0}->1 distinct; a=3: {3.0,9.0,3.0}->2
    assert out == "1\t1\t1\n2\t1\t2\n3\t2\t3\n"


def test_count_distinct_ungrouped():
    ctx = ctx_with_t()
    assert ctx.sql("SELECT COUNT(DISTINCT b) FROM t").result_str() == "4\n"
    assert ctx.sql("SELECT COUNT(DISTINCT s) FROM t").result_str() == "3\n"


def test_count_distinct_distributed():
    sql = "SELECT a, COUNT(DISTINCT b) FROM t GROUP BY a ORDER BY a"
    single = ctx_with_t().sql(sql).result_str()
    dist = ctx_with_t(make_mesh()).sql(sql).result_str()
    assert single == dist


def test_sum_distinct_now_supported():
    import pytest

    from datafusion_tpu.errors import PlanError

    # SUM(DISTINCT) is supported now; STDDEV(DISTINCT) is not
    ctx = ctx_with_t()
    assert ctx.sql("SELECT SUM(DISTINCT b) FROM t").num_rows == 1
    with pytest.raises(PlanError, match="DISTINCT"):
        ctx.sql("SELECT STDDEV(DISTINCT b) FROM t")


def test_expressions_over_aggregates():
    # neither engine supported SELECT items computing over aggregate
    # results; here they plan as Projection over Aggregate
    ctx = ctx_with_t()
    out = ctx.sql("SELECT MAX(b) - MIN(b) FROM t").result_str()
    assert out == "8.0\n"
    out2 = ctx.sql(
        "SELECT a, MAX(b) - MIN(b) AS spread, SUM(b) / COUNT(b) AS mean "
        "FROM t GROUP BY a ORDER BY a"
    ).result_str()
    assert out2 == "1\t0.0\t1.0\n2\t0.0\t2.0\n3\t6.0\t5.0\n"


def test_composite_aggregate_select_order():
    # composite path outputs in SELECT order (no group-first quirk)
    ctx = ctx_with_t()
    res = ctx.sql("SELECT SUM(b) * 2 AS d, a FROM t GROUP BY a ORDER BY a")
    assert res.schema.names() == ["d", "a"]
    assert res.result_str() == "2.0\t1\n8.0\t2\n30.0\t3\n"


def test_having_with_unprojected_aggregate():
    ctx = ctx_with_t()
    out = ctx.sql(
        "SELECT a, SUM(b) * 1.0 AS s FROM t GROUP BY a HAVING COUNT(b) > 1 ORDER BY a"
    ).result_str()
    assert out == "2\t4.0\n3\t15.0\n"


def test_order_by_ordinal():
    import numpy as np
    import datafusion_tpu as df

    ctx = df.ExecutionContext()
    ctx.register_table(
        "t",
        df.Table.from_pydict(
            {"a": np.array([3, 1, 2], np.int64), "b": np.array([9.0, 8.0, 7.0])}
        ),
    )
    r = ctx.sql("SELECT a, b FROM t ORDER BY 2")
    assert [row["a"] for row in r.to_pylist()] == [2, 1, 3]
    r = ctx.sql("SELECT a, b FROM t ORDER BY 1 DESC")
    assert [row["a"] for row in r.to_pylist()] == [3, 2, 1]


def test_order_by_ordinal_out_of_range():
    import numpy as np
    import pytest
    import datafusion_tpu as df
    from datafusion_tpu.errors import PlanError

    ctx = df.ExecutionContext()
    ctx.register_table("t", df.Table.from_pydict({"a": np.array([1], np.int64)}))
    with pytest.raises(PlanError):
        ctx.sql("SELECT a FROM t ORDER BY 2")
