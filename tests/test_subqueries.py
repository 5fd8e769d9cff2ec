"""Derived-table subqueries, IN lists, BETWEEN — beyond the reference's
grammar."""

import numpy as np

from datafusion_tpu import ExecutionContext, Table


def make_ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "k": np.array([1, 2, 3, 4, 5, 6], np.int32),
                "g": ["a", "a", "b", "b", "c", "c"],
                "v": np.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0], np.float64),
            }
        ),
    )
    return ctx


def test_in_list():
    ctx = make_ctx()
    assert ctx.sql("SELECT k FROM t WHERE k IN (2, 4, 9)").result_str() == "2\n4\n"
    assert (
        ctx.sql("SELECT k FROM t WHERE k NOT IN (1, 2, 3, 4)").result_str()
        == "5\n6\n"
    )
    assert (
        ctx.sql("SELECT k FROM t WHERE g IN ('a', 'c') ORDER BY k").result_str()
        == "1\n2\n5\n6\n"
    )


def test_between():
    ctx = make_ctx()
    assert ctx.sql("SELECT k FROM t WHERE v BETWEEN 20 AND 40").result_str() == "2\n3\n4\n"
    assert (
        ctx.sql("SELECT k FROM t WHERE k NOT BETWEEN 2 AND 5").result_str() == "1\n6\n"
    )
    # BETWEEN binds tighter than surrounding AND
    assert (
        ctx.sql("SELECT k FROM t WHERE v BETWEEN 20 AND 40 AND k > 2").result_str()
        == "3\n4\n"
    )


def test_derived_table():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT big_v FROM (SELECT k, v * 2 AS big_v FROM t WHERE k > 3) sub "
        "ORDER BY big_v"
    ).result_str()
    assert out == "80.0\n100.0\n120.0\n"


def test_derived_table_with_aggregate():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT g, total FROM (SELECT g, SUM(v) AS total FROM t GROUP BY g) agg "
        "WHERE total > 40 ORDER BY g"
    ).result_str()
    assert out == '"b"\t70.0\n"c"\t110.0\n'


def test_join_with_derived_table():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT t.k, agg.total FROM t "
        "JOIN (SELECT g, SUM(v) AS total FROM t GROUP BY g) AS agg ON t.g = agg.g "
        "WHERE t.k < 3 ORDER BY k"
    ).result_str()
    assert out == "1\t30.0\n2\t30.0\n"


def test_having_restates_aggregate():
    import numpy as np
    import datafusion_tpu as df

    ctx = df.ExecutionContext()
    ctx.register_table(
        "t",
        df.Table.from_pydict(
            {
                "g": np.array([1, 1, 1, 2, 2, 3], np.int64),
                "v": np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
            }
        ),
    )
    # aggregate re-stated in HAVING, also present in SELECT
    r = ctx.sql("SELECT g, COUNT(v) FROM t GROUP BY g HAVING COUNT(v) > 1")
    assert sorted(tuple(x.values()) for x in r.to_pylist()) == [(1, 3), (2, 2)]
    # aggregate only in HAVING (hidden column projected away)
    r = ctx.sql("SELECT g, COUNT(v) FROM t GROUP BY g HAVING SUM(v) > 5.0")
    assert sorted(tuple(x.values()) for x in r.to_pylist()) == [(1, 3), (2, 2), (3, 1)]
    assert len(r.to_pylist()[0]) == 2  # SUM column is hidden


def test_group_by_alias_and_ordinal():
    import numpy as np
    import datafusion_tpu as df

    ctx = df.ExecutionContext()
    ctx.register_table(
        "t",
        df.Table.from_pydict(
            {
                "g": np.array([1, 1, 2, 2, 0], np.int64),
                "v": np.array([1.0, 2.0, 3.0, 4.0, 5.0]),
            }
        ),
    )
    r1 = ctx.sql("SELECT g * 10 AS bucket, COUNT(v) FROM t GROUP BY bucket")
    r2 = ctx.sql("SELECT g * 10 AS bucket, COUNT(v) FROM t GROUP BY 1")
    r3 = ctx.sql("SELECT g * 10 AS bucket, COUNT(v) FROM t GROUP BY g * 10")
    want = [(0, 1), (10, 2), (20, 2)]
    for r in (r1, r2, r3):
        assert sorted(tuple(x.values()) for x in r.to_pylist()) == want


def make_two_table_ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "k": np.array([1, 2, 3, 4, 5, 6], np.int32),
                "g": ["a", "a", "b", "b", "c", "c"],
                "v": np.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0], np.float64),
            }
        ),
    )
    ctx.register_table(
        "s",
        Table.from_pydict(
            {
                "k": np.array([2, 4, 4, 9], np.int32),
                "tag": ["x", "y", "y", "z"],
            }
        ),
    )
    return ctx


def test_in_subquery():
    ctx = make_two_table_ctx()
    # duplicate 4s in s must NOT duplicate output rows (DISTINCT semi-join)
    out = ctx.sql("SELECT k FROM t WHERE k IN (SELECT k FROM s) ORDER BY k")
    assert out.result_str() == "2\n4\n"


def test_not_in_subquery():
    ctx = make_two_table_ctx()
    out = ctx.sql("SELECT k FROM t WHERE k NOT IN (SELECT k FROM s) ORDER BY k")
    assert out.result_str() == "1\n3\n5\n6\n"


def test_in_subquery_with_residual_where():
    ctx = make_two_table_ctx()
    out = ctx.sql(
        "SELECT k FROM t WHERE k IN (SELECT k FROM s) AND v > 25 ORDER BY k"
    )
    assert out.result_str() == "4\n"
    out = ctx.sql(
        "SELECT k FROM t WHERE v > 25 AND k NOT IN (SELECT k FROM s WHERE tag = 'y') "
        "ORDER BY k"
    )
    assert out.result_str() == "3\n5\n6\n"


def test_in_subquery_string_keys():
    ctx = make_two_table_ctx()
    out = ctx.sql(
        "SELECT k FROM t WHERE g IN (SELECT tag FROM s) ORDER BY k"
    )
    # tags x,y,z never appear in g
    assert out.result_str() == ""
    ctx.register_table("labels", Table.from_pydict({"l": ["a", "c", "q"]}))
    out = ctx.sql("SELECT k FROM t WHERE g IN (SELECT l FROM labels) ORDER BY k")
    assert out.result_str() == "1\n2\n5\n6\n"


def test_in_subquery_with_aggregate_sub():
    ctx = make_two_table_ctx()
    # subquery with its own GROUP BY/HAVING
    out = ctx.sql(
        "SELECT k FROM t WHERE g IN "
        "(SELECT g FROM t GROUP BY g HAVING SUM(v) > 40) ORDER BY k"
    )
    assert out.result_str() == "3\n4\n5\n6\n"


def test_in_subquery_distributed():
    from datafusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    single = make_two_table_ctx()
    dist = make_two_table_ctx()
    dist._mesh = mesh  # noqa: SLF001 — mirror make_ctx(mesh) pattern
    for sql in (
        "SELECT k FROM t WHERE k IN (SELECT k FROM s) ORDER BY k",
        "SELECT k FROM t WHERE k NOT IN (SELECT k FROM s) ORDER BY k",
    ):
        ctx_d = ExecutionContext(mesh=mesh)
        ctx_d._tables = dist._tables
        assert single.sql(sql).result_str() == ctx_d.sql(sql).result_str()


def test_in_subquery_errors():
    import pytest
    from datafusion_tpu.errors import PlanError

    ctx = make_two_table_ctx()
    with pytest.raises(PlanError, match="top-level AND conjunct"):
        ctx.sql("SELECT k FROM t WHERE k > 3 OR k IN (SELECT k FROM s)")
    with pytest.raises(PlanError, match="exactly one column"):
        ctx.sql("SELECT k FROM t WHERE k IN (SELECT k, tag FROM s)")
    with pytest.raises(PlanError, match="plain column"):
        ctx.sql("SELECT k FROM t WHERE k + 1 IN (SELECT k FROM s)")


def test_group_by_without_aggregates_dedupes():
    # regression: GROUP BY with no aggregate in the SELECT list must still
    # group (it used to fall through to a plain projection)
    ctx = make_ctx()
    assert ctx.sql("SELECT g FROM t GROUP BY g ORDER BY g").result_str() == (
        '"a"\n"b"\n"c"\n'
    )
    assert ctx.sql(
        "SELECT g FROM t GROUP BY g HAVING SUM(v) > 40 ORDER BY g"
    ).result_str() == '"b"\n"c"\n'


def test_scalar_subquery_in_where():
    ctx = make_ctx()
    out = ctx.sql("SELECT k FROM t WHERE v > (SELECT AVG(v) FROM t) ORDER BY k")
    assert out.result_str() == "4\n5\n6\n"


def test_scalar_subquery_in_select():
    ctx = make_two_table_ctx()
    out = ctx.sql("SELECT k, (SELECT MAX(k) FROM s) FROM t WHERE k < 3 ORDER BY k")
    assert out.result_str() == "1\t9\n2\t9\n"
    # computed over: v minus a global aggregate
    out = ctx.sql("SELECT k, v - (SELECT MIN(v) FROM t) AS d FROM t WHERE k > 4 ORDER BY k")
    assert out.result_str() == "5\t40.0\n6\t50.0\n"


def test_scalar_subquery_empty_is_null():
    ctx = make_ctx()
    # empty subquery → NULL scalar → comparison is never true
    out = ctx.sql("SELECT k FROM t WHERE v > (SELECT AVG(v) FROM t WHERE k > 100)")
    assert out.result_str() == ""
    # and in SELECT items it renders as NULL
    out = ctx.sql(
        "SELECT k, (SELECT MAX(v) FROM t WHERE k > 100) FROM t WHERE k = 1"
    )
    assert out.result_str() == "1\tNULL\n"


def test_scalar_subquery_distributed():
    from datafusion_tpu.parallel.mesh import make_mesh

    sql = "SELECT k, v - (SELECT AVG(v) FROM t) AS d FROM t WHERE v > (SELECT MIN(v) FROM t) ORDER BY k"
    single = make_ctx().sql(sql).result_str()
    ctx_d = ExecutionContext(mesh=make_mesh())
    ctx_d._tables = make_ctx()._tables
    assert ctx_d.sql(sql).result_str() == single


def test_scalar_subquery_errors():
    import pytest
    from datafusion_tpu.errors import PlanError

    ctx = make_two_table_ctx()
    with pytest.raises(PlanError, match="exactly one column"):
        ctx.sql("SELECT k FROM t WHERE v > (SELECT k, tag FROM s)")
    with pytest.raises(PlanError, match="WHERE clause"):
        ctx.sql("SELECT k FROM t ORDER BY (SELECT MAX(k) FROM s)")


def make_exists_ctx(mesh=None):
    ctx = ExecutionContext(mesh=mesh)
    ctx.register_table(
        "t",
        Table.from_pydict(
            {"k": np.array([1, 2, 3, 4], np.int32), "v": np.array([10.0, 20.0, 30.0, 40.0])}
        ),
    )
    ctx.register_table(
        "s",
        Table.from_pydict(
            {"k": np.array([2, 4, 4], np.int32), "w": np.array([1.0, 2.0, 99.0])}
        ),
    )
    return ctx


def test_exists_correlated():
    ctx = make_exists_ctx()
    # duplicate 4s in s must not duplicate output rows (DISTINCT semi join)
    out = ctx.sql(
        "SELECT k FROM t WHERE EXISTS (SELECT 1 FROM s WHERE s.k = t.k) ORDER BY k"
    ).result_str()
    assert out == "2\n4\n"
    out = ctx.sql(
        "SELECT k FROM t WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.k = t.k) ORDER BY k"
    ).result_str()
    assert out == "1\n3\n"


def test_exists_correlated_with_inner_predicate():
    ctx = make_exists_ctx()
    out = ctx.sql(
        "SELECT k FROM t WHERE EXISTS "
        "(SELECT 1 FROM s WHERE s.k = t.k AND s.w > 50) ORDER BY k"
    ).result_str()
    assert out == "4\n"


def test_exists_uncorrelated():
    ctx = make_exists_ctx()
    assert (
        ctx.sql(
            "SELECT k FROM t WHERE EXISTS (SELECT 1 FROM s WHERE s.w > 100)"
        ).result_str()
        == ""
    )
    assert (
        ctx.sql(
            "SELECT k FROM t WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.w > 100) "
            "ORDER BY k"
        ).result_str()
        == "1\n2\n3\n4\n"
    )
    # non-empty subquery keeps every outer row
    assert (
        ctx.sql(
            "SELECT k FROM t WHERE EXISTS (SELECT 1 FROM s WHERE s.w > 50) ORDER BY k"
        ).result_str()
        == "1\n2\n3\n4\n"
    )


def test_exists_with_residual_where():
    ctx = make_exists_ctx()
    out = ctx.sql(
        "SELECT k FROM t WHERE v > 15 AND EXISTS "
        "(SELECT 1 FROM s WHERE s.k = t.k) ORDER BY k"
    ).result_str()
    assert out == "2\n4\n"


def test_exists_distributed():
    from datafusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    for sql in (
        "SELECT k FROM t WHERE EXISTS (SELECT 1 FROM s WHERE s.k = t.k) ORDER BY k",
        "SELECT k FROM t WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.k = t.k) ORDER BY k",
    ):
        assert (
            make_exists_ctx().sql(sql).result_str()
            == make_exists_ctx(mesh).sql(sql).result_str()
        )


def test_exists_errors():
    import pytest
    from datafusion_tpu.errors import PlanError

    ctx = make_exists_ctx()
    with pytest.raises(PlanError, match="top-level AND conjunct"):
        ctx.sql("SELECT k FROM t WHERE k > 3 OR EXISTS (SELECT 1 FROM s WHERE s.k = t.k)")
    with pytest.raises(PlanError, match="inner-only or"):
        ctx.sql("SELECT k FROM t WHERE EXISTS (SELECT 1 FROM s WHERE s.k > t.k)")


def test_correlated_scalar_subquery():
    ctx = make_exists_ctx()
    out = ctx.sql(
        "SELECT k, (SELECT MAX(w) FROM s WHERE s.k = t.k) FROM t ORDER BY k"
    ).result_str()
    assert out == "1\tNULL\n2\t1.0\n3\tNULL\n4\t99.0\n"
    out = ctx.sql(
        "SELECT k FROM t WHERE v > (SELECT SUM(w) FROM s WHERE s.k = t.k) ORDER BY k"
    ).result_str()
    assert out == "2\n"
    # inner-local predicate combines with the correlation key
    out = ctx.sql(
        "SELECT k, (SELECT COUNT(w) FROM s WHERE s.k = t.k AND s.w > 1.5) "
        "FROM t ORDER BY k"
    ).result_str()
    assert out == "1\tNULL\n2\tNULL\n3\tNULL\n4\t2\n"


def test_correlated_scalar_subquery_distributed():
    from datafusion_tpu.parallel.mesh import make_mesh

    sql = "SELECT k, (SELECT MAX(w) FROM s WHERE s.k = t.k) FROM t ORDER BY k"
    assert (
        make_exists_ctx().sql(sql).result_str()
        == make_exists_ctx(make_mesh()).sql(sql).result_str()
    )


def test_correlated_scalar_subquery_errors():
    import pytest
    from datafusion_tpu.errors import PlanError

    ctx = make_exists_ctx()
    with pytest.raises(PlanError, match="aggregate"):
        ctx.sql("SELECT k, (SELECT w FROM s WHERE s.k = t.k) FROM t")


def test_having_uncorrelated_scalar_subquery():
    """TPC-H q11's shape: HAVING SUM(x) > (SELECT SUM(x) * f FROM t).
    Plans standalone, LEFT-joins one row onto the aggregate output."""
    import datafusion_tpu as df

    ctx = df.ExecutionContext()
    ctx.register_table(
        "t",
        df.Table.from_pydict(
            {"k": [1, 1, 2, 2, 3], "v": [10.0, 10.0, 1.0, 1.0, 100.0]}
        ),
    )
    out = ctx.sql(
        "SELECT k, SUM(v) AS s FROM t GROUP BY k "
        "HAVING SUM(v) > (SELECT AVG(v) FROM t) ORDER BY k"
    ).result_str().splitlines()
    # avg = 24.4; groups: 20, 2, 100 -> only k=3 passes
    assert out == ["3\t100.0"]


def test_having_correlated_scalar_subquery_errors():
    import pytest

    import datafusion_tpu as df
    from datafusion_tpu.errors import PlanError

    ctx = df.ExecutionContext()
    ctx.register_table("t", df.Table.from_pydict({"k": [1], "v": [1.0]}))
    ctx.register_table("s", df.Table.from_pydict({"k": [1], "w": [5.0]}))
    with pytest.raises(PlanError, match="HAVING"):
        ctx.sql(
            "SELECT k, SUM(v) FROM t GROUP BY k "
            "HAVING SUM(v) > (SELECT MAX(w) FROM s WHERE s.k = t.k)"
        )
