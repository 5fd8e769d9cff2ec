"""String scalar functions (beyond the reference) — evaluated as
host-side dictionary-vocabulary transforms + device code-remap LUTs
(ops/expr_eval.py _compile_string_fn), so code order = string order
keeps holding for downstream comparisons/sorts/groups."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.errors import NotImplementedError_, PlanError
from datafusion_tpu.parallel.mesh import make_mesh


def make_ctx(mesh=None):
    ctx = ExecutionContext(mesh=mesh)
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "k": np.array([1, 2, 3, 4], np.int32),
                "name": ["  Ann ", "bob", "CAT", "bob"],
            }
        ),
    )
    return ctx


def test_upper_lower():
    ctx = make_ctx()
    out = ctx.sql("SELECT k, UPPER(name) FROM t ORDER BY k").result_str()
    assert out == '1\t"  ANN "\n2\t"BOB"\n3\t"CAT"\n4\t"BOB"\n'
    out = ctx.sql("SELECT k, LOWER(name) FROM t ORDER BY k").result_str()
    assert out == '1\t"  ann "\n2\t"bob"\n3\t"cat"\n4\t"bob"\n'


def test_trim_length_substr_reverse_replace():
    ctx = make_ctx()
    out = ctx.sql("SELECT k, TRIM(name), LENGTH(name) FROM t ORDER BY k").result_str()
    assert out == '1\t"Ann"\t6\n2\t"bob"\t3\n3\t"CAT"\t3\n4\t"bob"\t3\n'
    out = ctx.sql("SELECT k, SUBSTR(name, 2, 2) FROM t ORDER BY k").result_str()
    assert out == '1\t" A"\n2\t"ob"\n3\t"AT"\n4\t"ob"\n'
    out = ctx.sql("SELECT REVERSE(name) FROM t WHERE k = 3").result_str()
    assert out == '"TAC"\n'
    out = ctx.sql("SELECT REPLACE(name, 'b', 'B') FROM t WHERE k = 2").result_str()
    assert out == '"BoB"\n'


def test_concat_with_literals():
    ctx = make_ctx()
    out = ctx.sql("SELECT CONCAT('<', TRIM(name), '>') FROM t WHERE k = 1").result_str()
    assert out == '"<Ann>"\n'


def test_nested_and_in_where():
    ctx = make_ctx()
    out = ctx.sql("SELECT k FROM t WHERE LOWER(TRIM(name)) = 'ann'").result_str()
    assert out == "1\n"
    out = ctx.sql("SELECT k FROM t WHERE UPPER(name) LIKE 'B%' ORDER BY k").result_str()
    assert out == "2\n4\n"


def test_group_by_alias_keeps_name_and_groups_on_transform():
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT LOWER(TRIM(name)) AS n, COUNT(1) FROM t GROUP BY n ORDER BY n"
    ).result_str()
    assert out == '"ann"\t1\n"bob"\t2\n"cat"\t1\n'


def test_order_by_transform_is_string_order():
    # the canonicalized dictionary keeps code order = string order
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT k, UPPER(TRIM(name)) AS u FROM t ORDER BY u, k"
    ).result_str()
    assert out == '1\t"ANN"\n2\t"BOB"\n4\t"BOB"\n3\t"CAT"\n'


def test_string_functions_distributed():
    mesh = make_mesh()
    sql = (
        "SELECT LOWER(TRIM(name)) AS n, COUNT(1) FROM t GROUP BY n ORDER BY n"
    )
    assert make_ctx().sql(sql).result_str() == make_ctx(mesh).sql(sql).result_str()


def test_string_function_errors():
    ctx = make_ctx()
    with pytest.raises(PlanError, match="argument"):
        ctx.sql("SELECT UPPER(name, name) FROM t")
    with pytest.raises(PlanError, match="string argument"):
        ctx.sql("SELECT UPPER(k) FROM t")
    # CONCAT of the SAME column is now a single-vocab transform...
    out = ctx.sql("SELECT CONCAT(name, name) FROM t WHERE k = 1").result_str()
    assert out.count('"') == 2 and out == out  # one row, quoted
    # ...but two DIFFERENT string columns still need a cross product
    ctx.register_table(
        "two",
        Table.from_pydict({"a": ["x", "y"], "b": ["p", "q"]}),
    )
    with pytest.raises(NotImplementedError_, match="DIFFERENT string columns"):
        ctx.sql("SELECT CONCAT(a, b) FROM two").result_str()


def test_extended_string_functions():
    import numpy as np

    from datafusion_tpu import ExecutionContext, Table

    ctx = ExecutionContext()
    ctx.register_table(
        "t",
        Table.from_pydict(
            {"s": ["hello world", "Foo", "a,b,c"], "x": np.array([1.0, 2.0, 3.0])}
        ),
    )
    q = lambda sql: ctx.sql(sql).result_str()
    assert q("SELECT INITCAP(s) FROM t ORDER BY 1") == '"A,B,C"\n"Foo"\n"Hello World"\n'
    assert q("SELECT LEFT(s, 3), RIGHT(s, 2) FROM t WHERE s = 'hello world'") == '"hel"\t"ld"\n'
    assert q("SELECT LPAD(s, 5, '*'), RPAD(s, 5, '.') FROM t WHERE s = 'Foo'") == '"**Foo"\t"Foo.."\n'
    assert q("SELECT REPEAT(s, 2) FROM t WHERE s = 'Foo'") == '"FooFoo"\n'
    assert q("SELECT SPLIT_PART(s, ',', 2) FROM t WHERE s = 'a,b,c'") == '"b"\n'
    assert q("SELECT STRPOS(s, 'world'), ASCII(s) FROM t WHERE s = 'hello world'") == "7\t104\n"
    assert q("SELECT s FROM t WHERE STRPOS(s, ',') > 0") == '"a,b,c"\n'
    # || concatenation operator desugars to CONCAT
    assert q("SELECT s || '-x' FROM t WHERE s = 'Foo'") == '"Foo-x"\n'
    # LEFT( disambiguates from LEFT JOIN
    assert (
        q("SELECT LEFT(t.s, 1) FROM t LEFT JOIN t AS u ON t.s = u.s WHERE t.s = 'Foo'")
        == '"F"\n'
    )


def test_extended_math_functions():
    import numpy as np

    from datafusion_tpu import ExecutionContext, Table

    ctx = ExecutionContext()
    ctx.register_table(
        "t", Table.from_pydict({"x": np.array([2.5, -2.5, 100.0])})
    )
    q = lambda sql: ctx.sql(sql).result_str()
    # SQL ROUND: half away from zero (not banker's rounding)
    assert q("SELECT ROUND(x) FROM t") == "3.0\n-3.0\n100.0\n"
    assert q("SELECT ROUND(x, 1), TRUNC(x) FROM t WHERE x < 0") == "-2.5\t-2.0\n"
    assert q("SELECT POWER(x, 2), MOD(x, 2) FROM t WHERE x = 2.5") == "6.25\t0.5\n"
    assert q("SELECT LOG10(x), SIGN(x) FROM t WHERE x = 100") == "2.0\t1.0\n"
    assert float(q("SELECT DEGREES(RADIANS(x)) FROM t WHERE x = 100")) == pytest.approx(100.0)
