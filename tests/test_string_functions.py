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
    with pytest.raises(NotImplementedError_, match="two string columns"):
        ctx.sql("SELECT CONCAT(name, name) FROM t").result_str()
