"""LEFT/RIGHT OUTER JOIN tests — single-chip and distributed
(the reference had no joins at all; ROADMAP.md:33)."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.parallel.mesh import make_mesh


def make_ctx(mesh=None):
    ctx = ExecutionContext(mesh=mesh)
    ctx.register_table(
        "people",
        Table.from_pydict(
            {"pid": np.array([1, 2, 3], np.int32), "name": ["ann", "bob", "cat"]}
        ),
    )
    ctx.register_table(
        "orders",
        Table.from_pydict(
            {
                "oid": np.array([10, 11, 12, 13], np.int32),
                "pid": np.array([3, 1, 3, 9], np.int32),
                "amount": np.array([5.0, 7.5, 2.5, 99.0], np.float64),
            }
        ),
    )
    return ctx


LEFT_SQL = (
    "SELECT orders.oid, people.name FROM orders "
    "LEFT JOIN people ON orders.pid = people.pid ORDER BY oid"
)
LEFT_EXPECT = '10\t"cat"\n11\t"ann"\n12\t"cat"\n13\tNULL\n'

RIGHT_SQL = (
    "SELECT orders.oid, people.name FROM orders "
    "RIGHT JOIN people ON orders.pid = people.pid ORDER BY name"
)
# bob (pid=2) has no orders → NULL oid; ann 1 order; cat 2 orders


def test_left_join_single():
    assert make_ctx().sql(LEFT_SQL).result_str() == LEFT_EXPECT


def test_right_join_single():
    out = make_ctx().sql(RIGHT_SQL).result_str()
    lines = out.splitlines()
    assert len(lines) == 4
    assert 'NULL\t"bob"' in out
    assert lines[0].endswith('"ann"')


def test_left_join_distributed():
    mesh = make_mesh()
    assert make_ctx(mesh).sql(LEFT_SQL).result_str() == LEFT_EXPECT


def test_right_join_distributed():
    mesh = make_mesh()
    single = make_ctx().sql(RIGHT_SQL).result_str()
    dist = make_ctx(mesh).sql(RIGHT_SQL).result_str()
    assert sorted(single.splitlines()) == sorted(dist.splitlines())


def test_left_join_shuffle(monkeypatch):
    monkeypatch.setenv("DFTPU_JOIN_STRATEGY", "shuffle")
    mesh = make_mesh()
    single = make_ctx().sql(LEFT_SQL).result_str()
    dist = make_ctx(mesh).sql(LEFT_SQL).result_str()
    assert single == dist == LEFT_EXPECT


FULL_SQL = (
    "SELECT orders.oid, people.name FROM orders "
    "FULL JOIN people ON orders.pid = people.pid"
)
# left-join head (4 rows, oid 13 unmatched) + unmatched build row bob
FULL_EXPECT = sorted(
    ['10\t"cat"', '11\t"ann"', '12\t"cat"', "13\tNULL", 'NULL\t"bob"']
)

# probe side has duplicate matches (cat has two orders) → the compact
# strategy's dup overflow recompiles to expand; plus one unmatched row
# on each side (bob, oid 13)
FULL_DUP_SQL = (
    "SELECT people.name, orders.oid FROM people "
    "FULL OUTER JOIN orders ON people.pid = orders.pid"
)
FULL_DUP_EXPECT = sorted(
    ['"ann"\t11', '"bob"\tNULL', '"cat"\t10', '"cat"\t12', "NULL\t13"]
)


def test_full_join_single():
    out = make_ctx().sql(FULL_SQL).result_str()
    assert sorted(out.splitlines()) == FULL_EXPECT


def test_full_join_dup_fallback_single():
    out = make_ctx().sql(FULL_DUP_SQL).result_str()
    assert sorted(out.splitlines()) == FULL_DUP_EXPECT


def test_full_join_distributed_broadcast():
    mesh = make_mesh()
    out = make_ctx(mesh).sql(FULL_SQL).result_str()
    assert sorted(out.splitlines()) == FULL_EXPECT
    out = make_ctx(mesh).sql(FULL_DUP_SQL).result_str()
    assert sorted(out.splitlines()) == FULL_DUP_EXPECT


def test_full_join_distributed_shuffle(monkeypatch):
    monkeypatch.setenv("DFTPU_JOIN_STRATEGY", "shuffle")
    mesh = make_mesh()
    out = make_ctx(mesh).sql(FULL_SQL).result_str()
    assert sorted(out.splitlines()) == FULL_EXPECT
    out = make_ctx(mesh).sql(FULL_DUP_SQL).result_str()
    assert sorted(out.splitlines()) == FULL_DUP_EXPECT


def test_full_join_aggregate_counts():
    # unmatched rows on BOTH sides contribute NULLs that COUNT skips
    out = make_ctx().sql(
        "SELECT COUNT(people.name), COUNT(orders.oid) FROM orders "
        "FULL JOIN people ON orders.pid = people.pid"
    ).result_str()
    assert out == "4\t4\n"


def test_full_join_no_matches():
    # disjoint key sets: FULL OUTER = all rows from both sides, all NULL-extended
    ctx = ExecutionContext()
    ctx.register_table(
        "a", Table.from_pydict({"k": np.array([1, 2], np.int32), "x": ["p", "q"]})
    )
    ctx.register_table(
        "b", Table.from_pydict({"k": np.array([7, 8, 9], np.int32), "y": ["r", "s", "t"]})
    )
    out = ctx.sql("SELECT a.x, b.y FROM a FULL JOIN b ON a.k = b.k").result_str()
    assert sorted(out.splitlines()) == sorted(
        ['"p"\tNULL', '"q"\tNULL', 'NULL\t"r"', 'NULL\t"s"', 'NULL\t"t"']
    )


def test_left_join_aggregate_counts():
    # COUNT skips NULLs from unmatched rows; COUNT(*)-style COUNT(oid) does not
    ctx = make_ctx()
    out = ctx.sql(
        "SELECT COUNT(people.name), COUNT(orders.oid) FROM orders "
        "LEFT JOIN people ON orders.pid = people.pid"
    ).result_str()
    assert out == "3\t4\n"


def test_self_join_with_aliases():
    # aliases make self-joins expressible (ambiguous without them)
    ctx = ExecutionContext()
    ctx.register_table(
        "emp",
        Table.from_pydict(
            {
                "id": np.array([1, 2, 3], np.int32),
                "boss": np.array([3, 3, 3], np.int32),
                "name": ["ann", "bob", "cat"],
            }
        ),
    )
    out = ctx.sql(
        "SELECT e.name, m.name FROM emp AS e JOIN emp AS m ON e.boss = m.id ORDER BY name"
    ).result_str()
    assert out == '"ann"\t"cat"\n"bob"\t"cat"\n"cat"\t"cat"\n'


def test_two_key_join_int32_packing():
    # with x64 off (the TPU configuration), two-key joins pack into int32
    # using static dictionary bounds — exercised in a subprocess
    import subprocess
    import sys as _sys
    import os as _os

    code = """
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import datafusion_tpu as df
ctx = df.ExecutionContext()
ctx.register_table("a", df.Table.from_pydict({
    "c1": ["x", "x", "y", "z"], "c2": ["p", "q", "p", "q"],
    "v": np.arange(4, dtype=np.int32)}))
ctx.register_table("b", df.Table.from_pydict({
    "d1": ["x", "y", "z"], "d2": ["q", "p", "z"],
    "w": np.array([10, 20, 30], np.int32)}))
out = ctx.sql(
    "SELECT a.v, b.w FROM a JOIN b ON a.c1 = b.d1 AND a.c2 = b.d2 ORDER BY v"
).result_str()
assert out == "1\\t10\\n2\\t20\\n", repr(out)
print("ok")
"""
    proc = subprocess.run(
        [_sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=240,
        env={**_os.environ, "DFTPU_X64": "0", "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    assert "ok" in proc.stdout
