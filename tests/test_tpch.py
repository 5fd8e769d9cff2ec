"""TPC-H-shaped workload end-to-end (benchmarks/tpch.py): every query
cross-checked against a pandas reference at small scale."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))


@pytest.mark.parametrize(
    "name", ["q1", "q3", "q5ish", "q6", "q10ish", "q12ish", "q18ish"]
)
def test_tpch_query(name):
    import datafusion_tpu as df
    from tpch import QUERIES, gen_tables, verify

    lineitem, orders, customer = gen_tables(0.003, seed=7)
    ctx = df.ExecutionContext()
    ctx.register_table("lineitem", df.Table.from_pydict(lineitem))
    ctx.register_table("orders", df.Table.from_pydict(orders))
    ctx.register_table("customer", df.Table.from_pydict(customer))
    res = ctx.sql(QUERIES[name])
    verify(name, res, lineitem, orders, customer)


def test_tpch_q1_distributed_parity():
    import datafusion_tpu as df
    from datafusion_tpu.parallel.mesh import make_mesh
    from tpch import QUERIES, gen_tables

    lineitem, orders, customer = gen_tables(0.003, seed=7)
    single = df.ExecutionContext()
    dist = df.ExecutionContext(mesh=make_mesh())
    for ctx in (single, dist):
        ctx.register_table("lineitem", df.Table.from_pydict(lineitem))
        ctx.register_table("orders", df.Table.from_pydict(orders))
        ctx.register_table("customer", df.Table.from_pydict(customer))
    a = single.sql(QUERIES["q1"]).result_str()
    b = dist.sql(QUERIES["q1"]).result_str()
    # float sums differ in reduction order; compare cell-wise tolerantly
    la, lb = a.splitlines(), b.splitlines()
    assert len(la) == len(lb)
    for ra, rb in zip(la, lb):
        for x, y in zip(ra.split("\t"), rb.split("\t")):
            if x != y:
                assert abs(float(x) - float(y)) <= 1e-3 * max(1.0, abs(float(x)))
