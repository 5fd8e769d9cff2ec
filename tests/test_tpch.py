"""TPC-H-shaped workload end-to-end (benchmarks/tpch.py): every query
cross-checked against a pandas reference at small scale. all 22
official shapes (VERDICT r4 #3), including comma-FROM texts, EXISTS /
NOT EXISTS, NOT IN, correlated scalar AVG, CASE ratio, OR-of-ANDs,
nested IN, and SUBSTR + NOT EXISTS."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

ALL_QUERIES = [
    "q1", "q2ish", "q3", "q4ish", "q5ish", "q6", "q7ish", "q8ish",
    "q9ish", "q10ish", "q11ish", "q12ish", "q13ish", "q14ish", "q15ish",
    "q16ish", "q17ish", "q18ish", "q19ish", "q20ish", "q21ish", "q22ish",
]


def _ctx(tables):
    import datafusion_tpu as df

    lineitem, orders, customer, part = tables
    ctx = df.ExecutionContext()
    ctx.register_table("lineitem", df.Table.from_pydict(lineitem))
    ctx.register_table("orders", df.Table.from_pydict(orders))
    ctx.register_table("customer", df.Table.from_pydict(customer))
    ctx.register_table("part", df.Table.from_pydict(part))
    return ctx


@pytest.fixture(scope="module")
def tpch_tables():
    from tpch import gen_tables

    return gen_tables(0.003, seed=7)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_tpch_query(name, tpch_tables):
    from tpch import QUERIES, verify

    lineitem, orders, customer, part = tpch_tables
    ctx = _ctx(tpch_tables)
    res = ctx.sql(QUERIES[name])
    verify(name, res, lineitem, orders, customer, part)


def test_tpch_q1_distributed_parity(tpch_tables):
    import datafusion_tpu as df
    from datafusion_tpu.parallel.mesh import make_mesh
    from tpch import QUERIES, gen_tables

    lineitem, orders, customer, part = tpch_tables
    single = _ctx(tpch_tables)
    dist = df.ExecutionContext(mesh=make_mesh())
    dist.register_table("lineitem", df.Table.from_pydict(lineitem))
    dist.register_table("orders", df.Table.from_pydict(orders))
    dist.register_table("customer", df.Table.from_pydict(customer))
    dist.register_table("part", df.Table.from_pydict(part))
    a = single.sql(QUERIES["q1"]).result_str()
    b = dist.sql(QUERIES["q1"]).result_str()
    # float sums differ in reduction order; compare cell-wise tolerantly
    la, lb = a.splitlines(), b.splitlines()
    assert len(la) == len(lb)
    for ra, rb in zip(la, lb):
        for x, y in zip(ra.split("\t"), rb.split("\t")):
            if x != y:
                assert abs(float(x) - float(y)) <= 1e-3 * max(1.0, abs(float(x)))
