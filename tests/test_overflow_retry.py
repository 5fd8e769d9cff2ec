"""Capacity-overflow → recompile-retry paths: join fan-out beyond the
compiled output capacity and group counts beyond the group slots."""

import numpy as np

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.exec.compiler import PlanCompiler


def test_join_output_overflow_retries():
    # every probe row matches every build row: 3000 x 20 = 60000 matches,
    # far beyond the default out capacity max(cap_l, cap_r) = 3072
    ctx = ExecutionContext()
    n = 3000
    ctx.register_table(
        "l", Table.from_pydict({"k": np.zeros(n, np.int32), "x": np.arange(n, dtype=np.int32)})
    )
    ctx.register_table(
        "r", Table.from_pydict({"k": np.zeros(20, np.int32), "y": np.arange(20, dtype=np.int32)})
    )
    res = ctx.sql("SELECT COUNT(*) FROM l JOIN r ON l.k = r.k")
    assert res.result_str() == f"{n * 20}\n"


def test_group_capacity_overflow_retries(monkeypatch):
    # shrink the default group capacity so a modest query overflows it
    monkeypatch.setattr(PlanCompiler, "DEFAULT_GROUP_CAPACITY", 64)
    ctx = ExecutionContext()
    n = 4000
    rng = np.random.default_rng(0)
    ctx.register_table(
        "t",
        Table.from_pydict(
            {
                "k": rng.integers(0, 500, n).astype(np.int32),
                "v": rng.random(n),
            }
        ),
    )
    res = ctx.sql("SELECT k, COUNT(v) FROM t GROUP BY k")
    assert res.num_rows == len(np.unique(rng.integers(0, 500, 0))) or res.num_rows > 64
    # exact check
    k = np.asarray(res.column_values(0), dtype=np.int64)
    assert len(k) == len(set(k))
    total = sum(res.column_values(1))
    assert total == n
