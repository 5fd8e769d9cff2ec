"""Distributed SQL over a device mesh — the execution model the
reference only roadmapped (ROADMAP.md 0.8-1.0).

Run on CPU with virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  DFTPU_FORCE_CPU=1 python examples/distributed_sql.py
or on a TPU slice directly (devices are picked up automatically).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import datafusion_tpu as df
from datafusion_tpu.parallel.mesh import make_mesh

import jax

print(f"devices: {jax.devices()}")
ctx = df.ExecutionContext(mesh=make_mesh())

rng = np.random.default_rng(0)
n = 200_000
ctx.register_table(
    "sales",
    df.Table.from_pydict(
        {
            "region": [f"r{i % 13:02d}" for i in rng.integers(0, 13, n)],
            "amount": np.round(rng.random(n) * 1000, 2).astype(np.float32),
        }
    ),
)

result = ctx.sql(
    "SELECT region, COUNT(amount) AS orders, SUM(amount) AS total "
    "FROM sales WHERE amount > 10 GROUP BY region ORDER BY region"
)
print(result.result_str())
print(f"stats: {ctx.last_stats}")
