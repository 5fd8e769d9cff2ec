"""Weak-scaling harness: fixed per-device workload, growing mesh.

BASELINE.md target: >= 80% weak-scaling efficiency at 2+ hosts. This
environment exposes ONE real chip, so by default the harness runs on
virtual CPU devices (functional validation of the sharded pipelines +
collectives; the efficiency numbers are only meaningful on real chips,
where the same harness runs unchanged).

Usage:
  python benchmarks/weak_scaling.py [--rows-per-dev N] [--devices 1,2,4,8]
  JAX_PLATFORMS=tpu python benchmarks/weak_scaling.py   # on a real slice

Emits one JSON line per mesh size: rows/s, per-device rows/s, and
efficiency vs the 1-device run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-dev", type=int, default=1 << 20)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument(
        "--tpu", action="store_true", help="run on the real TPU devices"
    )
    ap.add_argument(
        "--sql",
        default=(
            "SELECT k, MIN(lat), MAX(lat), SUM(lng), COUNT(lat) "
            "FROM big GROUP BY k"
        ),
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.devices.split(",")]

    # Decide BEFORE jax initializes: real-chip mode only with an explicit
    # --tpu (this machine's env pins JAX_PLATFORMS=axon for its single
    # chip, which cannot weak-scale; the harness is written for real
    # slices but validates on virtual CPU devices by default).
    if not args.tpu:
        os.environ["DFTPU_FORCE_CPU"] = "1"
        need = max(sizes)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={need}"
            )
        print(
            f"[weak_scaling] virtual mode: {need} CPU devices (functional "
            "only — efficiency numbers are meaningful on real chips; pass "
            "--tpu on a real slice)",
            file=sys.stderr,
        )

    import jax

    import numpy as np

    import datafusion_tpu as df
    from datafusion_tpu.exec.compiler import compile_plan
    from datafusion_tpu.parallel.dist import compile_plan_distributed
    from datafusion_tpu.parallel.mesh import make_mesh
    from datafusion_tpu.utils.benchtime import time_pipeline

    base = None
    for n_dev in sizes:
        n = args.rows_per_dev * n_dev
        rng = np.random.default_rng(0)
        table = df.Table.from_pydict(
            {
                "k": rng.integers(0, 1 << 14, n).astype(np.int32),
                "lat": rng.random(n, dtype=np.float32) * 40 + 30,
                "lng": rng.random(n, dtype=np.float32) * 360 - 180,
            }
        )
        ctx = df.ExecutionContext(
            mesh=make_mesh(jax.devices()[:n_dev]) if n_dev > 1 else None
        )
        ctx.register_table("big", table)
        plan = ctx.plan(args.sql)
        if n_dev > 1:
            cq = compile_plan_distributed(plan, ctx._tables, ctx.mesh)
        else:
            cq = compile_plan(plan, ctx._tables)
        env = [
            [(c.data, c.validity) for c in t.columns] for t in cq._scan_tables
        ]
        dt = time_pipeline(cq._jitted, env)
        rows_s = n / dt
        per_dev = rows_s / n_dev
        if base is None:
            base = per_dev
        print(
            json.dumps(
                {
                    "devices": n_dev,
                    "rows": n,
                    "ms": round(dt * 1e3, 2),
                    "rows_per_s": round(rows_s, 1),
                    "rows_per_s_per_dev": round(per_dev, 1),
                    "weak_scaling_efficiency": round(per_dev / base, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
