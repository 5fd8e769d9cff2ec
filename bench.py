"""Benchmark runner — prints ONE JSON line to stdout.

Flagship metric: scan→filter→project throughput (BASELINE.md config 1,
the reference's uk_cities query shape) in rows/s on one chip, with
vs_baseline = fraction of the HBM-bandwidth speed-of-light roofline
(BASELINE.md: scan/filter is HBM-BW-bound; target ≥ 0.70).

Secondary operator throughputs (hash aggregate, sort, join) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("DFTPU_X64", "0")  # f32 on TPU hardware

import numpy as np

import jax
import jax.numpy as jnp


def _hbm_bandwidth_gbps() -> float:
    """Speed-of-light HBM bandwidth for the local chip, GB/s."""
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v4" in kind:
        return 1228.0
    if "v6" in kind or "trillium" in kind:
        return 1640.0
    return 819.0  # conservative default (also used on CPU dev runs)


def _time_pipeline(fn, env, iters=10, warmup=3) -> float:
    for _ in range(warmup):
        jax.block_until_ready(fn(env))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(env)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _compile(sql: str, tables):
    import datafusion_tpu as df

    ctx = df.ExecutionContext()
    for name, t in tables.items():
        ctx.register_table(name, t)
    plan = ctx.plan(sql)
    from datafusion_tpu.exec.compiler import compile_plan

    cq = compile_plan(plan, ctx._tables)
    env = [[(c.data, c.validity) for c in t.columns] for t in cq._scan_tables]
    return cq._jitted, env


def main() -> None:
    import datafusion_tpu as df

    n = int(os.environ.get("DFTPU_BENCH_ROWS", 1 << 25))  # 33.5M rows
    rng = np.random.default_rng(0)
    lat = (rng.random(n, dtype=np.float32) * 40 + 30)
    lng = (rng.random(n, dtype=np.float32) * 360 - 180)
    k = rng.integers(0, 1 << 16, n).astype(np.int32)
    table = df.Table.from_pydict({"k": k, "lat": lat, "lng": lng})

    # ---- flagship: filter + project (config 1) -----------------------
    fn, env = _compile(
        "SELECT k, lat, lng, lat + lng FROM cities WHERE lat > 51.0 AND lat < 53",
        {"cities": table},
    )
    dt = _time_pipeline(fn, env)
    rows_per_s = n / dt

    # bytes touched per row: read k/lat/lng (4+4+4), write k/lat/lng/sum
    # (16) + sel mask (1)
    bytes_per_row = 12 + 17
    roofline_rows = _hbm_bandwidth_gbps() * 1e9 / bytes_per_row
    vs = rows_per_s / roofline_rows

    # ---- secondary operators (stderr) --------------------------------
    try:
        for label, sql in [
            ("hash_aggregate", "SELECT k, MIN(lat), MAX(lat), SUM(lng), COUNT(lat) FROM cities GROUP BY k"),
            ("sort", "SELECT k, lat FROM cities ORDER BY lat"),
        ]:
            f2, e2 = _compile(sql, {"cities": table})
            d2 = _time_pipeline(f2, e2, iters=3, warmup=2)
            print(f"[bench] {label}: {n / d2 / 1e9:.3f} Grows/s ({d2*1e3:.1f} ms)", file=sys.stderr)
    except Exception as e:  # secondary benches must not break the headline
        print(f"[bench] secondary failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "filter_project_rows_per_s_per_chip",
                "value": round(rows_per_s, 1),
                "unit": "rows/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
