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


def _time_pipeline(fn, env, repeats: int = 1, with_spread: bool = False):
    """Readback-fenced slope timing, minimized over queue depths — see
    datafusion_tpu/utils/benchtime.py for the methodology (and why
    block_until_ready and deep dispatch queues both mislead through this
    machine's tunneled backend). The flagship (sub-ms) metric uses
    repeats=5 median-of-sweeps with the cross-sweep spread reported in
    the JSON: the tunnel has multi-second slow stretches and this one
    number is what the driver records per round."""
    from datafusion_tpu.utils.benchtime import time_pipeline

    return time_pipeline(fn, env, repeats=repeats, with_spread=with_spread)


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
    _t_start = time.time()
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
    dt, spread = _time_pipeline(fn, env, repeats=5, with_spread=True)
    rows_per_s = n / dt

    # True data movement of the compiled pipeline: pass-through columns
    # (k, lat, lng) are elided from the jit outputs — projection of an
    # existing column is metadata — so the device reads lat+lng for the
    # predicate/arithmetic (8 B) and writes the computed sum column (4 B)
    # plus the selection mask (1 B).
    bytes_per_row = 8 + 5
    roofline_rows = _hbm_bandwidth_gbps() * 1e9 / bytes_per_row
    vs = rows_per_s / roofline_rows

    # ---- secondary operators (stderr) --------------------------------
    # skipped when the headline consumed too much wall clock (cold remote
    # AOT compiles run ~90 s each); the driver only records the JSON line
    budget_s = float(os.environ.get("DFTPU_BENCH_BUDGET_S", "420"))
    try:
        if time.time() - _t_start > budget_s * 0.5:
            raise TimeoutError(
                f"headline took {time.time() - _t_start:.0f}s; skipping secondaries"
            )
        for label, sql in [
            ("hash_aggregate", "SELECT k, MIN(lat), MAX(lat), SUM(lng), COUNT(lat) FROM cities GROUP BY k"),
            ("sort", "SELECT k, lat FROM cities ORDER BY lat"),
        ]:
            f2, e2 = _compile(sql, {"cities": table})
            d2 = _time_pipeline(f2, e2)
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
                "spread": round(spread, 4),
            }
        )
    )


if __name__ == "__main__":
    # the tunneled TPU backend has intermittent outages; retry before
    # giving up so driver-run benches survive a transient flake
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"[bench] attempt {attempt + 1} failed ({e}); retrying", file=sys.stderr)
            time.sleep(60)
