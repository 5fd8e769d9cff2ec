"""Exchange:fold ratio sweep for the ragged fold overlap (VERDICT r2
next #7) — runs overlap_bench's four kernels across wide-row column
counts and window sizes, ON THE REAL CHIP, and prints one JSON line per
configuration plus a summary surface.

The axis that decides when the fused exchange+fold should engage is the
exchange:fold cost ratio: pipelining hides min(exch, fold), so the fold
pays when the exchange leg is comparable or dominant, and is a wash
when the fold dominates (PERFLOG 08-20). On a single chip the exchange
leg is emulated with HBM DMAs (~10x the per-byte speed of multi-chip
ICI), so RATIOS measured here map to multi-chip shapes with ~10x more
exchanged bytes (noted per row in the JSON as `ici_equiv_cols`).

Usage: python benchmarks/overlap_sweep.py  (writes overlap_sweep.json)
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("DFTPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from datafusion_tpu.utils.benchtime import time_pipeline
    from overlap_bench import N_FOLD, _run

    n = int(os.environ.get("DFTPU_BENCH_ROWS", 1 << 23))
    n_regions = 8
    region = n // n_regions
    rng = np.random.default_rng(0)
    gid_np = rng.integers(0, 1 << 20, n).astype(np.int32)
    val = lax.bitcast_convert_type(
        jnp.array((rng.random(n) * 100).astype(np.float32)), jnp.int32
    )
    msk = jnp.array(rng.integers(0, 2, n).astype(np.int32))
    extra_pool = [
        jnp.array(rng.integers(0, 99, n).astype(np.int32)) for _ in range(61)
    ]

    configs = []
    for n_cols in (4, 12, 24, 48):
        configs.append((n_cols, 1024))
    configs.append((24, 256))
    configs.append((24, 4096))

    results = []
    for n_cols, w_pad in configs:
        gid = jnp.array((gid_np % w_pad).astype(np.int32))
        arrs = (gid, val, msk) + tuple(extra_pool[: max(0, n_cols - N_FOLD)])
        times = {}
        try:
            for name, kw in {
                "exch": dict(do_exch=True, do_fold=False, pipe=False),
                "fold": dict(do_exch=False, do_fold=True, pipe=False),
                "serial": dict(do_exch=True, do_fold=True, pipe=False),
                "pipe": dict(do_exch=True, do_fold=True, pipe=True),
            }.items():
                fn = lambda env, kw=kw: _run(
                    tuple(env), n_regions=n_regions, region=region,
                    w_pad=w_pad, **kw
                )
                times[name] = time_pipeline(fn, list(arrs), repeats=3)
        except Exception as e:  # noqa: BLE001
            print(
                json.dumps({"cols": n_cols, "w": w_pad, "error": str(e)[:160]}),
                flush=True,
            )
            continue
        hideable = min(times["exch"], times["fold"])
        eff = (times["serial"] - times["pipe"]) / max(hideable, 1e-9)
        row = {
            "cols": n_cols,
            "w": w_pad,
            "exch_ms": round(times["exch"] * 1e3, 2),
            "fold_ms": round(times["fold"] * 1e3, 2),
            "serial_ms": round(times["serial"] * 1e3, 2),
            "pipe_ms": round(times["pipe"] * 1e3, 2),
            "ratio_exch_fold": round(times["exch"] / max(times["fold"], 1e-9), 3),
            "overlap_eff": round(eff, 3),
            # ICI moves bytes ~10x slower than the HBM emulation: this
            # config's ratio corresponds to ~cols/10 on real multi-chip
            "ici_equiv_cols": round(n_cols / 10, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    out = {"rows": n, "regions": n_regions, "sweep": results}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "overlap_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path, "configs": len(results)}))


if __name__ == "__main__":
    main()
