"""BLOCK/SUB sweep for the segreduce kernel's sequential-grid latency
(PERFLOG r4.1/r4.4: the c2 +50 ms tracks GRID STEP COUNT — extra op
chains add ~1-1.5 us of unpipelined latency per step, so amortize by
making steps bigger). Each (BLOCK, SUB) point runs in a subprocess
(module constants bind at import via DFTPU_SEG_BLOCK/DFTPU_SEG_SUB).

Usage: python benchmarks/profile_c2_block.py            # the sweep
       python benchmarks/profile_c2_block.py --one      # single point
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

os.environ.setdefault("DFTPU_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(rows: int) -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    from datafusion_tpu.utils.benchtime import time_pipeline
    from datafusion_tpu.ops.aggregate import sanitize_nonfinite, to_sortable_int
    from datafusion_tpu.ops.pallas.segreduce import (
        BLOCK, SUB, segmented_reduce_sorted,
    )

    n = rows
    rng = np.random.default_rng(0)
    lat = jax.device_put(rng.random(n, dtype=np.float32) * 40 + 30)
    lng = jax.device_put(rng.random(n, dtype=np.float32) * 360 - 180)
    k = jax.device_put(rng.integers(0, 1 << 16, n).astype(np.int32))
    gcap = 1 << 16

    def fn(env):
        kk, la, ln = env
        so = lax.sort([kk, to_sortable_int(la), ln], num_keys=2)
        iota = lax.broadcasted_iota(jnp.int32, (n,), 0)
        boundary = jnp.logical_or(iota == 0, so[0] != jnp.roll(so[0], 1))
        gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
        sel = jnp.ones((n,), jnp.bool_)
        outs = segmented_reduce_sorted(
            gid,
            (so[0].astype(jnp.float32), sanitize_nonfinite(so[2])),
            (sel, sel),
            ops=("count", "sum"),
            num_groups=gcap,
            interpret=jax.devices()[0].platform not in ("tpu", "axon"),
        )
        return outs, jnp.sum(boundary.astype(jnp.int32))

    t, spread = time_pipeline(jax.jit(fn), (k, lat, lng), repeats=3,
                              with_spread=True)
    print(json.dumps({
        "block": BLOCK, "sub": SUB, "ms": round(t * 1e3, 2),
        "spread": round(spread, 3),
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", action="store_true")
    ap.add_argument("--rows", type=int, default=1 << 25)
    args = ap.parse_args()
    if args.one:
        run_one(args.rows)
        return
    for block, sub in [
        (1024, 256), (2048, 256), (4096, 256), (4096, 512),
        (8192, 512), (8192, 1024), (1024, 1024),
    ]:
        env = dict(os.environ)
        env["DFTPU_SEG_BLOCK"] = str(block)
        env["DFTPU_SEG_SUB"] = str(sub)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             "--rows", str(args.rows)],
            env=env, capture_output=True, text=True, timeout=2400,
        )
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if out:
            print(out[-1], flush=True)
        else:
            print(json.dumps({
                "block": block, "sub": sub,
                "error": (r.stderr or r.stdout)[-300:],
            }), flush=True)


if __name__ == "__main__":
    main()
