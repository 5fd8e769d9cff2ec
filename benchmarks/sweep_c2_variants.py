"""Sweep segreduce factored-path variants on the real chip (c2 close-out).

Times the count+sum kernel pipeline (sort + gid + segreduce — the c2
shape minus decode) under DFTPU_SEG_VARIANT settings:
  ""            shipping default (bf16 sublane-broadcast scaled blocks)
  "f32b"        broadcast-multiply in f32, pack-cast product to bf16
  "perpart"     one dot per stacked part (no concat, short-M dots)
  "f32b,perpart"

The variant is a static jit arg read from the env at CALL time, so one
process retraces per setting. Usage:
  python benchmarks/sweep_c2_variants.py [--rows N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("DFTPU_X64", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 25)
    ap.add_argument(
        "--variants", default=",f32b,perpart,f32b|perpart",
        help="comma-separated; '|' separates flags within one variant",
    )
    args = ap.parse_args()
    n = args.rows

    from datafusion_tpu.utils.benchtime import time_pipeline
    from datafusion_tpu.ops.aggregate import sanitize_nonfinite, to_sortable_int
    from datafusion_tpu.ops.pallas.segreduce import segmented_reduce_sorted

    rng = np.random.default_rng(0)
    lat = jax.device_put(rng.random(n, dtype=np.float32) * 40 + 30)
    lng = jax.device_put(rng.random(n, dtype=np.float32) * 360 - 180)
    k = jax.device_put(rng.integers(0, 1 << 16, n).astype(np.int32))
    gcap = 1 << 16

    def make_fn():
        # fresh function object per variant: the outer jit must not reuse
        # a trace captured under a previous DFTPU_SEG_VARIANT setting
        def fn(env):
            kk, la, ln = env
            so = lax.sort([kk, to_sortable_int(la), ln], num_keys=2)
            iota = lax.broadcasted_iota(jnp.int32, (n,), 0)
            boundary = jnp.logical_or(iota == 0, so[0] != jnp.roll(so[0], 1))
            gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
            sel = jnp.ones((n,), jnp.bool_)
            outs = segmented_reduce_sorted(
                gid, (None, so[2]), (sel, sel), ops=("count", "sum"),
                num_groups=gcap,
            )
            return outs, jnp.sum(boundary.astype(jnp.int32))

        return fn

    baseline = None
    for variant in args.variants.split(","):
        v = variant.replace("|", ",")
        os.environ["DFTPU_SEG_VARIANT"] = v
        t, spread = time_pipeline(
            jax.jit(make_fn()), (k, lat, lng), repeats=3, with_spread=True
        )
        ms = round(t * 1e3, 2)
        if baseline is None:
            baseline = ms
        print(
            json.dumps(
                {
                    "variant": v or "(default)",
                    "ms": ms,
                    "spread": round(spread, 3),
                    "vs_default": round(ms / baseline, 4),
                }
            ),
            flush=True,
        )
    os.environ.pop("DFTPU_SEG_VARIANT", None)


if __name__ == "__main__":
    main()
