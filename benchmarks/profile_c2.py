"""Stage breakdown of the c2 hash-aggregate pipeline on the real chip.

c2 = `SELECT k, MIN(lat), MAX(lat), SUM(lng), COUNT(lat) GROUP BY k`
(packed-gid co-sort + pallas segreduce).  VERDICT r3 next #1: 58 ms of
the 206.5 ms sits above the 148.4 ms 3-operand sort floor — this script
times cumulative stage pipelines so the deltas attribute it:

  s1  main co-sort alone (the floor: [packed i32, lat_img i32, lng f32],
      2 keys)
  s2  + boundary compare / cumsum gid / sel decode
  s3  + segreduce kernel, count slot only
  s4  + segreduce kernel, count+sum slots (the shipping kernel load)
  s5  the full compiled query

Usage: python benchmarks/profile_c2.py [--rows N]
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
    args = ap.parse_args()
    n = args.rows

    from datafusion_tpu.utils.benchtime import time_pipeline
    from datafusion_tpu.ops.aggregate import sanitize_nonfinite, to_sortable_int
    from datafusion_tpu.ops.pallas.segreduce import segmented_reduce_sorted

    rng = np.random.default_rng(0)
    lat = jax.device_put(rng.random(n, dtype=np.float32) * 40 + 30)
    lng = jax.device_put(rng.random(n, dtype=np.float32) * 360 - 180)
    k = jax.device_put(rng.integers(0, 1 << 16, n).astype(np.int32))
    nslots = 1 << 16
    gcap = nslots

    def head(env):
        kk, la, ln = env
        img = to_sortable_int(la)
        return lax.sort([kk, img, ln], num_keys=2)

    def gid_of(sorted_ops):
        packed = sorted_ops[0]
        iota = lax.broadcasted_iota(jnp.int32, (n,), 0)
        first = iota == 0
        changed = packed != jnp.roll(packed, 1)
        boundary = jnp.logical_or(first, changed)
        gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
        return gid, jnp.sum(boundary.astype(jnp.int32))

    def s1(env):
        return head(env)

    def s2(env):
        so = head(env)
        gid, ng = gid_of(so)
        return gid, ng, so[2]

    def s3(env):
        so = head(env)
        gid, ng = gid_of(so)
        sel = jnp.ones((n,), jnp.bool_)
        outs = segmented_reduce_sorted(
            gid, (so[0].astype(jnp.float32),), (sel,), ops=("count",),
            num_groups=gcap,
        )
        return outs, ng

    def s4(env):
        so = head(env)
        gid, ng = gid_of(so)
        sel = jnp.ones((n,), jnp.bool_)
        outs = segmented_reduce_sorted(
            gid,
            (so[0].astype(jnp.float32), sanitize_nonfinite(so[2])),
            (sel, sel),
            ops=("count", "sum"),
            num_groups=gcap,
        )
        return outs, ng

    def s4b(env):
        # two COUNT slots (value-independent rows): isolates "any second
        # op" cost from sum-specific cost
        so = head(env)
        gid, ng = gid_of(so)
        sel = jnp.ones((n,), jnp.bool_)
        sel2 = so[2] > 0
        outs = segmented_reduce_sorted(
            gid,
            (so[0].astype(jnp.float32), so[0].astype(jnp.float32)),
            (sel, sel2),
            ops=("count", "count"),
            num_groups=gcap,
        )
        return outs, ng

    def s4c(env):
        # sum WITHOUT the count slot
        so = head(env)
        gid, ng = gid_of(so)
        sel = jnp.ones((n,), jnp.bool_)
        outs = segmented_reduce_sorted(
            gid,
            (sanitize_nonfinite(so[2]),),
            (sel,),
            ops=("sum",),
            num_groups=gcap,
        )
        return outs, ng

    def s4_at(gc):
        # NOTE: gc must be >= the true group count — the kernel's
        # dynamic accumulator-window write is unguarded past num_groups
        # (feeding 65536 groups into a 4096-slot table crashed the TPU
        # worker, r4). Scale the key domain WITH the table instead.
        def fn(env):
            kk, la, ln = env
            kk = jnp.remainder(kk, jnp.int32(gc))  # shrink the domain
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
                num_groups=gc,
            )
            return outs, jnp.sum(boundary.astype(jnp.int32))
        return fn

    def s4f(env):
        # count+sum with the bf16x3 split DISABLED (DFTPU_SUM_SPLIT=0):
        # one lossy single-pass dot row per sum — isolates the split's
        # 3x M-rows + concat + recombine cost (perf probe, inexact)
        os.environ["DFTPU_SUM_SPLIT"] = "0"
        try:
            return s4(env)
        finally:
            os.environ["DFTPU_SUM_SPLIT"] = "1"

    results = {}
    for name, fn in [("s1_sort", s1), ("s2_gid", s2), ("s3_count", s3),
                     ("s4_count_sum", s4), ("s4b_two_counts", s4b),
                     ("s4c_sum_only", s4c), ("s4f_nosplit", s4f),
                     ("s4_gcap4k", s4_at(4096)),
                     ("s4_gcap16k", s4_at(16384)),
                     ("s4_gcap256k", s4_at(1 << 18))]:
        t, spread = time_pipeline(
            jax.jit(fn), (k, lat, lng), repeats=3, with_spread=True
        )
        results[name] = round(t * 1e3, 2)
        print(json.dumps({"stage": name, "ms": round(t * 1e3, 2),
                          "spread": round(spread, 3)}), flush=True)

    # s5: full query
    from benchmarks.bench_suite import compile_query, make_tables
    big, dim = make_tables(n, 1 << 10)
    fn, env = compile_query(
        "SELECT k, MIN(lat), MAX(lat), SUM(lng), COUNT(lat) FROM big GROUP BY k",
        {"big": big},
    )
    t, spread = time_pipeline(fn, env, repeats=3, with_spread=True)
    results["s5_full"] = round(t * 1e3, 2)
    print(json.dumps({"stage": "s5_full", "ms": round(t * 1e3, 2),
                      "spread": round(spread, 3)}), flush=True)

    deltas = {
        "gid_pass": results["s2_gid"] - results["s1_sort"],
        "count_dot": results["s3_count"] - results["s2_gid"],
        "sum_dot": results["s4_count_sum"] - results["s3_count"],
        "decode_misc": results["s5_full"] - results["s4_count_sum"],
    }
    print(json.dumps({"deltas_ms": {k2: round(v, 2) for k2, v in deltas.items()}}))


if __name__ == "__main__":
    main()
