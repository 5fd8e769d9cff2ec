"""Stage attribution for the direct-index join at BASELINE spec scale
(c4 @ 100M x 10M measured 0.46 of the single-gather floor in r4 — at
33.5M x 2M it was 0.91). Candidate: the occupancy lax.cond running both
branches (select conversion) = a second full-probe gather.

  g1  the floor: one jnp.take of the build payload at probe scale
  g2  direct_index_join as shipped
  g3  variant: matched = p_in (occupancy assumed full — no cond)
  g4  variant: occupancy gather FORCED (no cond)

Usage: python benchmarks/profile_c4.py [--rows N] [--dim N]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--dim", type=int, default=10_000_000)
    args = ap.parse_args()
    n, nd = args.rows, args.dim

    from datafusion_tpu.utils.benchtime import time_pipeline
    from datafusion_tpu.ops.join import direct_index_join

    rng = np.random.default_rng(2)
    idx = jax.device_put(rng.integers(0, nd, n).astype(np.int32))
    w = jax.device_put(rng.random(nd, dtype=np.float32))
    bkey = jax.device_put(np.arange(nd, dtype=np.int32))

    def g1(env):
        i, ww, bk = env
        return jnp.take(ww, i)

    def g2(env):
        i, ww, bk = env
        psel = jnp.ones((n,), jnp.bool_)
        bsel = jnp.ones((nd,), jnp.bool_)
        cols, matched, dups = direct_index_join(
            i, psel, bk, bsel, [(ww, None)], 0, nd, matched_validity=False
        )
        return cols[0][0], matched, dups

    def _core(env, mode):
        i, ww, bk = env
        slot = jnp.clip(bk, 0, nd - 1)
        table = jnp.zeros((nd + 1,), ww.dtype).at[slot].set(ww, mode="drop")
        pslot = jnp.clip(i, 0, nd - 1)
        d = jnp.take(table, pslot)
        if mode == "assume_full":
            matched = jnp.ones((n,), jnp.bool_)
        else:
            occ = jnp.zeros((nd + 1,), jnp.int8).at[slot].max(
                jnp.ones((), jnp.int8), mode="drop"
            )
            matched = jnp.take(occ, pslot) != 0
        return d, matched

    def _fused(env):
        # occupancy rides the SAME gather as the payload: a [nd, 2] f32
        # table (value lane + occ lane) gathered by row — random access
        # is latency-bound, so 8 contiguous bytes cost what 4 do, and
        # the occupancy pass (the second full-probe gather) vanishes
        i, ww, bk = env
        slot = jnp.clip(bk, 0, nd - 1)
        t2 = (
            jnp.zeros((nd + 1, 2), ww.dtype)
            .at[slot, 0].set(ww, mode="drop")
            .at[slot, 1].set(jnp.ones((), ww.dtype), mode="drop")
        )
        pslot = jnp.clip(i, 0, nd - 1)
        g = jnp.take(t2, pslot, axis=0)
        return g[:, 0], g[:, 1] != 0

    results = {}
    for name, fn in [
        ("g1_floor_take", g1),
        ("g2_shipped", g2),
        ("g3_assume_full", lambda e: _core(e, "assume_full")),
        ("g4_forced_occ", lambda e: _core(e, "occ")),
        ("g4f_fused_occ", _fused),
    ]:
        t, spread = time_pipeline(
            jax.jit(fn), (idx, w, bkey), repeats=3, with_spread=True
        )
        results[name] = round(t * 1e3, 2)
        print(json.dumps({"stage": name, "ms": round(t * 1e3, 2),
                          "spread": round(spread, 3)}), flush=True)

    # compiled-query stages: where do the pipeline's extra ms hide?
    from bench_suite import compile_query, make_join_tables

    big4, dim4 = make_join_tables(n, nd)
    for name, sql in [
        ("g5_full_query",
         "SELECT big.k, dim.w FROM big JOIN dim ON big.k = dim.pk"),
        ("g6_w_only",
         "SELECT dim.w FROM big JOIN dim ON big.k = dim.pk"),
    ]:
        fn, env = compile_query(sql, {"big": big4, "dim": dim4})
        t, spread = time_pipeline(fn, env, repeats=3, with_spread=True)
        print(json.dumps({"stage": name, "ms": round(t * 1e3, 2),
                          "spread": round(spread, 3)}), flush=True)


if __name__ == "__main__":
    main()
