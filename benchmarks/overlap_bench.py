"""Exchange/fold overlap microbench for the ragged shuffle — measured ON
THE REAL CHIP.

Mirrors the cross-region structure of ragged_exchange_fold
(ops/pallas/ragged_shuffle.py process_region): while region r's
"exchange" DMA is in flight, region r-1 folds into the dense group
windows. On one chip the exchange leg is emulated with region-sized
HBM→HBM DMAs of the full wide row (every exchanged column), exactly the
byte pattern the inter-chip RDMA moves; the fold consumes the narrow
slice (gid + value + mask) through the production double-buffered VMEM
staging.

Four kernels over identical data:
  exch :  the region DMA schedule alone            — exchange bound
  fold :  the staged fold alone                    — compute bound
  serial: exchange region r, wait, fold region r   — no overlap
  pipe :  exchange region r+1 in flight during fold r (production
          schedule)

Overlap efficiency = (serial - pipe) / min(exch, fold): 1.0 = the
cheaper leg fully hides. Prints one JSON line.

Usage: python benchmarks/overlap_bench.py
Knobs: DFTPU_BENCH_ROWS (default 8.4M), DFTPU_OVERLAP_COLS (wide-row
column count, default 24), DFTPU_OVERLAP_W (window, default 1024).
"""

from __future__ import annotations

import functools
import json
import os
import sys

os.environ.setdefault("DFTPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 4096  # staging granularity (rows) for the fold
N_FOLD = 3  # arrays the fold consumes: gid, value, mask


def _kernel(*refs, n_cols, n_regions, region, w_pad, do_exch, do_fold, pipe):
    from datafusion_tpu.ops.pallas.ragged_shuffle import _SUB, _fold_sub

    ins = refs[:n_cols]
    acc = refs[n_cols]
    recv = refs[n_cols + 1 : 2 * n_cols + 1]
    exch_sem, stage_sem = refs[2 * n_cols + 1], refs[2 * n_cols + 2]
    stages = (
        refs[2 * n_cols + 3 : 2 * n_cols + 3 + N_FOLD],
        refs[2 * n_cols + 3 + N_FOLD :],
    )
    acc[:] = jnp.zeros((w_pad,), jnp.float32)
    n_chunks = region // CHUNK

    def exch_dma(r, c):
        # per-parity exchange sems: region r+1's completions must not
        # satisfy region r's waits (semaphores count bytes, not regions)
        sl = pl.ds(r * region, region)
        return pltpu.make_async_copy(ins[c].at[sl], recv[c].at[sl],
                                     exch_sem.at[r % 2])

    def start_exch(r):
        for c in range(n_cols):
            exch_dma(r, c).start()

    def wait_exch(r):
        for c in range(n_cols):
            exch_dma(r, c).wait()

    def stage_dma(r, k, slot, a):
        return pltpu.make_async_copy(
            recv[a].at[pl.ds(r * region + k * CHUNK, CHUNK)],
            stages[slot][a],
            stage_sem.at[slot],
        )

    def fold_bank(slot):
        bank = stages[slot]
        gid = bank[0][:]
        val = lax.bitcast_convert_type(bank[1][:], jnp.float32)
        msk = bank[2][:] != 0
        for s in range(CHUNK // _SUB):
            sl = slice(s * _SUB, (s + 1) * _SUB)
            _fold_sub(
                ("sum",), (0,), w_pad,
                jnp.clip(gid[sl], 0, w_pad - 1), [val[sl]], [msk[sl]], [acc],
            )

    def fold_region(r):
        # production double buffer (ragged_shuffle.process_region)
        for a in range(N_FOLD):
            stage_dma(r, 0, 0, a).start()

        def body(k2, _):
            k0, k1 = 2 * k2, 2 * k2 + 1
            for a in range(N_FOLD):
                stage_dma(r, k0, 0, a).wait()

            @pl.when(k1 < n_chunks)
            def _():
                for a in range(N_FOLD):
                    stage_dma(r, k1, 1, a).start()

            fold_bank(0)

            @pl.when(k1 < n_chunks)
            def _():
                for a in range(N_FOLD):
                    stage_dma(r, k1, 1, a).wait()

                @pl.when(k1 + 1 < n_chunks)
                def _():
                    for a in range(N_FOLD):
                        stage_dma(r, k1 + 1, 0, a).start()

                fold_bank(1)

            return 0

        lax.fori_loop(0, (n_chunks + 1) // 2, body, 0)

    if do_exch and do_fold and pipe:
        start_exch(0)
        for r in range(n_regions):
            if r + 1 < n_regions:
                start_exch(r + 1)  # next exchange rides the DMA engines
            # wait only region r's bytes (its own descriptors' amounts)
            wait_exch(r)
            fold_region(r)  # overlaps region r+1's exchange
    elif do_exch and do_fold:
        for r in range(n_regions):
            start_exch(r)
            wait_exch(r)  # fully serialized
            fold_region(r)
    elif do_exch:
        for r in range(n_regions):
            start_exch(r)
        for r in range(n_regions):
            wait_exch(r)
    else:
        for r in range(n_regions):
            fold_region(r)


@functools.partial(
    jax.jit,
    static_argnames=("n_regions", "region", "w_pad", "do_exch", "do_fold", "pipe"),
)
def _run(arrs, *, n_regions, region, w_pad, do_exch, do_fold, pipe):
    n_cols = len(arrs)
    kern = functools.partial(
        _kernel,
        n_cols=n_cols, n_regions=n_regions, region=region, w_pad=w_pad,
        do_exch=do_exch, do_fold=do_fold, pipe=pipe,
    )
    n = n_regions * region
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_cols,
        out_specs=tuple(
            [pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * n_cols
        ),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((w_pad,), jnp.float32)]
            + [jax.ShapeDtypeStruct((n,), jnp.int32) for _ in range(n_cols)]
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        + [pltpu.VMEM((CHUNK,), jnp.int32) for _ in range(2 * N_FOLD)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.devices()[0].platform not in ("tpu", "axon"),
    )(*arrs)[0]


def main() -> None:
    from datafusion_tpu.utils.benchtime import time_pipeline

    n = int(os.environ.get("DFTPU_BENCH_ROWS", 1 << 23))  # 8.4M rows
    n_cols = int(os.environ.get("DFTPU_OVERLAP_COLS", 24))
    w_pad = int(os.environ.get("DFTPU_OVERLAP_W", 1024))
    n_regions = 8
    region = n // n_regions
    rng = np.random.default_rng(0)
    gid = jnp.array(rng.integers(0, w_pad, n).astype(np.int32))
    val = lax.bitcast_convert_type(
        jnp.array((rng.random(n) * 100).astype(np.float32)), jnp.int32
    )
    msk = jnp.array(rng.integers(0, 2, n).astype(np.int32))
    arrs = (gid, val, msk) + tuple(
        jnp.array(rng.integers(0, 99, n).astype(np.int32))
        for _ in range(max(0, n_cols - N_FOLD))
    )

    times = {}
    for name, kw in {
        "exch": dict(do_exch=True, do_fold=False, pipe=False),
        "fold": dict(do_exch=False, do_fold=True, pipe=False),
        "serial": dict(do_exch=True, do_fold=True, pipe=False),
        "pipe": dict(do_exch=True, do_fold=True, pipe=True),
    }.items():
        fn = lambda env, kw=kw: _run(
            tuple(env), n_regions=n_regions, region=region, w_pad=w_pad, **kw
        )
        times[name] = time_pipeline(fn, list(arrs), repeats=3)
        print(f"[overlap] {name}: {times[name]*1e3:.2f} ms", file=sys.stderr)

    overlap_eff = (times["serial"] - times["pipe"]) / max(
        min(times["exch"], times["fold"]), 1e-9
    )
    print(json.dumps({
        "metric": "exchange_fold_overlap_efficiency",
        "value": round(overlap_eff, 4),
        "unit": "fraction",
        "exch_ms": round(times["exch"] * 1e3, 2),
        "fold_ms": round(times["fold"] * 1e3, 2),
        "serial_ms": round(times["serial"] * 1e3, 2),
        "pipe_ms": round(times["pipe"] * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
