"""Device-time measurement for compiled query pipelines.

Two defenses against this machine's tunneled TPU backend:

1. Host readback fence — `block_until_ready` returns EARLY through the
   tunnel, so every timed region ends with a 1-element readback (the TPU
   stream is in-order; the readback cannot complete before every queued
   program has).
2. Depth sweep — each dispatch costs ~0.5-0.9 ms of host+tunnel overhead,
   and past a modest number of in-flight executions the tunnel
   backpressures. For sub-millisecond pipelines a deep dispatch-per-
   iteration slope measures the HOST, not the chip (observed: the c1
   filter+project pipeline reads 40.6 Grows/s at depth 64 but 60 Grows/s
   at depth 12, matching standalone XLA kernels of the same shape).
   Dispatch overhead only ever ADDS to the slope, so the per-iteration
   device time is estimated as the MINIMUM median slope over several
   queue depths.

Measuring INSIDE one dispatch via lax.fori_loop was tried and REJECTED:
XLA hoists the loop-invariant pipeline body, and every dependence-chain
workaround either pays a full input-buffer copy per iteration (a
functional .at[].add on a loop-invariant operand) or gets dead-code-
eliminated down to one element — observed misreads of 2-30x in both
directions. Multi-dispatch slopes it is.
"""

from __future__ import annotations

import statistics
import time

import numpy as np

import jax


def _fence(out) -> None:
    for leaf in jax.tree_util.tree_leaves(out):
        if leaf is not None and hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
            return
    raise ValueError("pipeline returned no arrays")


def time_pipeline(fn, env, depths=(6, 12, 24), repeats: int = 1) -> float:
    """Median per-iteration device time of `fn(env)` in seconds: slope of
    (1+k)-vs-1 dispatch batches, minimized over queue depths, fenced by a
    1-element readback.

    `repeats` re-runs the whole sweep and takes the MEDIAN of the
    per-sweep estimates — the tunnel to this machine's chip has
    multi-second slow stretches (which inflate a sweep) but timing noise
    on the 1-dispatch baseline can also DEFLATE a slope below the true
    device time, so min-of-sweeps over-reads; the median is robust to
    one bad sweep in either direction."""

    def run(k: int) -> None:
        out = None
        for _ in range(k):
            out = fn(env)
        _fence(out)

    run(2)  # compile + warm
    # scale depths down for slow pipelines so one estimate stays < ~4 s
    t0 = time.perf_counter()
    run(1)
    per = max(time.perf_counter() - t0, 1e-5)
    sweeps = []
    for _ in range(max(1, repeats)):
        best = None
        for depth in depths:
            d = max(2, min(depth, int(4.0 / per) or 2))
            slopes = []
            for _ in range(3):
                t0 = time.perf_counter()
                run(1)
                t1 = time.perf_counter()
                run(1 + d)
                t2 = time.perf_counter()
                slopes.append(((t2 - t1) - (t1 - t0)) / d)
            s = statistics.median(slopes)
            best = s if best is None else min(best, s)
            if d < depth:  # depths collapsed for a slow pipeline: one sweep
                break
        sweeps.append(best)
    return max(statistics.median(sweeps), 1e-9)
