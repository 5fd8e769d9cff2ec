"""Device-time measurement for compiled query pipelines.

Defenses against this machine's tunneled TPU backend:

1. Host readback fence — `block_until_ready` returns EARLY through the
   tunnel, so every timed region ends with a 1-element readback (the TPU
   stream is in-order; the readback cannot complete before every queued
   program has).
2. Min-envelope two-depth slope — the tunnel has multi-second slow
   stretches in BOTH directions: a slow baseline dispatch used to make
   the old adjacent-pair slope collapse (observed: reported throughput
   2x ABOVE the physical HBM roofline, i.e. the estimator, not the
   chip). Tunnel noise is strictly additive, so min-over-trials of the
   wall time of a d-dispatch batch is a tight lower envelope of its
   true cost; the slope between the min envelopes at two depths
   (interleaved trials, so conditions match) estimates the steady-state
   per-iteration device time and cannot drop below it.

Measuring INSIDE one dispatch via lax.fori_loop was tried and REJECTED:
XLA hoists the loop-invariant pipeline body, and every dependence-chain
workaround either pays a full input-buffer copy per iteration (a
functional .at[].add on a loop-invariant operand) or gets dead-code-
eliminated down to one element — observed misreads of 2-30x in both
directions. Multi-dispatch envelopes it is.
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


def time_pipeline(
    fn, env, depths=(6, 24), repeats: int = 1, trials: int = None,
    with_spread: bool = False,
):
    """Per-iteration device time of `fn(env)` in seconds.

    Times batches of d1 and d2 fenced dispatches, interleaved for
    `trials` rounds; the estimate is (min T(d2) - min T(d1)) / (d2 - d1).
    Both fixed costs (dispatch setup, the fence's tunnel round-trip) and
    additive tunnel noise cancel in the difference of the min envelopes.
    `repeats` repeats the whole estimate and takes the median; with
    `with_spread=True` returns (median, relative spread across repeats)
    so round artifacts record how noisy the tunnel was."""
    if len(depths) > 2:  # legacy callers passed 3 depths
        depths = (depths[0], depths[-1])
    d1, d2 = depths
    if trials is None:
        # multi-repeat calls are the round-artifact numbers: spend more
        # trials per repeat so both min-envelopes converge (an
        # under-converged shallow envelope inflates the slope-derived
        # throughput — observed as impossible >roofline headlines)
        trials = 8 if repeats > 1 else 4

    def run(k: int) -> None:
        out = None
        for _ in range(k):
            out = fn(env)
        _fence(out)

    run(2)  # compile + warm
    t0 = time.perf_counter()
    run(1)
    per = max(time.perf_counter() - t0, 1e-5)
    # scale depths down for slow pipelines so one batch stays < ~4 s
    scale = min(1.0, 4.0 / (per * d2))
    d1 = max(1, int(d1 * scale))
    d2 = max(d1 + 1, int(d2 * scale))

    estimates = []
    for _ in range(max(1, repeats)):
        lo = [float("inf"), float("inf")]
        for _ in range(max(2, trials)):
            t0 = time.perf_counter()
            run(d1)
            lo[0] = min(lo[0], time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(d2)
            lo[1] = min(lo[1], time.perf_counter() - t0)
        slope = (lo[1] - lo[0]) / (d2 - d1)
        # a negative/degenerate slope means a slow stretch poisoned every
        # d2 trial relative to d1; fall back to the amortized deep batch
        if slope <= 0:
            slope = lo[1] / d2
        estimates.append(slope)
    med = max(statistics.median(estimates), 1e-9)
    if with_spread:
        # tunnel noise is one-sided (additive slow stretches): with
        # enough repeats, drop the single worst estimate before
        # computing the band — a multi-second stretch that poisons every
        # trial of ONE repeat is a property of the tunnel, not the chip.
        # The median itself is computed over ALL repeats (unbiased).
        es = sorted(estimates)
        if len(es) >= 5:
            es = es[:-1]
        spread = (max(es) - min(es)) / med if len(es) > 1 else 0.0
        return med, spread
    return med
