"""Validate the TPU fast paths against the XLA reference paths ON THE
REAL CHIP. The pytest suite runs on CPU (interpret-mode pallas), which
cannot see hardware-only effects — this caught the MXU default-precision
bug where grouped SUM was ~0.4% off (bf16 value rounding) while every
interpret-mode test passed.

Usage: python scripts/validate_tpu.py  (exits nonzero on mismatch)
"""

import os
import sys

os.environ.setdefault("DFTPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        print(f"not on TPU (platform={platform}); nothing to validate")
        return 0

    import datafusion_tpu as df

    n = 1 << 17
    rng = np.random.default_rng(7)
    data = {
        "k": rng.integers(0, 5000, n).astype(np.int32),
        "lat": (rng.random(n, dtype=np.float32) * 40 + 30),
        "lng": (rng.random(n, dtype=np.float32) * 360 - 180),
    }
    dim = {
        "pk": np.arange(4096, dtype=np.int32),
        "w": rng.random(4096, dtype=np.float32),
    }

    queries = [
        "SELECT k, MIN(lat), MAX(lat), SUM(lng), COUNT(lat), AVG(lat) "
        "FROM t WHERE lng > -100 GROUP BY k",
        "SELECT k, lat FROM t WHERE lat > 50 ORDER BY lat LIMIT 1000",
        "SELECT t.k, dim.w FROM t JOIN dim ON t.k = dim.pk WHERE t.lat > 60",
        "SELECT COUNT(*), SUM(lat), MIN(lng) FROM t",
        # fused pallas scan+filter+project stage: multiple computed
        # expressions, CASE, casts, and a nullable input column
        "SELECT k, lat + lng, CASE WHEN lat > 50 THEN lat ELSE lng END, "
        "CAST(lat AS INT) FROM t WHERE lng < 0 AND lat > 40",
        "SELECT k, nv * 2 FROM t WHERE nv IS NOT NULL AND lat > 55",
        "SELECT k, nv + lat FROM t WHERE lat > 65",
    ]

    from datafusion_tpu.schema import Field, Schema
    from datafusion_tpu.types import DataType

    t_schema = Schema(
        [
            Field("k", DataType.Int32),
            Field("lat", DataType.Float32),
            Field("lng", DataType.Float32),
            Field("nv", DataType.Float32, True),
        ]
    )
    nv = rng.random(n, dtype=np.float32) * 10
    nv_valid = rng.random(n) > 0.2

    def run(knobs: dict) -> list:
        for k, v in knobs.items():
            os.environ[k] = v
        try:
            ctx = df.ExecutionContext()
            ctx.register_table(
                "t",
                df.Table.from_arrays(
                    t_schema,
                    [data["k"], data["lat"], data["lng"], nv],
                    validity=[None, None, None, nv_valid],
                ),
            )
            ctx.register_table("dim", df.Table.from_pydict(dict(dim)))
            return [ctx.sql(q).to_pylist() for q in queries]
        finally:
            for k in knobs:
                os.environ.pop(k, None)

    fast = run({})  # default: pallas + compact join
    ref = run({"DFTPU_PALLAS": "0", "DFTPU_LOCAL_JOIN": "expand"})

    # ragged-shuffle kernel, Mosaic-compiled on the real chip (the
    # single-device degenerate: SMEM sizes matrix + local-DMA region
    # path; the RDMA branches only exist on multi-chip hardware and are
    # interpret-validated by tests/test_ragged_shuffle.py)
    ragged_fail = _check_ragged_local()

    failures = ragged_fail
    for qi, (a, b) in enumerate(zip(fast, ref)):
        if len(a) != len(b):
            print(f"query {qi}: row count {len(a)} vs {len(b)} MISMATCH")
            failures += 1
            continue
        cols = list(a[0].keys()) if a else []
        for c in cols:
            x = np.asarray(
                [np.nan if row[c] is None else row[c] for row in a], dtype=np.float64
            )
            y = np.asarray(
                [np.nan if row[c] is None else row[c] for row in b], dtype=np.float64
            )
            ok = np.allclose(x, y, rtol=1e-5, atol=1e-4, equal_nan=True)
            if not ok:
                print(
                    f"query {qi} col {c}: MISMATCH "
                    f"max|d|={np.max(np.abs(x - y)):.3e}"
                )
                failures += 1
        print(f"query {qi}: {'OK' if failures == 0 else 'checked'} ({len(a)} rows)")
    if failures:
        print(f"{failures} mismatches")
        return 1
    print("ALL OK")
    return 0


def _check_ragged_local() -> int:
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from datafusion_tpu.parallel import shuffle as sh
    from datafusion_tpu.parallel.mesh import AXIS, make_mesh

    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    rng = np.random.default_rng(11)
    n = n_dev * 4096
    data_f = rng.random(n).astype(np.float32) * 100
    sel = rng.random(n) < 0.7
    dst = rng.integers(0, n_dev, n).astype(np.int32)

    def body(x, s, d):
        cols, new_sel, mx = sh.repartition([(x, None)], d, s, n_dev, 8192)
        return cols[0][0], new_sel, mx[None]

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS),) * 3,
        out_specs=(P(AXIS),) * 3,
        check_vma=False,
    )
    outs = {}
    for strat in ("fixed", "ragged"):
        os.environ["DFTPU_SHUFFLE"] = strat
        try:
            d, s, _ = jax.jit(f)(jnp.array(data_f), jnp.array(sel), jnp.array(dst))
            outs[strat] = np.sort(np.asarray(d)[np.asarray(s)])
        finally:
            os.environ.pop("DFTPU_SHUFFLE", None)
    ok = np.array_equal(outs["fixed"], outs["ragged"])
    print(f"ragged shuffle (n_dev={n_dev}, compiled): {'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
