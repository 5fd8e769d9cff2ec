"""Bigdense radix-partition GROUP BY (sort-free past the dense window).

The radix-partition kernel (ops/pallas/partition.py) physically
partitions rows into 2048-slot window buckets with an MXU one-hot
permutation + chunked DMA appends; the segmented-reduce kernel then
accumulates in windowed mode with full-table VMEM accumulators — no
lax.sort anywhere (VERDICT r2 next #3). Parity is checked against the
packed sort path (DFTPU_BIGDENSE=0) in pallas interpret mode.
"""

import os

import numpy as np
import pytest

import datafusion_tpu as df


@pytest.fixture(autouse=True)
def _env(monkeypatch):
    monkeypatch.setenv("DFTPU_PALLAS", "1")


def _data(n=6 * 1024, kdom=5000, seed=5):
    rng = np.random.default_rng(seed)
    nv = (rng.random(n) * 100 - 50).astype(np.float32)
    nv[rng.random(n) < 0.2] = np.nan
    return {
        "k": rng.integers(0, kdom, n).astype(np.int32),
        "k2": rng.integers(0, 3, n).astype(np.int32),
        "v": (rng.random(n) * 10).astype(np.float32),
        "iv": rng.integers(-(2**30), 2**30, n).astype(np.int32),
        "nv": nv,
        "s": np.array([f"g{i}" for i in rng.integers(0, 6, n)], dtype=object),
    }


def _run(sql, data, bigdense, expect_engaged=None):
    env = dict(os.environ)
    # "force" lifts the min/max shape gate (the default keeps min/max
    # shapes on the packed sort — measured faster on chip, PERFLOG r3)
    os.environ["DFTPU_BIGDENSE"] = "force" if bigdense else "0"
    try:
        ctx = df.ExecutionContext()
        ctx.register_table("t", df.Table.from_pydict(dict(data)))
        if expect_engaged is not None:
            txt = ctx.sql("EXPLAIN VERBOSE " + sql).raw_text or ""
            if expect_engaged:
                assert "bigdense radix-partition" in txt, txt
            else:
                assert "bigdense radix-partition" not in txt, txt
        return ctx.sql(sql).result_str()
    finally:
        os.environ.clear()
        os.environ.update(env)


def _assert_match(a, b, rel=1e-3):
    la, lb = a.splitlines(), b.splitlines()
    assert len(la) == len(lb), (len(la), len(lb))
    for ra, rb in zip(la, lb):
        if ra == rb:
            continue
        for x, y in zip(ra.split("\t"), rb.split("\t")):
            if x == y:
                continue
            fx, fy = float(x), float(y)  # raises -> real mismatch
            assert abs(fx - fy) <= rel * (1 + abs(fy)), (ra, rb)


QUERIES = [
    # the kitchen sink: nullable args, i32 min/max (16-bit split ride),
    # shared args between ops, NaN data
    "SELECT k, SUM(v), COUNT(v), MIN(iv), MAX(iv), AVG(v), COUNT(nv), "
    "SUM(nv), MIN(nv), MAX(nv), MIN(v) FROM t GROUP BY k ORDER BY k",
    # filtered input: unselected rows must route to the dropped slot
    "SELECT k, COUNT(v), MAX(v) FROM t WHERE v > 5 GROUP BY k ORDER BY k",
    # multi-key: dict x probed int packs into one gid
    "SELECT s, k, COUNT(v), SUM(v) FROM t WHERE k < 4000 GROUP BY s, k "
    "ORDER BY s, k",
    # Utf8 min/max ride as order-preserving dict codes
    "SELECT k, MIN(s), MAX(s) FROM t GROUP BY k ORDER BY k LIMIT 800",
]


@pytest.mark.parametrize("sql", QUERIES)
def test_bigdense_matches_packed(sql):
    data = _data()
    a = _run(sql, data, bigdense=True)
    b = _run(sql, data, bigdense=False)
    _assert_match(a, b)


def test_bigdense_engages_past_dense_window():
    data = _data()
    _run(
        "SELECT k, COUNT(v) FROM t GROUP BY k ORDER BY k LIMIT 3",
        data,
        bigdense=True,
        expect_engaged=True,
    )


def test_bigdense_declines_small_domains_to_dense():
    # dense window still owns small domains (it is one kernel pass)
    data = _data(kdom=1000)
    env = dict(os.environ)
    os.environ["DFTPU_BIGDENSE"] = "1"
    try:
        ctx = df.ExecutionContext()
        ctx.register_table("t", df.Table.from_pydict(dict(data)))
        txt = ctx.sql(
            "EXPLAIN VERBOSE SELECT k, COUNT(v) FROM t GROUP BY k LIMIT 3"
        ).raw_text or ""
        assert "dense sort-free group-by" in txt, txt
    finally:
        os.environ.clear()
        os.environ.update(env)


def test_bigdense_median_falls_back():
    # holistic aggregates need the sorted path
    data = _data()
    a = _run(
        "SELECT k, MEDIAN(v) FROM t GROUP BY k ORDER BY k LIMIT 50",
        data,
        bigdense=True,
        expect_engaged=False,
    )
    b = _run(
        "SELECT k, MEDIAN(v) FROM t GROUP BY k ORDER BY k LIMIT 50",
        data,
        bigdense=False,
    )
    _assert_match(a, b)


def test_bigdense_default_gates_minmax_shapes():
    # default (=1): sum/count/avg shapes engage; min/max shapes stay on
    # the packed co-sort (the windowed VPU cell reduce loses to the
    # sort-amortized min/max on chip — PERFLOG r3)
    data = _data()
    env = dict(os.environ)
    os.environ["DFTPU_BIGDENSE"] = "1"
    try:
        ctx = df.ExecutionContext()
        ctx.register_table("t", df.Table.from_pydict(dict(data)))
        t1 = ctx.sql(
            "EXPLAIN VERBOSE SELECT k, SUM(v), COUNT(v) FROM t GROUP BY k LIMIT 3"
        ).raw_text or ""
        assert "bigdense radix-partition" in t1, t1
        t2 = ctx.sql(
            "EXPLAIN VERBOSE SELECT k, MIN(v) FROM t GROUP BY k LIMIT 3"
        ).raw_text or ""
        assert "bigdense" not in t2 and "packed-gid co-sort" in t2, t2
    finally:
        os.environ.clear()
        os.environ.update(env)
