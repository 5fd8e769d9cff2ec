"""ORDER BY <single key> LIMIT k fuses into lax.top_k
(exec/compiler.py _lower_topk); DFTPU_TOPK=0 keeps the full sort.
Both paths must agree — including NULL placement and tie stability."""

import numpy as np
import pytest

import datafusion_tpu as df


def _ctx():
    rng = np.random.default_rng(3)
    n = 5000
    v = rng.random(n).astype(np.float64) * 200 - 100
    a = rng.integers(-1000, 1000, n).astype(np.int64)
    s = np.array([f"s{int(x) % 37:02d}" for x in a], dtype=object)
    nullable = v.copy()
    mask = rng.random(n) < 0.1
    nullable[mask] = np.nan  # from_pydict: NaN → NULL
    ctx = df.ExecutionContext()
    ctx.register_table(
        "t", df.Table.from_pydict({"a": a, "v": v, "s": s, "nv": nullable})
    )
    return ctx


QUERIES = [
    "SELECT a, v FROM t ORDER BY v LIMIT 25",
    "SELECT a, v FROM t ORDER BY v DESC LIMIT 25",
    "SELECT a FROM t ORDER BY a LIMIT 40",
    "SELECT a FROM t ORDER BY a DESC LIMIT 40",
    "SELECT s, a FROM t ORDER BY s LIMIT 15",
    "SELECT a, nv FROM t WHERE a > 500 ORDER BY nv LIMIT 30",
    "SELECT a FROM t WHERE a > 990 ORDER BY a LIMIT 4000",  # k > matches
]


@pytest.mark.parametrize("sql", QUERIES)
def test_topk_matches_full_sort(sql, monkeypatch):
    fused = _ctx().sql(sql).result_str()
    monkeypatch.setenv("DFTPU_TOPK", "0")
    full = _ctx().sql(sql).result_str()
    assert fused == full


def test_topk_tie_stability(monkeypatch):
    # equal keys keep original row order on both paths
    ctx = df.ExecutionContext()
    ctx.register_table(
        "t",
        df.Table.from_pydict(
            {
                "k": np.array([1, 1, 0, 1, 0, 0], np.int64),
                "row": np.arange(6, dtype=np.int64),
            }
        ),
    )
    r = ctx.sql("SELECT k, row FROM t ORDER BY k LIMIT 4")
    assert [row["row"] for row in r.to_pylist()] == [2, 4, 5, 0]


def test_topk_multi_key_wide_falls_back():
    # float secondary key: no static domain, no packed rank — full sort
    ctx = df.ExecutionContext()
    ctx.register_table(
        "t",
        df.Table.from_pydict(
            {
                "k": np.array([1, 0, 1, 0], np.int64),
                "v": np.array([4.0, 3.0, 2.0, 1.0]),
            }
        ),
    )
    out = ctx.sql("EXPLAIN VERBOSE SELECT k, v FROM t ORDER BY k, v LIMIT 3").result_str()
    assert "fused lax.top_k" not in out
    r = ctx.sql("SELECT k, v FROM t ORDER BY k, v LIMIT 3")
    assert [tuple(row.values()) for row in r.to_pylist()] == [
        (0, 1.0),
        (0, 3.0),
        (1, 2.0),
    ]


MULTI_QUERIES = [
    # int keys: probed scanned range; s: dictionary codes (sorted vocab)
    "SELECT a, s FROM t ORDER BY s, a LIMIT 25",
    "SELECT a, s FROM t ORDER BY s DESC, a LIMIT 25",
    "SELECT a, s FROM t ORDER BY s, a DESC LIMIT 25",
    "SELECT a, s, v FROM t ORDER BY s, a, v DESC LIMIT 25",  # f64 last: fallback
    "SELECT a, s FROM t WHERE a > 0 ORDER BY a DESC, s LIMIT 30",
    "SELECT a, ns FROM t ORDER BY ns, a LIMIT 60",  # NULL dict key placement
    "SELECT a, ns FROM t ORDER BY ns DESC, a DESC LIMIT 60",
]


@pytest.mark.parametrize("sql", MULTI_QUERIES)
def test_topk_multi_key_packed_matches_full_sort(sql, monkeypatch):
    """ORDER BY k1, k2[, k3] LIMIT n over small-domain keys packs into
    one lexicographic rank + lax.top_k (exec/compiler.py _packed_rank);
    parity with the full multi-operand sort, incl. NULLS LAST and ties."""

    def ctx():
        rng = np.random.default_rng(7)
        n = 4000
        a = rng.integers(-50, 50, n).astype(np.int64)
        v = rng.random(n).astype(np.float64)
        s = np.array([f"g{int(x) % 7}" for x in a], dtype=object)
        ns = s.copy()
        ns[rng.random(n) < 0.15] = None
        c = df.ExecutionContext()
        c.register_table(
            "t", df.Table.from_pydict({"a": a, "v": v, "s": s, "ns": ns})
        )
        return c

    fused = ctx().sql(sql).result_str()
    monkeypatch.setenv("DFTPU_TOPK", "0")
    full = ctx().sql(sql).result_str()
    assert fused == full


def test_topk_multi_key_packed_is_fused():
    rng = np.random.default_rng(5)
    n = 512
    ctx = df.ExecutionContext()
    ctx.register_table(
        "t",
        df.Table.from_pydict(
            {
                "a": rng.integers(0, 100, n).astype(np.int32),
                "s": np.array(
                    [f"x{i % 5}" for i in rng.integers(0, 5, n)], dtype=object
                ),
            }
        ),
    )
    out = ctx.sql(
        "EXPLAIN VERBOSE SELECT a, s FROM t ORDER BY s, a DESC LIMIT 9"
    ).result_str()
    assert "fused lax.top_k (k=9, 2 keys" in out


def test_topk_multi_key_tie_stability():
    # rows equal on ALL packed keys keep original order (top_k ties by
    # lowest index — same as the full sort's iota tie-break)
    ctx = df.ExecutionContext()
    ctx.register_table(
        "t",
        df.Table.from_pydict(
            {
                "k1": np.array([1, 1, 0, 1, 0, 0], np.int32),
                "k2": np.array([2, 2, 9, 2, 9, 9], np.int32),
                "row": np.arange(6, dtype=np.int64),
            }
        ),
    )
    r = ctx.sql("SELECT row FROM t ORDER BY k1, k2 LIMIT 5")
    assert [row["row"] for row in r.to_pylist()] == [2, 4, 5, 0, 1]


def test_topk_distributed_matches_single():
    from datafusion_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    n = 8192
    data = {
        "a": rng.integers(-500, 500, n).astype(np.int64),
        "v": rng.random(n).astype(np.float64),
    }
    sqls = [
        "SELECT a, v FROM t ORDER BY v LIMIT 17",
        "SELECT a, v FROM t ORDER BY v DESC LIMIT 17",
        "SELECT a FROM t WHERE v > 0.9 ORDER BY a LIMIT 2000",
    ]
    for sql in sqls:
        ctx1 = df.ExecutionContext()
        ctx1.register_table("t", df.Table.from_pydict(dict(data)))
        ctx2 = df.ExecutionContext(mesh=make_mesh())
        ctx2.register_table("t", df.Table.from_pydict(dict(data)))
        assert ctx1.sql(sql).result_str() == ctx2.sql(sql).result_str(), sql
