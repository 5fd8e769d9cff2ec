"""Seeded random-query parity fuzz: single-chip vs distributed vs forced
strategies must agree on every generated query.

Queries draw from the full supported surface (filters, arithmetic, CASE,
GROUP BY with mixed aggregates, HAVING, joins, ORDER BY/LIMIT, UNION).
Sorted-row comparison; float cells rounded (reduction trees differ by
design across paths)."""

import numpy as np
import pytest

import datafusion_tpu as df
from datafusion_tpu.parallel.mesh import make_mesh


def _tables(rng):
    n = int(rng.integers(800, 3000))
    fact = {
        "k": rng.integers(0, 40, n).astype(np.int32),
        "g": rng.integers(-5, 5, n).astype(np.int64),
        "v": (rng.random(n) * 200 - 100).round(3),
        "s": np.array(
            [f"c{int(x) % 7}" for x in rng.integers(0, 100, n)], dtype=object
        ),
    }
    m = int(rng.integers(20, 60))
    dim = {
        "pk": np.arange(m, dtype=np.int32),
        "w": (rng.random(m) * 10).round(3),
    }
    return fact, dim


PREDICATES = [
    "v > 0",
    "v BETWEEN -50 AND 50",
    "k IN (1, 3, 5, 7)",
    "s = 'c3' OR v < -80",
    "NOT (g = 0) AND v > -90",
    "CASE WHEN g > 0 THEN TRUE ELSE v > 0 END",
]

QUERIES = [
    "SELECT k, v, v * 2 + 1 FROM fact WHERE {p}",
    "SELECT g, MIN(v), MAX(v), COUNT(v), SUM(v), AVG(v) FROM fact WHERE {p} GROUP BY g",
    "SELECT s, COUNT(v), MIN(k) FROM fact WHERE {p} GROUP BY s HAVING COUNT(v) > 3",
    "SELECT k, CASE WHEN v > 0 THEN 1 ELSE 0 END AS pos FROM fact WHERE {p} ORDER BY k, pos LIMIT 50",
    "SELECT fact.k, SUM(dim.w) FROM fact JOIN dim ON fact.k = dim.pk WHERE {p} GROUP BY fact.k",
    "SELECT fact.g, COUNT(fact.v) FROM fact LEFT JOIN dim ON fact.k = dim.pk WHERE {p} GROUP BY fact.g",
    "SELECT v FROM fact WHERE {p} ORDER BY v DESC LIMIT 20",
    "SELECT g, COUNT(DISTINCT k) FROM fact WHERE {p} GROUP BY g",
    "SELECT k FROM fact WHERE {p} UNION SELECT pk FROM dim WHERE pk < 10",
    "SELECT COALESCE(NULLIF(g, 0), -99) AS c, COUNT(v) FROM fact WHERE {p} GROUP BY c",
    # newer surface: FULL join, subqueries, window + string functions
    "SELECT fact.k, dim.w FROM fact FULL JOIN dim ON fact.k = dim.pk WHERE {p}",
    "SELECT k, v FROM fact WHERE k IN (SELECT pk FROM dim WHERE w > 3) AND ({p})",
    "SELECT k FROM fact WHERE NOT EXISTS (SELECT 1 FROM dim WHERE dim.pk = fact.k) AND ({p})",
    "SELECT k, v - (SELECT AVG(v) FROM fact) AS d FROM fact WHERE {p} ORDER BY k, d LIMIT 40",
    "SELECT k, (SELECT MAX(w) FROM dim WHERE dim.pk = fact.k) AS mw FROM fact WHERE {p} ORDER BY k, mw LIMIT 40",
    "SELECT g, k, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, k) AS rn FROM fact WHERE {p} ORDER BY g, k, rn LIMIT 60",
    # newest surface: CTEs, set ops (incl. ALL), grouping sets, frames,
    # stddev, INTERVAL/date-free paths, string CASE, IS DISTINCT FROM
    "WITH hot AS (SELECT k, v FROM fact WHERE {p}) SELECT k, COUNT(v) FROM hot GROUP BY k",
    "SELECT k FROM fact WHERE {p} INTERSECT SELECT pk FROM dim",
    "SELECT k FROM fact WHERE {p} EXCEPT ALL SELECT pk FROM dim WHERE pk < 20",
    "SELECT g, s, SUM(v) FROM fact WHERE {p} GROUP BY ROLLUP(g, s)",
    "SELECT g, k, SUM(v) OVER (PARTITION BY g ORDER BY k, v ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS w FROM fact WHERE {p} ORDER BY g, k, w LIMIT 60",
    "SELECT g, STDDEV_POP(v), VAR_POP(v) FROM fact WHERE {p} GROUP BY g",
    "SELECT CASE WHEN v > 0 THEN 'pos' WHEN v < -50 THEN s ELSE 'neg' END AS b, COUNT(v) FROM fact WHERE {p} GROUP BY b",
    "SELECT k FROM fact WHERE v IS DISTINCT FROM 0 AND ({p}) ORDER BY k LIMIT 30 OFFSET 5",
    "SELECT s, g, RANK() OVER (ORDER BY SUM(v) DESC) FROM fact WHERE {p} GROUP BY s, g",
    "SELECT g, SUM(v) OVER (PARTITION BY g) AS sv, COUNT(*) OVER (PARTITION BY g) AS c FROM fact WHERE {p} ORDER BY g, sv LIMIT 60",
    "SELECT UPPER(s) AS u, COUNT(v) FROM fact WHERE {p} GROUP BY u",
    "SELECT s, LENGTH(s) FROM fact WHERE ({p}) AND SUBSTR(s, 1, 1) = 'c' ORDER BY s, 2 LIMIT 30",
]


def _run(sql, fact, dim, mesh=None, env=None, monkeypatch=None):
    if env:
        for kk, vv in env.items():
            monkeypatch.setenv(kk, vv)
    try:
        ctx = df.ExecutionContext(mesh=mesh)
        ctx.register_table("fact", df.Table.from_pydict(dict(fact)))
        ctx.register_table("dim", df.Table.from_pydict(dict(dim)))
        rows = ctx.sql(sql).to_pylist()
    finally:
        if env:
            for kk in env:
                monkeypatch.delenv(kk, raising=False)
    out = []
    for row in rows:
        cells = []
        for v in row.values():
            if isinstance(v, float) or (
                hasattr(v, "dtype") and np.issubdtype(np.asarray(v).dtype, np.floating)
            ):
                f = float(v)
                # non-finite floats canonicalize to strings: nan != nan
                # would make otherwise-identical rows compare unequal
                cells.append(repr(f) if not np.isfinite(f) else round(f, 4))
            elif v is None:
                cells.append(None)
            else:
                cells.append(v if isinstance(v, str) else int(v))
        out.append(tuple(cells))
    return sorted(out, key=repr)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_single_vs_distributed_vs_strategies(seed, monkeypatch):
    rng = np.random.default_rng(seed)
    fact, dim = _tables(rng)
    mesh = make_mesh()
    for qt in QUERIES:
        sql = qt.format(p=PREDICATES[int(rng.integers(0, len(PREDICATES)))])
        base = _run(sql, fact, dim)
        dist = _run(sql, fact, dim, mesh=mesh)
        assert base == dist, f"single vs distributed: {sql}"
        forced = _run(
            sql,
            fact,
            dim,
            env={"DFTPU_LOCAL_JOIN": "expand", "DFTPU_TOPK": "0"},
            monkeypatch=monkeypatch,
        )
        assert base == forced, f"default vs forced strategies: {sql}"


# ---------------------------------------------------------------------------
# Dark-corner fuzz (VERDICT r4 #2): NULLs, NaN/±inf, empty filter
# results. The IEEE cond paths (aggregate.py ieee_sum_cond) and every
# validity consumer live exactly in this data class; the reference had
# no property testing at all (SURVEY §4).
# ---------------------------------------------------------------------------


def _tables_dark(rng):
    """Null-bearing, non-finite-bearing versions of the fuzz tables."""
    n = int(rng.integers(600, 2000))
    v = (rng.random(n) * 200 - 100).round(3)
    # ~4% NaN, ~3% +inf, ~3% -inf among the VALID values
    r = rng.random(n)
    v[r < 0.04] = np.nan
    v[(r >= 0.04) & (r < 0.07)] = np.inf
    v[(r >= 0.07) & (r < 0.10)] = -np.inf
    v_list = [None if x < 0.10 else float(y) for x, y in zip(rng.random(n), v)]
    k_list = [
        None if x < 0.05 else int(y)
        for x, y in zip(rng.random(n), rng.integers(0, 40, n))
    ]
    s_list = [
        None if x < 0.08 else f"c{int(y) % 7}"
        for x, y in zip(rng.random(n), rng.integers(0, 100, n))
    ]
    fact = {
        "k": k_list,
        "g": rng.integers(-5, 5, n).astype(np.int64),
        "v": v_list,
        "s": s_list,
    }
    m = int(rng.integers(20, 60))
    dim = {
        "pk": np.arange(m, dtype=np.int32),
        "w": [None if i % 9 == 4 else round(float(x) * 10, 3) for i, x in enumerate(rng.random(m))],
    }
    return fact, dim


DARK_PREDICATES = [
    "v IS NOT NULL",
    "v IS NULL OR k > 20",
    "v > 0",                      # NULL/NaN predicate rows drop
    "k IN (1, 3, 5, 7)",
    "g > 100",                    # always false: empty filter result
    "s IS NULL OR s = 'c3'",
]


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_dark_corners(seed, monkeypatch):
    rng = np.random.default_rng(1000 + seed)
    fact, dim = _tables_dark(rng)
    mesh = make_mesh()
    for qt in QUERIES:
        sql = qt.format(p=DARK_PREDICATES[int(rng.integers(0, len(DARK_PREDICATES)))])
        base = _run(sql, fact, dim)
        dist = _run(sql, fact, dim, mesh=mesh)
        assert base == dist, f"single vs distributed: {sql}"
        forced = _run(
            sql,
            fact,
            dim,
            env={"DFTPU_LOCAL_JOIN": "expand", "DFTPU_TOPK": "0"},
            monkeypatch=monkeypatch,
        )
        assert base == forced, f"default vs forced strategies: {sql}"


def test_fuzz_zero_row_tables(monkeypatch):
    """Every query shape over 0-row inputs must agree (and not crash)."""
    fact = {
        "k": np.zeros(0, np.int32),
        "g": np.zeros(0, np.int64),
        "v": np.zeros(0, np.float64),
        "s": np.array([], dtype=object),
    }
    dim = {"pk": np.zeros(0, np.int32), "w": np.zeros(0, np.float64)}
    mesh = make_mesh()
    rng = np.random.default_rng(7)
    for qt in QUERIES:
        sql = qt.format(p=PREDICATES[int(rng.integers(0, len(PREDICATES)))])
        base = _run(sql, fact, dim)
        dist = _run(sql, fact, dim, mesh=mesh)
        assert base == dist, f"single vs distributed on 0 rows: {sql}"
