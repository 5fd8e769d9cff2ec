"""EXPLAIN, NDJSON source, and query-stats tests."""

from datafusion_tpu import DataType as D, ExecutionContext, Field, Schema


def test_explain(data_dir):
    ctx = ExecutionContext()
    ctx.register_csv(
        "t1",
        str(data_dir / "aggregate_test_1.csv"),
        Schema([Field("a", D.Int32, False), Field("b", D.Float64, False)]),
    )
    out = ctx.sql("EXPLAIN SELECT a, MIN(b) FROM t1 WHERE b > 1 GROUP BY a").result_str()
    assert out == (
        "Aggregate: groupBy=[[#0]], aggr=[[MIN(#1)]]\n"
        "  Selection: #1 Gt CAST(Int64(1) AS Float64)\n"
        "    TableScan: t1 projection=None\n"
    )


def test_ndjson_source(data_dir):
    # reference parsed STORED AS NDJSON but had no reader (dfparser.rs:33)
    ctx = ExecutionContext()
    ctx.sql(
        "CREATE EXTERNAL TABLE j (a INT NOT NULL, b VARCHAR(100) NOT NULL, "
        f"c DOUBLE NOT NULL) STORED AS NDJSON LOCATION '{data_dir}/example1.ndjson'"
    )
    out = ctx.sql("SELECT a, b, c FROM j ORDER BY a").result_str()
    assert out == (
        '1\t"this is a string"\t12.34\n'
        '2\t"this is also a string"\t43.21\n'
        '3\t"is this a string too?"\t0.0\n'
    )


def test_last_stats(data_dir):
    ctx = ExecutionContext()
    ctx.register_csv(
        "t1",
        str(data_dir / "aggregate_test_1.csv"),
        Schema([Field("a", D.Int32, False), Field("b", D.Float64, False)]),
    )
    ctx.sql("SELECT a FROM t1")
    stats = ctx.last_stats
    assert stats["rows"] == 7
    assert all(stats[k] >= 0 for k in ("parse_s", "plan_s", "execute_s"))


def test_parquet_source(data_dir):
    # reference: parquet crate declared, STORED AS PARQUET parsed, no
    # reader ever written (SURVEY.md §2) — real here
    import pytest

    pd = pytest.importorskip("pandas")
    ctx = ExecutionContext()
    ctx.sql(
        "CREATE EXTERNAL TABLE p STORED AS PARQUET "
        f"LOCATION '{data_dir}/alltypes_plain.parquet'"
    )
    out = ctx.sql(
        "SELECT id, bool_col, int_col, double_col FROM p ORDER BY id LIMIT 3"
    ).result_str()
    assert out == "0\ttrue\t0\t0.0\n1\tfalse\t1\t10.1\n2\ttrue\t0\t0.0\n"
    agg = ctx.sql("SELECT COUNT(*), MAX(bigint_col) FROM p").result_str()
    assert agg == "8\t10\n"


def test_parquet_with_declared_schema(data_dir):
    import pytest

    pytest.importorskip("pandas")
    ctx = ExecutionContext()
    ctx.sql(
        "CREATE EXTERNAL TABLE p2 (id INT NOT NULL, string_col VARCHAR(10) NOT NULL) "
        f"STORED AS PARQUET LOCATION '{data_dir}/alltypes_plain.parquet'"
    )
    out = ctx.sql("SELECT id, string_col FROM p2 ORDER BY id LIMIT 2").result_str()
    assert out == '0\t"0"\n1\t"1"\n'


def test_explain_verbose_physical_notes(data_dir):
    import numpy as np

    import datafusion_tpu as df

    ctx = df.ExecutionContext()
    ctx.register_table(
        "p",
        df.Table.from_pydict(
            {
                "k": np.arange(100, dtype=np.int32),
                "v": np.linspace(0, 1, 100).astype(np.float32),
            }
        ),
    )
    ctx.register_table(
        "d",
        df.Table.from_pydict(
            {"k": np.arange(10, dtype=np.int32), "w": np.ones(10, np.float32)}
        ),
    )
    out = ctx.sql(
        "EXPLAIN VERBOSE SELECT p.k, MAX(d.w) FROM p JOIN d ON p.k = d.k "
        "GROUP BY p.k ORDER BY k LIMIT 3"
    ).result_str()
    # arange build keys: the dense direct-index strategy wins (r2)
    assert "physical: join: direct" in out
    # probed int[0,99] domain: the packed-gid single-key co-sort (r2)
    assert "physical: aggregate: packed-gid co-sort" in out
    assert "physical: sort+limit: fused lax.top_k (k=3" in out
    # plain EXPLAIN stays logical-only
    plain = ctx.sql(
        "EXPLAIN SELECT p.k FROM p ORDER BY k LIMIT 3"
    ).result_str()
    assert "physical:" not in plain


def test_parquet_string_ingest_vectorized(tmp_path):
    # r4 (VERDICT r3 next #8): string columns dictionary-encode in Arrow
    # C++ — only the vocab crosses into Python. Parity between the
    # pyarrow path and the pandas fallback on a dictionary-heavy file.
    import numpy as np
    import pytest

    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    import jax

    from datafusion_tpu.columnar.parquet import (
        _read_parquet_pandas,
        read_parquet,
    )

    rng = np.random.default_rng(3)
    n = 20_000
    t = pa.table(
        {
            "s": pa.array([f"name_{i:04d}" for i in rng.integers(0, 700, n)]),
            "v": pa.array(rng.random(n)),
            "i": pa.array(rng.integers(0, 1000, n)),
        }
    )
    p = str(tmp_path / "strings.parquet")
    pq.write_table(t, p)
    ta = read_parquet(p)
    tb = _read_parquet_pandas(p)
    assert ta.schema.to_string() == tb.schema.to_string()
    ca, cb = ta.columns[0], tb.columns[0]
    da = np.asarray(jax.device_get(ca.data))[:n]
    db = np.asarray(jax.device_get(cb.data))[:n]
    va = np.asarray(ca.dictionary, dtype=object)
    vb = np.asarray(cb.dictionary, dtype=object)
    assert (va[da] == vb[db]).all()
    # order-preserving dictionary: codes sort like the strings
    assert list(va) == sorted(va)
