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
