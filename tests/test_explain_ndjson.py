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
