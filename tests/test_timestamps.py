"""TIMESTAMP type: seconds since epoch on device (beyond the reference,
whose type set had no temporal types at all)."""

import datetime

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext, Table
from datafusion_tpu.errors import PlanError


def make_ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "e",
        Table.from_pydict(
            {
                "k": np.array([1, 2, 3], np.int32),
                "ts": np.array(
                    [
                        "2021-03-15T08:30:05",
                        "2022-07-01T23:59:59",
                        "2021-03-15T10:00:00",
                    ],
                    "datetime64[s]",
                ),
            }
        ),
    )
    return ctx


def test_order_and_compare():
    ctx = make_ctx()
    assert (
        ctx.sql("SELECT k, ts FROM e ORDER BY ts").result_str()
        == "1\t2021-03-15 08:30:05\n3\t2021-03-15 10:00:00\n2\t2022-07-01 23:59:59\n"
    )
    assert (
        ctx.sql(
            "SELECT k FROM e WHERE ts > TIMESTAMP '2021-03-15 09:00:00' ORDER BY k"
        ).result_str()
        == "2\n3\n"
    )
    # bare-date TIMESTAMP literal = midnight
    assert (
        ctx.sql("SELECT k FROM e WHERE ts = TIMESTAMP '2021-03-15'").result_str()
        == ""
    )


def test_extract_fields():
    ctx = make_ctx()
    assert (
        ctx.sql(
            "SELECT k, EXTRACT(HOUR FROM ts), EXTRACT(MINUTE FROM ts), "
            "EXTRACT(SECOND FROM ts) FROM e ORDER BY k"
        ).result_str()
        == "1\t8\t30\t5\n2\t23\t59\t59\n3\t10\t0\t0\n"
    )
    assert (
        ctx.sql("SELECT k, YEAR(ts), MONTH(ts), DAY(ts) FROM e ORDER BY k").result_str()
        == "1\t2021\t3\t15\n2\t2022\t7\t1\n3\t2021\t3\t15\n"
    )
    with pytest.raises(PlanError):
        ctx.sql("SELECT HOUR(k) FROM e")  # HOUR needs a Timestamp


def test_date_timestamp_coercion_and_casts():
    ctx = make_ctx()
    # Date32 coerces to Timestamp (midnight) in comparisons
    assert (
        ctx.sql("SELECT k FROM e WHERE ts > DATE '2021-06-01' ORDER BY k").result_str()
        == "2\n"
    )
    assert (
        ctx.sql(
            "SELECT k FROM e WHERE CAST(ts AS DATE) = DATE '2021-03-15' ORDER BY k"
        ).result_str()
        == "1\n3\n"
    )
    assert (
        ctx.sql(
            "SELECT CAST(DATE '2021-03-15' AS TIMESTAMP) FROM e LIMIT 1"
        ).result_str()
        == "2021-03-15 00:00:00\n"
    )


def test_aggregate_and_group():
    ctx = make_ctx()
    assert (
        ctx.sql("SELECT MIN(ts), MAX(ts) FROM e").result_str()
        == "2021-03-15 08:30:05\t2022-07-01 23:59:59\n"
    )
    assert (
        ctx.sql("SELECT YEAR(ts), COUNT(k) FROM e GROUP BY YEAR(ts) ORDER BY 1").result_str()
        == "2021\t2\n2022\t1\n"
    )
    with pytest.raises(PlanError):
        ctx.sql("SELECT SUM(ts) FROM e")


def test_to_pylist_gives_datetimes():
    ctx = make_ctx()
    rows = ctx.sql("SELECT ts FROM e ORDER BY ts LIMIT 1").to_pylist()
    assert rows == [{"ts": datetime.datetime(2021, 3, 15, 8, 30, 5)}]


def test_csv_ingest_both_paths(tmp_path):
    csv = tmp_path / "ts.csv"
    csv.write_text(
        "k,ts\n"
        "1,2021-03-15 08:30:05\n"
        "2,2022-07-01T23:59:59\n"
        "3,2021-03-15 10:00:00.25\n"  # fraction truncates
        "4,2020-01-01\n"  # bare date = midnight
        "5,\n"  # NULL
    )
    expected = (
        "1\t2021-03-15 08:30:05\n"
        "2\t2022-07-01 23:59:59\n"
        "3\t2021-03-15 10:00:00\n"
        "4\t2020-01-01 00:00:00\n"
        "5\tNULL\n"
    )
    import os

    for native in ("1", "0"):
        os.environ["DFTPU_NATIVE_CSV"] = native
        try:
            ctx = ExecutionContext()
            ctx.sql(
                "CREATE EXTERNAL TABLE e (k INT, ts TIMESTAMP) STORED AS CSV "
                f"WITH HEADER ROW LOCATION '{csv}'"
            )
            out = ctx.sql("SELECT k, ts FROM e ORDER BY k").result_str()
            assert out == expected, f"native={native}"
        finally:
            os.environ.pop("DFTPU_NATIVE_CSV", None)


def test_ctas_roundtrip_timestamps():
    ctx = make_ctx()
    ctx.sql("CREATE TABLE c AS SELECT k, ts FROM e WHERE k < 3")
    assert (
        ctx.sql("SELECT k, ts FROM c ORDER BY k").result_str()
        == "1\t2021-03-15 08:30:05\n2\t2022-07-01 23:59:59\n"
    )


def test_from_pydict_datetime_objects():
    ctx = ExecutionContext()
    ctx.register_table(
        "p",
        Table.from_pydict(
            {
                "ts": [
                    datetime.datetime(2021, 1, 1, 12, 0, 1),
                    datetime.datetime(1999, 12, 31, 23, 59, 59),
                ]
            }
        ),
    )
    assert (
        ctx.sql("SELECT ts FROM p ORDER BY ts").result_str()
        == "1999-12-31 23:59:59\n2021-01-01 12:00:01\n"
    )


def test_distributed_timestamp_parity():
    from datafusion_tpu.parallel.mesh import make_mesh

    single = make_ctx()
    dist = ExecutionContext(mesh=make_mesh())
    dist.register_table("e", single.table("e"))
    for sql in (
        "SELECT k, ts FROM e ORDER BY ts",
        "SELECT MIN(ts), MAX(ts) FROM e",
        "SELECT YEAR(ts), COUNT(k) FROM e GROUP BY YEAR(ts) ORDER BY 1",
    ):
        assert single.sql(sql).result_str() == dist.sql(sql).result_str(), sql


# ------------------------------------------------------------ INTERVAL
def interval_ctx():
    ctx = ExecutionContext()
    ctx.register_table(
        "e",
        Table.from_pydict(
            {
                "k": np.array([1, 2, 3], np.int32),
                "d": np.array(
                    ["2021-01-31", "2020-02-29", "2021-12-15"], "datetime64[D]"
                ),
                "ts": np.array(
                    [
                        "2021-03-15T08:30:05",
                        "2022-07-01T23:59:59",
                        "2021-03-15T10:00:00",
                    ],
                    "datetime64[s]",
                ),
            }
        ),
    )
    return ctx


def test_interval_months_clamp():
    ctx = interval_ctx()
    # Jan 31 + 1 MONTH clamps to Feb 28; leap Feb 29 + 1 YEAR clamps too
    assert (
        ctx.sql("SELECT k, d + INTERVAL '1' MONTH FROM e ORDER BY k").result_str()
        == "1\t2021-02-28\n2\t2020-03-29\n3\t2022-01-15\n"
    )
    assert (
        ctx.sql("SELECT k, d + INTERVAL '1' YEAR FROM e ORDER BY k").result_str()
        == "1\t2022-01-31\n2\t2021-02-28\n3\t2022-12-15\n"
    )


def test_interval_fixed_units():
    ctx = interval_ctx()
    assert (
        ctx.sql("SELECT k, d - INTERVAL '2 weeks' FROM e ORDER BY k").result_str()
        == "1\t2021-01-17\n2\t2020-02-15\n3\t2021-12-01\n"
    )
    assert (
        ctx.sql("SELECT k, ts + INTERVAL '90' MINUTE FROM e ORDER BY k").result_str()
        == "1\t2021-03-15 10:00:05\n2\t2022-07-02 01:29:59\n3\t2021-03-15 11:30:00\n"
    )
    # interval on the left of + commutes
    assert (
        ctx.sql("SELECT k, INTERVAL '3' DAY + d FROM e ORDER BY k").result_str()
        == "1\t2021-02-03\n2\t2020-03-03\n3\t2021-12-18\n"
    )


def test_interval_promotes_date_to_timestamp():
    ctx = interval_ctx()
    assert (
        ctx.sql("SELECT k, d + INTERVAL '36' HOUR FROM e ORDER BY k").result_str()
        == "1\t2021-02-01 12:00:00\n2\t2020-03-01 12:00:00\n3\t2021-12-16 12:00:00\n"
    )


def test_interval_in_where_on_literal():
    ctx = interval_ctx()
    assert (
        ctx.sql(
            "SELECT k FROM e WHERE ts > TIMESTAMP '2021-03-15 08:00:00' "
            "+ INTERVAL '1' HOUR ORDER BY k"
        ).result_str()
        == "2\n3\n"
    )


def test_interval_errors():
    ctx = interval_ctx()
    with pytest.raises(PlanError):
        ctx.sql("SELECT k + INTERVAL '1' DAY FROM e")  # not a temporal type
    with pytest.raises(PlanError):
        ctx.sql("SELECT INTERVAL '1' DAY - d FROM e")  # interval - expr
    with pytest.raises(PlanError):
        ctx.sql("SELECT INTERVAL '1' DAY FROM e")  # bare interval


# --------------------------------------- extended EXTRACT + DATE_TRUNC
def test_extract_extended_fields():
    ctx = ExecutionContext()
    ctx.register_table(
        "x",
        Table.from_pydict(
            {
                "d": np.array(
                    ["2021-01-01", "2021-03-15", "2024-12-30", "2023-01-01"],
                    "datetime64[D]",
                )
            }
        ),
    )
    out = ctx.sql(
        "SELECT EXTRACT(DOW FROM d), EXTRACT(DOY FROM d), "
        "EXTRACT(QUARTER FROM d), EXTRACT(WEEK FROM d) FROM x"
    ).result_str()
    # verified against datetime.isocalendar(): ISO weeks 53/11/1/52,
    # DOW Sunday=0 (Postgres), DOY ordinal
    assert out == "5\t1\t1\t53\n1\t74\t1\t11\n1\t365\t4\t1\n0\t1\t1\t52\n"


def test_date_trunc():
    ctx = ExecutionContext()
    ctx.register_table(
        "x",
        Table.from_pydict(
            {
                "d": np.array(["2021-03-15", "2024-12-30"], "datetime64[D]"),
                "ts": np.array(
                    ["2021-03-15T08:30:05", "2020-02-29T12:00:00"], "datetime64[s]"
                ),
            }
        ),
    )
    q = lambda sql: ctx.sql(sql).result_str()
    assert q(
        "SELECT DATE_TRUNC('month', d), DATE_TRUNC('year', d), "
        "DATE_TRUNC('week', d) FROM x"
    ) == ("2021-03-01\t2021-01-01\t2021-03-15\n" "2024-12-01\t2024-01-01\t2024-12-30\n")
    assert q("SELECT DATE_TRUNC('hour', ts), DATE_TRUNC('quarter', ts) FROM x") == (
        "2021-03-15 08:00:00\t2021-01-01 00:00:00\n"
        "2020-02-29 12:00:00\t2020-01-01 00:00:00\n"
    )
    assert q("SELECT EXTRACT(EPOCH FROM ts) FROM x WHERE EXTRACT(YEAR FROM ts) = 2021") == (
        "1615797005\n"
    )
    with pytest.raises(PlanError):
        ctx.sql("SELECT DATE_TRUNC('hour', d) FROM x")  # hour needs TIMESTAMP


def test_current_date_and_now():
    ctx = ExecutionContext()
    ctx.register_table(
        "x", Table.from_pydict({"d": np.array(["2021-01-01"], "datetime64[D]")})
    )
    # planning-time literals: every historical row precedes now
    assert ctx.sql("SELECT COUNT(d) FROM x WHERE d <= CURRENT_DATE").result_str() == "1\n"
    assert (
        ctx.sql("SELECT COUNT(d) FROM x WHERE CAST(d AS TIMESTAMP) < NOW()").result_str()
        == "1\n"
    )
