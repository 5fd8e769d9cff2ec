"""Parser robustness: malformed SQL must raise typed errors, never crash."""

import pytest

from datafusion_tpu.errors import ExecutionError
from datafusion_tpu.sql.parser import parse_sql

BAD = [
    "",
    ";",
    "SELECT",
    "SELECT FROM t",
    "SELECT a FROM",
    "SELECT a FROM t WHERE",
    "SELECT a b c FROM t",
    "SELECT (a FROM t",
    "SELECT a FROM t GROUP",
    "SELECT a FROM t ORDER",
    "SELECT a FROM t LIMIT",
    "SELECT 'unterminated FROM t",
    "CREATE EXTERNAL TABLE",
    "CREATE EXTERNAL TABLE x (a INT STORED AS CSV LOCATION 'p'",
    "CREATE EXTERNAL TABLE x (a INT) LOCATION 'p'",
    "CREATE EXTERNAL TABLE x (a INT) STORED AS CSV",
    "SELECT a FROM t JOIN",
    "SELECT a FROM t JOIN u",
    "SELECT a FROM t JOIN u ON",
    "SELECT ~a FROM t",
    "INSERT INTO t SET a = 1",  # INSERT now parses; SET form does not
    "INSERT INTO VALUES (1)",
    "SELECT a FROM t;;; SELECT",
    "SELECT a AS FROM t",
    "SELECT CAST(a AS) FROM t",
    "SELECT f( FROM t",
]


@pytest.mark.parametrize("sql", BAD)
def test_bad_sql_raises_cleanly(sql):
    with pytest.raises(ExecutionError):
        parse_sql(sql)


GOOD = [
    "SELECT 1",
    "select a from t",  # case-insensitive keywords
    "SELECT a FROM t;",
    "SELECT -1",
    "SELECT +1.5",
    "SELECT a FROM t WHERE NOT a > 1",
    "SELECT (a + 1) * 2 FROM t",
    "SELECT a FROM t WHERE a IS NOT NULL AND b IS NULL",
    "SELECT a FROM t -- trailing comment",
    "SELECT a FROM t WHERE s LIKE '%x%' OR s NOT LIKE 'y_'",
    "EXPLAIN SELECT a FROM t",
    "SELECT DISTINCT a, b FROM t",
]


@pytest.mark.parametrize("sql", GOOD)
def test_good_sql_parses(sql):
    parse_sql(sql)
