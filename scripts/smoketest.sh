#!/usr/bin/env bash
# End-to-end smoke test (the reference's scripts/smoketest.sh analog):
# unit tests, both examples, and a console script run, diffed against
# the expected output.
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu DFTPU_FORCE_CPU=1
export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"

echo "== unit tests =="
python -m pytest tests/ -q

echo "== example: csv_sql =="
python examples/csv_sql.py > /tmp/dftpu_ex1.txt
head -3 /tmp/dftpu_ex1.txt

echo "== example: distributed_sql =="
python examples/distributed_sql.py > /tmp/dftpu_ex2.txt
head -5 /tmp/dftpu_ex2.txt

echo "== console script mode =="
tmp=$(mktemp -d)
cat > "$tmp/smoke.sql" <<'SQL'
CREATE EXTERNAL TABLE cities (city VARCHAR(100) NOT NULL, lat DOUBLE NOT NULL,
  lng DOUBLE NOT NULL) STORED AS CSV WITHOUT HEADER ROW LOCATION 'tests/data/uk_cities.csv';
SELECT city, lat FROM cities WHERE lat > 57 ORDER BY lat DESC;
SELECT COUNT(*), MIN(lat), MAX(lat) FROM cities;
SQL
python -m datafusion_tpu.console --script "$tmp/smoke.sql" | grep -v "row(s) in" > "$tmp/got.txt"
cat > "$tmp/want.txt" <<'TXT'
"Elgin, Scotland, the UK"	57.653484
"Inverness, the UK"	57.477772
"Aberdeen, Aberdeen City, UK"	57.149651
37	50.376289	57.653484
TXT
diff -u "$tmp/want.txt" "$tmp/got.txt"

echo "== reference smoketest golden (geospatial UDFs) =="
# the reference's dockerized smoketest: run test/data/smoketest.sql and
# diff -bBZ against the expected output (reference: scripts/smoketest.sh:76-96)
sed "s|/test/data/uk_cities.csv|tests/data/uk_cities.csv|" \
  tests/data/smoketest.sql > "$tmp/ref_smoke.sql"
python -m datafusion_tpu.console --ref-output --script "$tmp/ref_smoke.sql" > "$tmp/ref_got.txt"
diff -bBZ tests/data/smoketest-expected.txt "$tmp/ref_got.txt"
echo "smoketest OK"
