"""Query a CSV file with SQL — the reference's examples/csv_sql.rs,
TPU-native. Run from the repo root: python examples/csv_sql.py"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datafusion_tpu as df
from datafusion_tpu import DataType as D, Field, Schema

ctx = df.ExecutionContext()

schema = Schema(
    [
        Field("city", D.Utf8, False),
        Field("lat", D.Float64, False),
        Field("lng", D.Float64, False),
    ]
)
ctx.register_csv("cities", "tests/data/uk_cities.csv", schema, has_header=False)

# simple projection and selection (reference: examples/csv_sql.rs:45)
result = ctx.sql("SELECT city, lat, lng FROM cities WHERE lat > 51.0 AND lat < 53")

print(f"Result has {result.num_rows} rows and {result.num_columns} columns")
for row in result.to_pylist():
    print(f"City: {row['city']}, Latitude: {row['lat']}, Longitude: {row['lng']}")
