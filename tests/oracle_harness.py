"""Local replica of the driver's correctness gate: run a Spark query and its
DuckDB oracle SQL side-by-side and compare row count, schema shape, and an
order-insensitive value comparison (floats rounded to 6 decimals)."""

from __future__ import annotations

import math
from pathlib import Path

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for table in TABLES:
        path = Path(sf_dir) / f"{table}.parquet"
        if path.exists():
            con.execute(f"CREATE VIEW {table} AS SELECT * FROM '{path}'")
    return con


def _normalize_cell(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 6)
    if isinstance(value, list):
        return tuple(_normalize_cell(v) for v in value)
    return value


def _normalize_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    normalized = [tuple(_normalize_cell(row[i]) for i in order) for row in rows]
    normalized.sort(key=repr)
    return [columns[i] for i in order], normalized


def compare_query(spark, sf_dir: str, spark_fn, sql: str) -> None:
    """Assert the Spark result and the DuckDB oracle agree."""
    sdf = spark_fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(row) for row in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        cursor = con.execute(sql)
        duck_cols = [d[0] for d in cursor.description]
        duck_rows = cursor.fetchall()
    finally:
        con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    _, normalized_spark = _normalize_rows(spark_cols, spark_rows)
    _, normalized_duck = _normalize_rows(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(normalized_spark, normalized_duck) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} row mismatches; first 5: {mismatches[:5]}"
