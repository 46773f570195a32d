"""Local replica of the driver's correctness check: run a registry query
on Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row-count + column names + order-insensitive canonical values.

Stricter than any reasonable driver hash: values are compared after a
lossless canonicalization (full-precision repr for floats), so if this
passes, a hash over any normalization of the same values matches too.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb

TABLES = (
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
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_canon_value(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"{type(v).__name__[0]}:{v}"


def canonical_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name (driver behavior), canonicalize values,
    sort rows (order-insensitive compare)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    canon = sorted(tuple(_canon_value(r[i]) for i in order) for r in rows)
    return cols, canon


def spark_rows(df) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    data = [tuple(r) for r in df.collect()]
    # Row fields come back as python scalars; nested Rows -> dict
    from pyspark.sql import Row

    def fix(v):
        if isinstance(v, Row):
            return v.asDict(recursive=True)
        return v

    return cols, [tuple(fix(v) for v in row) for row in data]


def duck_rows(con, sql: str) -> tuple[list[str], list[tuple]]:
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def assert_matches(spark_df, con, oracle: str, name: str = "") -> None:
    s_cols, s_rows = spark_rows(spark_df)
    d_cols, d_rows = duck_rows(con, oracle)
    sc, sr = canonical_rows(s_cols, s_rows)
    dc, dr = canonical_rows(d_cols, d_rows)
    assert sc == dc, f"{name}: column mismatch spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"{name}: row count spark={len(sr)} duckdb={len(dr)}"
    if sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
