"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, normalizes both to
name-sorted columns / row-sorted values, and compares exactly (floats
with 1e-9 relative tolerance to flag — not hide — accumulation bugs).
"""

from __future__ import annotations

import datetime
import math
import os
from typing import Any

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _norm(value: Any) -> Any:
    if isinstance(value, datetime.datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, datetime.date):
        return value.isoformat()
    if hasattr(value, "as_integer_ratio") and not isinstance(value, (int, bool)):
        return float(value)
    if isinstance(value, (list, tuple)):
        return tuple(_norm(v) for v in value)
    try:
        import decimal

        if isinstance(value, decimal.Decimal):
            return float(value)
    except ImportError:
        pass
    return value


def driver_canon(columns: list[str], data: list[tuple]) -> list[tuple]:
    """Replicate the driver's pandas canonicalization (its ``_canon``):
    columns name-sorted, then ``DataFrame.sort_values`` over ALL
    columns.  Crucially this RAISES ``TypeError: unhashable type`` on
    list/dict cells exactly like the driver's pandas lexsort does —
    round 8 proved the previous str()-sort mirror was weaker than the
    driver and certified two queries the driver then crashed on.
    Cells are passed to pandas RAW (no tuple-ification) so the mirror
    fails on precisely the same shapes the driver fails on."""
    import pandas as pd

    order = sorted(range(len(columns)), key=lambda i: columns[i].lower())
    cols = [columns[i].lower() for i in order]
    rows = [[row[i] for i in order] for row in data]
    pdf = pd.DataFrame(rows, columns=cols, dtype=object)
    if len(pdf) and cols:
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def _rows(columns: list[str], data: list[tuple]) -> list[tuple]:
    canon = driver_canon(columns, data)
    return [tuple(_norm(v) for v in row) for row in canon]


def _values_close(a: Any, b: Any) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare_query(spark, name: str, fn, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_data = [tuple(row) for row in sdf.collect()]

    con = duckdb_connection(sf_dir)
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_data = rel.fetchall()
    con.close()

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_data) != len(duck_data):
        problems.append(f"{name}: row count spark={len(spark_data)} duck={len(duck_data)}")
        return problems

    s_rows = _rows(spark_cols, spark_data)
    d_rows = _rows(duck_cols, duck_data)
    bad = 0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if sr != dr and not all(_values_close(a, b) for a, b in zip(sr, dr)):
            bad += 1
            if bad <= 3:
                problems.append(f"{name}: row {i} spark={sr} duck={dr}")
    if bad > 3:
        problems.append(f"{name}: ... {bad} mismatched rows total")
    return problems
