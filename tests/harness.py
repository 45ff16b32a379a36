"""Canonicalization helpers mirroring the driver's comparator:
columns sorted by name, floats rounded to 6 dp, rows sorted."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def canonicalize(col_names: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = [tuple(r) for r in cur.fetchall()]
    return cols, rows


def compare(spark_df, duck_con, oracle_sql: str) -> tuple[bool, str]:
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duck_result(duck_con, oracle_sql)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    s = canonicalize(s_cols, s_rows)
    d = canonicalize(d_cols, d_rows)
    if len(s) != len(d):
        return False, f"row count mismatch: spark={len(s)} duck={len(d)}"
    for i, (a, b) in enumerate(zip(s, d)):
        if a != b:
            return False, f"first diff at row {i}:\n  spark={a}\n  duck ={b}"
    return True, "ok"
