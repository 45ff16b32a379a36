"""Shared harness scaffolding for the two contract sweeps.

``drive_contract.py`` (tuple canonicalizer) and ``driver_canon.py``
(pandas driver-parity canonicalizer) deliberately canonicalize
DIFFERENTLY — that divergence is the point (each reproduces a distinct
driver failure mode). Everything else they share lives here, because the
duplicated copies drifted once before (the r3 NaT fix landed in one and
not the other): query-name resolution, entry-module loading, the Spark
session recipe, and the DuckDB view setup.
"""

from __future__ import annotations

import importlib.util
import os
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

ENTRY_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "__spark_entry__.py",
)


def resolve_only(only: list[str] | None, names: list[str]) -> set[str] | None:
    """Expand each requested name (exact or prefix like 'q105') against the
    registry; an entry matching nothing is a FATAL error — silently skipping
    would let a typo'd re-proof run print ALL MATCH without executing."""
    if only is None:
        return None
    out: list[str] = []
    for o in only:
        hits = [n for n in names if n == o or n.startswith(o + "_")]
        if not hits:
            sys.exit(f"FATAL: --only entry {o!r} matches no registered query")
        out.extend(hits)
    return set(out)


def load_entry_module():
    """Import __spark_entry__.py by path, exactly as the round driver does."""
    spec = importlib.util.spec_from_file_location("__spark_entry__", ENTRY_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_spark(app_name: str):
    """The sweeps' session: bare local[8] with only the conf the driver is
    known to carry — engine confs must come from apply_runtime_confs at
    query time, so a missing runtime conf fails HERE, not just in CI."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName(app_name)
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )


def duck_views(sf_dir: str):
    """A DuckDB connection with the testdata tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


# --- the drive_contract tuple canonicalizer, shared with the growth
# oracle (tools/growth_oracle.py) so at-scale hash comparison uses the
# EXACT canonicalization the sf0.01 gate proves against ------------------


def norm_value(v):
    import datetime as dt
    import math
    from decimal import Decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        v = round(v, 6)
        return 0.0 if v == 0 else v
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    return v


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    import hashlib
    import json

    c = canon_rows(cols, rows)
    return hashlib.sha256(json.dumps(c, default=str).encode()).hexdigest()[:16]


def degeneracy_check(cols: list[str], rows: list[tuple]) -> str | None:
    """Non-degeneracy assertion for a query's sf0.01 result (VERDICT r6
    ask #4): the r6 audit caught six queries whose first forms were
    silently vacuous (empty results, zero variance, single buckets) only
    by manual review. Returns a reason string when the result looks
    degenerate, else None. Waivable per-query via
    ``fluvii_spark.queries.DEGENERACY_WAIVERS`` (each waiver carries the
    argument for why the shape is intended).

    Rules: no rows → degenerate; a single row → degenerate (a 1-row
    summary can't show variation — waive it with the argument); any
    all-NULL column → degenerate; with >=2 rows and >=2 columns, at
    least TWO columns must each take >=2 distinct values (one varying
    column is just the group key — a constant metric beside it is the
    q225 zero-variance class)."""
    if not rows:
        return "empty result"
    ncols = len(cols)
    distinct = [set() for _ in range(ncols)]
    non_null = [False] * ncols
    for r in rows:
        for i in range(ncols):
            v = r[i]
            if v is not None:
                non_null[i] = True
            distinct[i].add(repr(v))
    for i in range(ncols):
        if not non_null[i]:
            return f"column {cols[i]!r} is all-NULL"
    if len(rows) == 1:
        return "single-row result"
    varying = sum(1 for s in distinct if len(s) >= 2)
    need = 2 if ncols >= 2 else 1
    if varying < need:
        flat = [cols[i] for i in range(ncols) if len(distinct[i]) < 2]
        return (
            f"only {varying} of {ncols} columns vary across "
            f"{len(rows)} rows (constant: {flat})"
        )
    return None
