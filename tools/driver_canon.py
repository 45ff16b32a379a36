"""Driver-PARITY correctness check: pandas-based canonicalizer.

The round driver canonicalizes results through pandas (q56's r2 traceback
shows ``df.sort_values`` → ``Categorical``/``factorize`` inside ``_canon``),
fetching the Spark side via ``toPandas()`` and the DuckDB side via ``.df()``.
That pipeline has two failure modes the repo's tuple-based canon
(tools/drive_contract.py) masks:

1. **unhashable cells** — array-valued columns become ``numpy.ndarray`` cells,
   which ``sort_values`` cannot factorize → hard crash (CORRECTNESS_r02 q56);
2. **dtype skew** — DuckDB widens integer SUM/window outputs to HUGEINT,
   which ``.df()`` renders as float64 (or object) while Spark emits int64;
   identical values then hash differently (CORRECTNESS_r02 q58).

This tool reproduces both locally: it sorts columns by name, rounds float64
columns to 6dp, row-sorts with ``sort_values`` over every column (crashing
exactly where the driver crashes), then hashes each cell's ``repr`` — so
``1.0`` (float64) vs ``1`` (int64) mismatch just as they do in the driver.

Usage: python tools/driver_canon.py [sf_dir] [q1,q2,...]
"""
import datetime as dt
import hashlib
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from contract_common import build_spark, duck_views, load_entry_module, resolve_only

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

mod = load_entry_module()
spark = build_spark("driver-canon")
con = duck_views(SF_DIR)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's pandas canonicalization (sorted cols, 6dp floats,
    sort_values over all columns).  Raises on unhashable cells — that IS the
    parity signal."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6) + 0.0  # -0.0 → 0.0
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df


def _cell_repr(v) -> str:
    # dtype-sensitive: int64 1 → '1', float64 1.0 → '1.0' (driver parity)
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "<null>"
    if isinstance(v, (np.integer,)):
        return repr(int(v))
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, np.bool_):
        return repr(bool(v))
    if v is pd.NaT:  # NaT passes isinstance(dt.datetime) but .time() raises
        return "None"
    if isinstance(v, pd.Timestamp):
        # date-typed Spark output arrives as datetime.date while DuckDB's
        # .df() yields midnight datetime64 — the driver treats these as equal
        # (q22/q108 are driver-green), so normalize midnight → date
        if v.time() == dt.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.datetime):
        if v.time() == dt.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return repr(v)


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update("\x1f".join(_cell_repr(v) for v in row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


qs = mod.queries()
ONLY = resolve_only(ONLY, list(qs))
oracles = mod.oracle_sql()
fails = []
for name in sorted(qs):
    if ONLY is not None and name not in ONLY:
        continue
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF_DIR).toPandas()
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
        fails.append(name)
        continue
    if name not in oracles:
        print(f"  {name}: rows-only rows={len(sdf)} ({time.time()-t0:.1f}s)")
        continue
    try:
        ddf = con.execute(oracles[name]).df()
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: DUCK ERROR {type(e).__name__}: {str(e)[:200]}")
        fails.append(name)
        continue
    try:
        cs, cd = _canon(sdf), _canon(ddf)
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: CANON CRASH {type(e).__name__}: {str(e)[:160]}")
        fails.append(name)
        continue
    ok_cols = list(cs.columns) == list(cd.columns)
    ok_rows = len(cs) == len(cd)
    sh, dh = _hash(cs), _hash(cd)
    ok = ok_cols and ok_rows and sh == dh
    print(
        f"  {name}: {'OK' if ok else 'MISMATCH'} rows={len(cs)}/{len(cd)} "
        f"hash={'=' if sh == dh else f'{sh}!={dh}'} "
        f"({time.time()-t0:.1f}s)"
    )
    if not ok:
        fails.append(name)
        if not ok_cols:
            print(f"    cols spark={list(cs.columns)} duck={list(cd.columns)}")
        elif ok_rows:
            print(f"    dtypes spark={dict(cs.dtypes.astype(str))}")
            print(f"    dtypes duck ={dict(cd.dtypes.astype(str))}")
            for i in range(len(cs)):
                a = tuple(_cell_repr(v) for v in cs.iloc[i])
                b = tuple(_cell_repr(v) for v in cd.iloc[i])
                if a != b:
                    print(f"    first diff row {i}:\n      spark={a}\n      duck ={b}")
                    break

print(f"\nRESULT: {len(fails)} failures" + (f": {fails}" if fails else " — ALL MATCH"))
sys.exit(1 if fails else 0)
