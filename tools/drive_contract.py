"""Driver-simulation: exercises __spark_entry__.py exactly as the round driver does.

Loads the module by path (not package import), runs entry(spark), then for every
queries() key runs the Spark DataFrame at sf0.01 and the oracle_sql() in duckdb
on the same parquet views, canonicalizes (columns sorted by name, floats rounded
6dp, rows sorted) and compares value hashes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from contract_common import (
    build_spark,
    canon_rows as canon,
    degeneracy_check,
    duck_views,
    load_entry_module,
    resolve_only,
    value_hash as vhash,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

mod = load_entry_module()
spark = build_spark("drive-contract")

# 1) entry() smoke
t0 = time.time()
df = mod.entry(spark)
rows = df.collect()
print(f"entry(): OK rows={len(rows)} schema={[f.name for f in df.schema.fields]} in {time.time()-t0:.1f}s")

# 2) oracle compare
con = duck_views(SF_DIR)


qs = mod.queries()
ONLY = resolve_only(ONLY, list(qs))
oracles = mod.oracle_sql()
from fluvii_spark.queries import DEGENERACY_WAIVERS  # noqa: E402

print(f"queries={len(qs)} oracles={len(oracles)}")
fails = []
degenerate = []
timings = {}  # name -> (spark_s, duck_s)
for name in sorted(qs):
    if ONLY is not None and name not in ONLY:
        continue
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF_DIR)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
    except Exception as e:
        print(f"  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
        fails.append(name)
        continue
    t_spark = time.time() - t0
    # non-degeneracy gate (fails only at the driver's sf0.01 proof scale;
    # other SFs print the reason without failing — smaller fixtures shrink
    # legitimately)
    reason = degeneracy_check(s_cols, s_rows)
    if reason is not None and name not in DEGENERACY_WAIVERS:
        gate = os.path.basename(SF_DIR.rstrip("/")) == "sf0.01"
        print(f"  {name}: {'DEGENERATE' if gate else 'degenerate (not gated at this SF)'} — {reason}")
        if gate:
            degenerate.append(name)
            fails.append(name)
            continue
    if name not in oracles:
        timings[name] = (t_spark, 0.0)
        print(f"  {name}: rows-only rows={len(s_rows)} (spark {t_spark:.1f}s)")
        continue
    t1 = time.time()
    try:
        cur = con.execute(oracles[name])
        d_cols = [d[0] for d in cur.description]
        d_rows = [tuple(r) for r in cur.fetchall()]
    except Exception as e:
        print(f"  {name}: DUCK ERROR {type(e).__name__}: {str(e)[:200]}")
        fails.append(name)
        continue
    t_duck = time.time() - t1
    timings[name] = (t_spark, t_duck)
    ok_cols = sorted(s_cols) == sorted(d_cols)
    ok_rows = len(s_rows) == len(d_rows)
    sh, dh = vhash(s_cols, s_rows), vhash(d_cols, d_rows)
    ok = ok_cols and ok_rows and sh == dh
    status = "OK" if ok else "MISMATCH"
    print(f"  {name}: {status} rows={len(s_rows)}/{len(d_rows)} hash={'=' if sh==dh else f'{sh}!={dh}'} (spark {t_spark:.1f}s duck {t_duck:.1f}s)")
    if not ok:
        fails.append(name)
        if not ok_cols:
            print(f"    cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        else:
            cs, cd = canon(s_cols, s_rows), canon(d_cols, d_rows)
            for i, (a, b) in enumerate(zip(cs, cd)):
                if a != b:
                    print(f"    first diff row {i}:\n      spark={a}\n      duck ={b}")
                    break

tot_s = sum(t[0] for t in timings.values())
tot_d = sum(t[1] for t in timings.values())
print(f"\nTIMING: spark total {tot_s:.1f}s, duckdb total {tot_d:.1f}s")
print("slowest (spark+duck):")
for name, (ts, td) in sorted(timings.items(), key=lambda kv: -(kv[1][0] + kv[1][1]))[:15]:
    print(f"  {name}: {ts + td:.1f}s (spark {ts:.1f} + duck {td:.1f})")
if degenerate:
    print(f"DEGENERATE (unwaived): {degenerate}")
print(f"\nRESULT: {len(fails)} failures" + (f": {fails}" if fails else " — ALL MATCH"))
sys.exit(1 if fails else 0)
