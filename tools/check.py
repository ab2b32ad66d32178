#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the same sf dir and compare with Verify.scala's parquet output
(schema + row/values, columns sorted by name, rows sorted)."""
import sys, json, glob, math
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
flags = [a for a in sys.argv[1:] if a.startswith("--")]
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out_dir = args[1] if len(args) > 1 else "/tmp/verify"
# --scale: use the staged/sharded recipes from oracle_scale.json for the
# queries whose one-statement oracle can't run at large SFs (per-token
# unnest OOMs, ~1e9-row pair joins). --shards=N controls shard count.
use_scale = "--scale" in flags
n_shards = next((int(f.split("=")[1]) for f in flags
                 if f.startswith("--shards=")), 32)

import os.path
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # synthetic scale dirs (tools.GenScale) hold Spark-written DIRECTORIES
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
scale_recipes = {}
if use_scale and os.path.exists(f"{out_dir}/oracle_scale.json"):
    scale_recipes = json.load(open(f"{out_dir}/oracle_scale.json"))

def run_scale(name):
    """Execute a staged recipe: every statement but the last for effect
    (per_shard once per shard), the last is the result relation."""
    steps = scale_recipes[name]
    for st in steps[:-1]:
        if st["per_shard"]:
            for s in range(n_shards):
                con.execute(st["sql"].replace("__NSHARDS__", str(n_shards))
                            .replace("__SHARD__", str(s)))
        else:
            con.execute(st["sql"])
    return con.sql(steps[-1]["sql"])
fail = 0
names = sorted({p.split('/')[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith('.json')})

# Gate-shrink detection: every DECLARED query must have an output dir, and
# the dump's failure manifest must be empty. A query that errored during the
# dump previously just vanished — "N/N pass" with a smaller N.
import os
dump_errors = {}
if os.path.exists(f"{out_dir}/_failed.json"):
    dump_errors = json.load(open(f"{out_dir}/_failed.json"))
declared = set()
if os.path.exists(f"{out_dir}/_declared.json"):
    declared = set(json.load(open(f"{out_dir}/_declared.json")))
# total counts every query we know about, whether or not the declaration
# manifest exists — a _failed.json-only dump dir must still widen the
# denominator so "N/N pass" can't undercount.
total = len(declared | set(names) | set(dump_errors))
for missing in sorted(declared - set(names) - set(dump_errors)):
    print(f"FAIL {missing}: declared but produced NO output (gate shrink)")
    fail += 1
for name, msg in sorted(dump_errors.items()):
    print(f"FAIL {name}: dump error: {msg[:200]}")
    if name in names:  # errored after partial write; don't double-count below
        names.remove(name)
    fail += 1
def check_one(name):
    """Returns True on pass, False on fail, None for rows-only."""
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); return False
    got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    if name not in oracle and name not in scale_recipes:
        print(f"ROWS-ONLY {name}: {len(got.fetchall())} rows")
        return None
    try:
        if name in scale_recipes:
            exp = run_scale(name)
        else:
            exp = con.sql(oracle[name])
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); return False
    gcols = sorted(zip(got.columns, [str(t) for t in got.types]))
    ecols = sorted(zip(exp.columns, [str(t) for t in exp.types]))
    if [c for c,_ in gcols] != [c for c,_ in ecols]:
        print(f"FAIL {name}: columns {gcols} vs {ecols}"); return False
    if gcols != ecols:
        print(f"WARN {name}: type drift {gcols} vs {ecols}")
    gsel = ", ".join(f'"{c}"' for c,_ in gcols)
    grows = con.sql(f"SELECT {gsel} FROM got ORDER BY ALL").fetchall()
    erows = con.sql(f"SELECT {gsel} FROM exp ORDER BY ALL").fetchall()
    if len(grows) != len(erows):
        print(f"FAIL {name}: rowcount {len(grows)} vs {len(erows)}"); return False
    bad = None
    for i,(g,e) in enumerate(zip(grows, erows)):
        for j,(gv,ev) in enumerate(zip(g,e)):
            ok = gv == ev
            if not ok and isinstance(gv,float) and isinstance(ev,float):
                ok = (math.isnan(gv) and math.isnan(ev)) or gv == ev
            if not ok:
                bad = (i, gcols[j][0], gv, ev); break
        if bad: break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
        return False
    print(f"OK   {name}: {len(grows)} rows")
    return True

for name in names:
    # an OOM or other DuckDB crash on one heavy oracle must not take down
    # the rest of the gate — record it as that query's failure and move on
    try:
        if check_one(name) is False:
            fail += 1
    except Exception as e:
        print(f"FAIL {name}: check error: {type(e).__name__}: {str(e)[:200]}")
        fail += 1
print(f"\n{total-fail}/{total} pass")
sys.exit(1 if fail else 0)
