#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only; the
Scala library never depends on this). Usage:

  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            want = con.sql(sql)
            gcols, wcols = sorted(got.columns), sorted(want.columns)
            if gcols != wcols:
                print(f"FAIL {name}: columns {gcols} vs {wcols}"); n_fail += 1; continue
            gtypes = dict(zip(got.columns, [str(t) for t in got.types]))
            wtypes = dict(zip(want.columns, [str(t) for t in want.types]))
            if {c: gtypes[c] for c in gcols} != {c: wtypes[c] for c in wcols}:
                print(f"FAIL {name}: types {gtypes} vs {wtypes}"); n_fail += 1; continue
            cols = ", ".join(f'"{c}"' for c in gcols)
            g = con.sql(f"SELECT {cols} FROM got ORDER BY ALL").fetchall()
            w = con.sql(f"SELECT {cols} FROM want ORDER BY ALL").fetchall()
            if g != w:
                from itertools import zip_longest
                diff = [(a, b) for a, b in zip_longest(g, w) if a != b][:3]
                print(f"FAIL {name}: {len(g)} vs {len(w)} rows; first diffs {diff}")
                n_fail += 1
                continue
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
