#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result and
the DuckDB result of the matching oracle SQL, sort columns by name, sort
rows, and compare values (exact for ints/strings, tight-tolerance for
floats to mirror a hash compare we round-trip through parquet).
"""
import glob
import json
import math
import os
import sys

import duckdb


def normalize(rows):
    out = []
    for r in rows:
        out.append(tuple(round(v, 9) if isinstance(v, float) else v for v in r))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # a query that threw inside graft.Verify leaves NO output dir and
    # would otherwise silently vanish from the compare — flag it
    for name in sorted(oracle):
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"FAIL {name}: no verify output (query threw in graft.Verify?)")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got_rel = con.sql(f"SELECT * FROM '{files[0]}'")
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got_rel.fetchall())})")
            continue
        try:
            exp_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # DuckDB's sum(BIGINT) returns HUGEINT -> arrow decimal128, which
        # the driver's hash compares unequal to Spark's int64 even when
        # every value matches (round-9 v10 hash-fail). Values compare
        # equal below (Python ints), so this must be a hard FAIL here or
        # the local check passes a query the driver will flag.
        # .types reads the plan's output types without executing the
        # query (.arrow() would run every oracle twice — the recursive
        # x9/x24 closures and all-pairs x23 are the expensive ones)
        dec_cols = [c for c, t in zip(exp_rel.columns, exp_rel.types)
                    if "DECIMAL" in str(t).upper() or "HUGEINT" in str(t).upper()]
        if dec_cols:
            print(f"FAIL {name}: oracle outputs decimal128 column(s) "
                  f"{dec_cols} — CAST sums to BIGINT/DOUBLE in the oracle SQL")
            n_fail += 1
            continue
        got_cols = sorted(got_rel.columns)
        exp_cols = sorted(exp_rel.columns)
        if [c.lower() for c in got_cols] != [c.lower() for c in exp_cols]:
            print(f"FAIL {name}: columns {got_cols} vs {exp_cols}")
            n_fail += 1
            continue
        got = normalize(con.sql(
            f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall())
        exp = normalize(con.sql(
            f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall())
        if got == exp:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            diff = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}; first diffs: {diff}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
