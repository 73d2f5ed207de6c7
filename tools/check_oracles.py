#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the same sf tables,
canonicalizes both (columns sorted by name, rows sorted by full value
tuple), and diffs. Mirrors the driver's compare closely enough that a
local PASS predicts a driver PASS.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        t = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = repr(v)
            t.append((cols[i], str(v)))
        out.append(tuple(t))
    out.sort()
    return out

def main(outdir, sfdir):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            tbl = pq.read_table(f"{outdir}/{name}")
            scols = tbl.column_names
            srows = [tuple(d[c] for c in scols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}"); n_fail += 1; continue
        try:
            res = con.execute(oracle[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}"); n_fail += 1; continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1; continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if len(cs) != len(co):
            print(f"FAIL {name}: rows spark={len(cs)} oracle={len(co)}")
            n_fail += 1; continue
        bad = [(a, b) for a, b in zip(cs, co) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(cs)} rows differ; first:")
            print("  spark :", bad[0][0]); print("  oracle:", bad[0][1])
            n_fail += 1; continue
        print(f"PASS {name} ({len(cs)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
