#!/usr/bin/env python3
"""DuckDB side of the parquet-reader microbench (pairs with graft.ScanProbe).

Times the IDENTICAL decode-only min/max-every-column aggregate on the same
parquet files, so the ScanProbe-vs-this ratio isolates the reader +
aggregate-loop constant factor with no result materialization or shuffle
in either measurement.

usage: python3 tools/scan_anchor.py <sfDir> [iters]
"""
import os
import sys
import time

import duckdb

PROJ = {
    "lineitem": ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    "orders": ["o_orderkey", "o_custkey", "o_orderdate"],
    "customer": ["c_custkey", "c_mktsegment"],
}


def main(sfdir, iters=5):
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer"]:
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        cols = con.execute(f"SELECT * FROM '{src}' LIMIT 0").description
        names = [c[0] for c in cols]
        rows = con.execute(f"SELECT count(*) FROM '{src}'").fetchone()[0]
        for variant, cs in (("full", names), ("proj", PROJ[t])):
            aggs = ", ".join(f'min("{c}"), max("{c}")' for c in cs)
            sql = f"SELECT {aggs} FROM '{src}'"
            con.execute(sql).fetchall()  # warm
            best = min(
                (lambda t0: (con.execute(sql).fetchall(), time.time() - t0)[1])(
                    time.time())
                for _ in range(iters))
            print(f"[scananchor] {t:<9} {variant:<4} cols={len(cs):2d} "
                  f"rows={rows:9d} min_ms={best * 1000:8.1f}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 5)
