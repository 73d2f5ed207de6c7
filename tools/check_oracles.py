#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir>
       python3 tools/check_oracles.py --selftest

Reads each <name>.parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the same sf tables,
and diffs after canonicalizing BOTH sides through pandas, exactly like
the driver's harness:

  - DuckDB results come via `fetchdf()` (NOT `fetchall()`): HUGEINT
    (un-CAST integer SUMs) and DECIMAL columns coerce to float64, so
    an int64 "6" on the Spark side vs "6.0" here hash-diverges.
  - Spark parquet comes via `pyarrow.Table.to_pandas()`: list columns
    become numpy arrays, and pandas `sort_values` raises on them
    ("unhashable type: 'numpy.ndarray'") — a raw array gate column is
    an ERROR, same as on the driver.
  - Rows are sorted with `DataFrame.sort_values` over all columns
    (name-sorted), then compared as str() tuples.

Round-5 lesson: the previous `fetchall()`-based canon said 187/187
while the driver said 179/187 — the eight reds were exactly the
HUGEINT/DECIMAL/list coercion gaps this version reproduces. A local
PASS must predict a driver PASS; run --selftest to prove the gate
still catches all three divergence classes.
"""
import json
import os, sys
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_df(df):
    """Driver-style canonicalization: name-sorted columns, rows sorted by
    all columns via pandas sort_values, values stringified PER COLUMN via
    pandas astype(str) — the detail that makes DATE columns agree: a
    datetime64 column whose values are all midnight renders date-only
    ('1995-01-25'), matching the datetime.date objects pyarrow yields for
    Spark's DATE parquet. Raises (like the driver) if a column's dtype is
    unsortable (numpy-array cells)."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df) > 0:
        df = df.sort_values(by=cols, kind="mergesort")
    df = df.astype(str)
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(zip(cols, row)))
    out.sort()
    return out


def compare(name, sdf, odf):
    """Returns (ok, message)."""
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, (f"columns spark={sorted(sdf.columns)} "
                       f"oracle={sorted(odf.columns)}")
    try:
        cs = canon_df(sdf)
    except Exception as e:
        return False, f"spark side uncanonicalizable (driver would ERR): {e}"
    try:
        co = canon_df(odf)
    except Exception as e:
        return False, f"oracle side uncanonicalizable (driver would ERR): {e}"
    if len(cs) != len(co):
        return False, f"rows spark={len(cs)} oracle={len(co)}"
    bad = [(a, b) for a, b in zip(cs, co) if a != b]
    if bad:
        return False, (f"{len(bad)}/{len(cs)} rows differ; first:\n"
                       f"  spark : {bad[0][0]}\n  oracle: {bad[0][1]}")
    return True, f"{len(cs)} rows"


def main(outdir, sfdir):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        tp = f"{sfdir}/{t}.parquet"
        # ScaleUp replicas are Spark-style parquet DIRECTORIES of part files
        src = f"{tp}/*.parquet" if os.path.isdir(tp) else tp
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            sdf = pq.read_table(f"{outdir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        ok, msg = compare(name, sdf, odf)
        if ok:
            print(f"PASS {name} ({msg})")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


def selftest():
    """Prove the gate reproduces the driver's three divergence classes:
    un-CAST HUGEINT sums, DECIMAL outputs, and raw list columns must all
    FAIL; the correctly-CAST twin of each must PASS."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, 2.50), (2, 3.25)) v(k, d)")
    spark_like = pd.DataFrame({"s": pd.array([3], dtype="int64")})

    # 1. HUGEINT: DuckDB SUM(int) -> HUGEINT -> fetchdf float64 -> "3.0" != "3"
    odf = con.execute("SELECT SUM(k) AS s FROM t").fetchdf()
    ok, _ = compare("hugeint", spark_like, odf)
    assert not ok, "un-CAST HUGEINT SUM must FAIL under the pandas gate"
    odf = con.execute("SELECT CAST(SUM(k) AS BIGINT) AS s FROM t").fetchdf()
    ok, msg = compare("hugeint_cast", spark_like, odf)
    assert ok, f"CAST AS BIGINT must PASS: {msg}"

    # 2. DECIMAL: fetchdf -> float64 -> "5.75" vs Spark decimal str "5.75"?
    # Spark's parquet decimal arrives as Python Decimal objects -> "5.75"
    # is fine, but "2.50" renders "2.5" under float64 -> diverges.
    import decimal
    sdec = pd.DataFrame({"d": [decimal.Decimal("2.50")]}, dtype=object)
    odf = con.execute("SELECT CAST(2.50 AS DECIMAL(18,2)) AS d").fetchdf()
    ok, _ = compare("decimal", sdec, odf)
    assert not ok, "DECIMAL gate column must FAIL under the pandas gate"
    sstr = pd.DataFrame({"d": ["2.50"]})
    odf = con.execute("SELECT CAST(CAST(2.50 AS DECIMAL(18,2)) AS VARCHAR) AS d").fetchdf()
    ok, msg = compare("decimal_varchar", sstr, odf)
    assert ok, f"VARCHAR-rendered decimal must PASS: {msg}"

    # 3. list columns: numpy arrays are unsortable -> driver ERRs.
    import numpy as np
    sarr = pd.DataFrame({"a": [np.array([1, 2]), np.array([3])]})
    odf = con.execute("SELECT [1,2] AS a UNION ALL SELECT [3]").fetchdf()
    ok, msg = compare("list_col", sarr, odf)
    assert not ok, "raw list column must FAIL under the pandas gate"
    assert "uncanonicalizable" in msg, f"list column must ERR, got: {msg}"
    sjoin = pd.DataFrame({"a": ["1,2", "3"]})
    odf = con.execute(
        "SELECT array_to_string([1,2], ',') AS a UNION ALL "
        "SELECT array_to_string([3], ',')").fetchdf()
    ok, msg = compare("list_joined", sjoin, odf)
    assert ok, f"array_join-rendered list must PASS: {msg}"

    print("selftest OK: HUGEINT/DECIMAL/list all red raw, green when rendered")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
