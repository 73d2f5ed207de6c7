#!/usr/bin/env python3
"""Self-test for tools/duckdb_anchor.py's same-window protocol plumbing
(the measurement tooling deserves the same regression protection as the
engine). Synthesizes oracle SQL + bench files and asserts:

  1. comma-separated bench files min-merge per query on the graft side;
  2. GRAFT_DUCK_SAVE writes the measured duck mins as JSON;
  3. GRAFT_DUCK_LOAD reuses saved values verbatim (no re-timing: the
     asserted value is one a real timing could never reproduce exactly);
  4. GRAFT_DUCK_MIN re-times but takes the per-query min with the loaded
     slot (a loaded near-zero value must win);
  5. the footer states the bracketing protocol when multiple bench files
     are given, and the duck two-slot note only under GRAFT_DUCK_MIN.

Run: python3 tools/test_duckdb_anchor.py   (exits non-zero on failure)
"""
import json
import os
import re
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
SF = "/root/testdata/sf0.001"  # only used for view registration


def bench(queries):
    return {
        "context": {"engine": "graft-spark"},
        "queries": [
            {"query": n, "success": True, "start_time": 0,
             "iterations": [{"elapsed": e, "row_count": 1} for e in es]}
            for n, es in queries.items()
        ],
    }


def run(oracle, benches, env_extra):
    d = tempfile.mkdtemp(prefix="anchor-selftest-")
    op = os.path.join(d, "oracle_sql.json")
    json.dump(oracle, open(op, "w"))
    paths = []
    for i, b in enumerate(benches):
        p = os.path.join(d, f"bench{i}.json")
        json.dump(b, open(p, "w"))
        paths.append(p)
    env = dict(os.environ)
    env.update({k: (v if os.path.isabs(str(v)) else os.path.join(d, v))
                for k, v in env_extra.items()})
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "duckdb_anchor.py"),
         op, SF, ",".join(paths), "1"],
        capture_output=True, text=True, env=env)
    assert out.returncode == 0, out.stderr
    return d, out.stdout


def cell(stdout, qname, col):
    """col: 1=duck ms, 2=graft ms, 3=ratio."""
    for line in stdout.splitlines():
        if line.startswith(f"| {qname} |"):
            return line.split("|")[1 + col].strip()
    raise AssertionError(f"{qname} row missing in:\n{stdout}")


ORACLE = {"q01_alpha": "SELECT 1 AS x", "q02_beta": "SELECT 2 AS y"}

# 1+5: graft min-merge across files; bracketing footer present
d, out = run(ORACLE,
             [bench({"q01_alpha": [300.0], "q02_beta": [80.0]}),
              bench({"q01_alpha": [250.0], "q02_beta": [90.0]})], {})
assert cell(out, "q01_alpha", 2) == "250", out
assert cell(out, "q02_beta", 2) == "80", out
assert "min over 2 passes bracketing" in out, out
assert "two timing slots" not in out, out

# 2: SAVE writes measured mins
d, out = run(ORACLE, [bench({"q01_alpha": [100.0], "q02_beta": [100.0]})],
             {"GRAFT_DUCK_SAVE": "duck.json"})
saved = json.load(open(os.path.join(d, "duck.json")))
assert set(saved) == {"q01_alpha", "q02_beta"} and all(
    v > 0 for v in saved.values()), saved

# 3: LOAD reuses verbatim (123.456 ms for SELECT 1 is unreachable exactly)
d2 = tempfile.mkdtemp(prefix="anchor-selftest-")
lp = os.path.join(d2, "loaded.json")
json.dump({"q01_alpha": 123.456, "q02_beta": 321.0}, open(lp, "w"))
_, out = run(ORACLE, [bench({"q01_alpha": [100.0], "q02_beta": [100.0]})],
             {"GRAFT_DUCK_LOAD": lp})
assert cell(out, "q01_alpha", 1) == "123", out
assert cell(out, "q02_beta", 1) == "321", out

# 4+5: MIN re-times but the loaded near-zero slot wins; footer notes both
mp = os.path.join(d2, "minned.json")
json.dump({"q01_alpha": 0.001}, open(mp, "w"))
_, out = run(ORACLE,
             [bench({"q01_alpha": [100.0], "q02_beta": [100.0]}),
              bench({"q01_alpha": [110.0], "q02_beta": [90.0]})],
             {"GRAFT_DUCK_MIN": mp})
assert cell(out, "q01_alpha", 1) == "0", out
# q01's ratio reflects the loaded 0.001 ms slot winning over the real
# measurement (100 ms graft / 0.001 ms duck = 100000x)
assert cell(out, "q01_alpha", 3) == "100000.00x", out
# q02 was NOT in the loaded slot — its duck time is freshly measured
# (sub-ms for SELECT 2, prints as 0; the ratio row must still be finite)
assert cell(out, "q02_beta", 3).endswith("x"), out
assert "two timing slots" in out, out

print("[test_duckdb_anchor] all assertions passed")
