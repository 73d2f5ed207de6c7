#!/usr/bin/env python3
"""Self-test for tools/merge_bench.py — the measurement tooling deserves
the same regression protection as the engine (the anchor tool's median
bug survived two rounds because nothing executed the stat on a known
input). Synthesizes pass files and asserts:

  1. min-merge picks the lower-min entry per query and records pass_mins;
  2. cross-window mode (no interleaved prev passes) flags vs the
     committed file, reproduced-in-both-passes only;
  3. same-window mode computes ratios within each (new, prev) window pair
     and the committed file is NOT the flag denominator;
  4. an all-failed query surfaces as FAILED, never as a silent skip.

Run: python3 tools/test_merge_bench.py   (exits non-zero on failure)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def bench(queries):
    """queries: {name: [elapsed,...]} -> BenchFull-shaped dict."""
    return {
        "context": {"engine": "graft-spark"},
        "queries": [
            {"query": n, "success": True, "start_time": 0,
             "iterations": [{"elapsed": e, "row_count": 1, "env": {}}
                            for e in es]}
            for n, es in sorted(queries.items())],
    }


def run(tmp, files, args):
    paths = []
    for i, d in enumerate(files):
        p = os.path.join(tmp, f"f{i}.json")
        with open(p, "w") as f:
            json.dump(d, f)
        paths.append(p)
    out = os.path.join(tmp, "out.json")
    report = os.path.join(tmp, "report.md")
    argv = [sys.executable, os.path.join(HERE, "merge_bench.py"),
            paths[0], paths[1], out]
    if args.get("prev") is not None:
        argv.append(paths[args["prev"]] if isinstance(args["prev"], int) else "")
    elif "prevA" in args:
        argv.append("")
    if "report" in args or "prevA" in args:
        argv.append(report)
    if "prevA" in args:
        argv += [paths[args["prevA"]], paths[args["prevB"]]]
    res = subprocess.run(argv, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    rep = open(report).read() if os.path.exists(report) else ""
    return json.load(open(out)), rep, res.stdout


def main():
    with tempfile.TemporaryDirectory() as tmp:
        # 1. min-merge
        a = bench({"q": [100, 90], "r": [50, 60]})
        b = bench({"q": [80, 95], "r": [70, 65]})
        merged, _, _ = run(tmp, [a, b], {})
        byname = {q["query"]: q for q in merged["queries"]}
        assert byname["q"]["pass_mins"] == [90, 80]
        assert byname["q"]["iterations"][0]["elapsed"] == 80  # pass B won
        assert byname["r"]["iterations"][0]["elapsed"] == 50  # pass A won
        print("PASS min-merge")

        # 2. cross-window: flag only when BOTH passes exceed 1.2x vs prev
        prev = bench({"q": [100], "r": [100], "s": [100]})
        a = bench({"q": [150], "r": [150], "s": [90]})
        b = bench({"q": [130], "r": [110], "s": [95]})
        _, rep, _ = run(tmp, [a, b, prev], {"prev": 2, "report": True})
        assert "CROSS-WINDOW" in rep
        assert rep.count("REGRESSED") == 1 and "| q |" in rep
        assert "window noise" in rep  # r: one pass only
        print("PASS cross-window flag rule")

        # 3. same-window: ratios against the INTERLEAVED prev passes;
        # committed prev (wildly off) must not produce a flag
        committed_prev = bench({"q": [1], "r": [1]})  # would flag everything
        new_a = bench({"q": [100], "r": [300]})
        new_b = bench({"q": [100], "r": [290]})
        prev_a = bench({"q": [95], "r": [200]})
        prev_b = bench({"q": [98], "r": [210]})
        _, rep, _ = run(tmp, [new_a, new_b, committed_prev, prev_a, prev_b],
                        {"prev": 2, "report": True, "prevA": 3, "prevB": 4})
        assert "SAME-WINDOW" in rep
        assert "| q |" not in rep, "q (~1.0x same-window) must not appear"
        assert rep.count("REGRESSED") == 1 and "| r |" in rep  # 1.5x/1.38x
        print("PASS same-window drift cancellation")

        # 4. all-failed query surfaces loudly
        bad = bench({"q": [100]})
        bad["queries"][0]["iterations"] = [
            {"elapsed": 1, "row_count": -1, "env": {}}]
        good = bench({"q": [100]})
        good["queries"][0]["iterations"] = [
            {"elapsed": 1, "row_count": -1, "env": {}}]
        _, _, stdout = run(tmp, [bad, good], {})
        assert "FAILED: q" in stdout
        print("PASS failed-query surfacing")
    print("all merge_bench self-tests pass")


if __name__ == "__main__":
    main()
