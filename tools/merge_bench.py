#!/usr/bin/env python3
"""Merge two same-HEAD BenchFull passes into one committed artifact, and
compare against the previous round with a REPRODUCED-ONLY flag rule.

Why: same-HEAD sf0.1 suite totals swing +-20% between measurement windows
(r9 measured 84.1/102.2/90.1 s in one day), so the single-pass >1.2x
compare (mirroring the reference protocol, benchmarks/src/util/run.rs:
212-260) had become mostly noise. Two passes tighten it two ways:
  - the committed per-query timing is the entry whose min-iteration is
    lower (the whole iterations[] entry is kept so env counters stay
    consistent with the timing), with both passes' mins recorded under
    "pass_mins" for confidence reading;
  - a regression/improvement is flagged ONLY when it reproduces in BOTH
    passes against the previous round's committed mins — a delta one
    pass shows and the other doesn't is window noise by construction.

usage: merge_bench.py <passA.json> <passB.json> <out.json> [prev.json] [report.md]
"""
import json
import sys


def per_query(path):
    with open(path) as f:
        d = json.load(f)
    return d, {q["query"]: q for q in d["queries"]}


def qmin(q):
    # None (not NaN) for all-failed queries: NaN would serialize as a bare
    # token (invalid strict JSON) and every NaN comparison is False, so the
    # failure would be silently neither flagged nor reported (r10 advice).
    es = [it["elapsed"] for it in q["iterations"] if it.get("row_count", 0) >= 0]
    return min(es) if es else None


def main():
    pa, pb, out = sys.argv[1:4]
    prev_path = sys.argv[4] if len(sys.argv) > 4 else None
    report_path = sys.argv[5] if len(sys.argv) > 5 else None

    da, qa = per_query(pa)
    db, qb = per_query(pb)
    assert set(qa) == set(qb), (
        f"pass query sets differ: {sorted(set(qa) ^ set(qb))}")

    merged = dict(da)  # context from pass A, annotated
    merged["context"] = dict(da["context"])
    merged["context"]["passes"] = 2
    out_queries = []
    failed = []
    for name in sorted(qa):
        a, b = qa[name], qb[name]
        ma, mb = qmin(a), qmin(b)
        if ma is None and mb is None:
            failed.append(name)
            best = a
        elif mb is None or (ma is not None and ma <= mb):
            best = a
        else:
            best = b
        entry = dict(best)
        entry["pass_mins"] = [ma, mb]
        out_queries.append(entry)
    merged["queries"] = out_queries
    with open(out, "w") as f:
        json.dump(merged, f)

    lines = []
    if prev_path:
        try:
            _, qp = per_query(prev_path)
        except FileNotFoundError:
            qp = {}
        for name in sorted(qa):
            if name not in qp:
                continue
            prev = qmin(qp[name])
            ma, mb = qmin(qa[name]), qmin(qb[name])
            if prev is None or ma is None or mb is None:
                lines.append(
                    f"| {name} | {prev} | {ma} | {mb} | — | "
                    "FAILED (no successful iterations) |")
                continue
            ra, rb = ma / prev, mb / prev
            if ra > 1.2 and rb > 1.2:
                flag = "REGRESSED (both passes)"
            elif ra < 1 / 1.2 and rb < 1 / 1.2:
                flag = "improved (both passes)"
            elif (ra > 1.2) != (rb > 1.2):
                flag = "window noise (one pass only)"
            else:
                continue
            lines.append(
                f"| {name} | {prev:.1f} | {ma:.1f} | {mb:.1f} "
                f"| {ra:.2f}x / {rb:.2f}x | {flag} |")
    header = (
        "# Two-pass bench compare (flag rule: reproduced in BOTH passes)\n\n"
        f"passes: `{pa}` `{pb}`; previous: `{prev_path}`\n\n"
        "| query | prev min ms | passA min | passB min | ratios | verdict |\n"
        "|---|---|---|---|---|---|\n")
    report = header + "\n".join(lines) + "\n"
    if report_path:
        with open(report_path, "w") as f:
            f.write(report)
    reproduced = [l for l in lines if "REGRESSED" in l]
    print(f"[merge_bench] {len(out_queries)} queries merged; "
          f"{len(reproduced)} reproduced regressions, "
          f"{sum('noise' in l for l in lines)} one-pass noise deltas")
    for l in reproduced:
        print("[merge_bench] " + l)
    for name in failed:
        print(f"[merge_bench] FAILED: {name} has no successful iterations "
              "in either pass")
    for l in lines:
        if "FAILED" in l:
            print("[merge_bench] " + l)


if __name__ == "__main__":
    main()
