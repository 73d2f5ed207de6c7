#!/usr/bin/env python3
"""Merge two same-HEAD BenchFull passes into one committed artifact, and
compare against the previous round with a drift-corrected, reproduced-only
flag rule.

Why: same-HEAD sf0.1 suite totals swing +-20% between measurement windows
(r9 measured 84.1/102.2/90.1 s in one day; r12 measured 0.60x-1.48x
same-code scatter ACROSS sessions and a ~2x host slowdown mid-round), so
any compare against the previous round's committed file mixes real deltas
with host drift. Two mechanisms separate them:

  - two same-HEAD passes per version; a delta must reproduce in BOTH
    passes to be flagged (single-pass deltas are window noise by
    construction);
  - (r12 verdict item 1) when the ritual also runs the PREVIOUS round's
    HEAD interleaved in the same window (prevA/prevB pass files), ratios
    are computed new-vs-old WITHIN each window pair — host drift hits
    numerator and denominator together and cancels. The committed
    previous-round file is then only an informational column, never the
    flag denominator. This restores the same-machine-consecutive-runs
    property of the reference protocol (benchmarks/src/util/run.rs:
    212-260) that cross-session compares had lost.

The committed per-query timing is still the new-HEAD entry whose
min-iteration is lower (whole iterations[] entry kept so env counters stay
consistent), with both passes' mins recorded under "pass_mins".

usage: merge_bench.py <passA.json> <passB.json> <out.json>
                      [prev.json] [report.md] [prevA.json] [prevB.json]
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
    if q is None:
        return None
    es = [it["elapsed"] for it in q["iterations"] if it.get("row_count", 0) >= 0]
    return min(es) if es else None


def main():
    pa, pb, out = sys.argv[1:4]
    prev_path = sys.argv[4] if len(sys.argv) > 4 else None
    report_path = sys.argv[5] if len(sys.argv) > 5 else None
    prev_a_path = sys.argv[6] if len(sys.argv) > 6 else None
    prev_b_path = sys.argv[7] if len(sys.argv) > 7 else None

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

    # previous-round data: same-window interleaved passes when available
    # (drift cancels), committed file otherwise (informational-grade).
    qpa = qpb = None
    if prev_a_path and prev_b_path:
        try:
            _, qpa = per_query(prev_a_path)
            _, qpb = per_query(prev_b_path)
        except FileNotFoundError as e:
            print(f"[merge_bench] WARNING: interleaved prev pass missing "
                  f"({e}); falling back to committed-file compare")
            qpa = qpb = None
    same_window = qpa is not None

    qp = {}
    if prev_path:
        try:
            _, qp = per_query(prev_path)
        except FileNotFoundError:
            qp = {}

    lines = []
    compare_names = sorted(set(qa) & (set(qpa) if same_window else set(qp)))
    for name in compare_names:
        ma, mb = qmin(qa[name]), qmin(qb[name])
        committed_prev = qmin(qp.get(name)) if name in qp else None
        if same_window:
            pa_min, pb_min = qmin(qpa.get(name)), qmin(qpb.get(name))
            if None in (ma, mb, pa_min, pb_min):
                lines.append(f"| {name} | — | — | — | — | "
                             "FAILED (no successful iterations) |")
                continue
            ra, rb = ma / pa_min, mb / pb_min
            cells = (f"| {name} | {pa_min:.1f} / {pb_min:.1f} "
                     f"| {ma:.1f} | {mb:.1f} ")
        else:
            if None in (ma, mb, committed_prev):
                lines.append(f"| {name} | {committed_prev} | {ma} | {mb} | — | "
                             "FAILED (no successful iterations) |")
                continue
            ra, rb = ma / committed_prev, mb / committed_prev
            cells = f"| {name} | {committed_prev:.1f} | {ma:.1f} | {mb:.1f} "
        if ra > 1.2 and rb > 1.2:
            flag = "REGRESSED (both passes)"
        elif ra < 1 / 1.2 and rb < 1 / 1.2:
            flag = "improved (both passes)"
        elif (ra > 1.2) != (rb > 1.2):
            flag = "window noise (one pass only)"
        else:
            continue
        lines.append(cells + f"| {ra:.2f}x / {rb:.2f}x | {flag} |")

    if same_window:
        prev_col = "prev-HEAD same-window min ms (A / B)"
        mode = ("SAME-WINDOW (interleaved previous-HEAD passes: "
                f"`{prev_a_path}` `{prev_b_path}`; drift-corrected by "
                "construction)")
    else:
        prev_col = "prev committed min ms"
        mode = (f"committed-file (`{prev_path}`) — CROSS-WINDOW, subject "
                "to host drift")
    header = (
        "# Two-pass bench compare (flag rule: reproduced in BOTH passes)\n\n"
        f"passes: `{pa}` `{pb}`; compare mode: {mode}\n\n"
        f"| query | {prev_col} | passA min | passB min | ratios | verdict |\n"
        "|---|---|---|---|---|---|\n")
    report = header + "\n".join(lines) + "\n"
    if report_path:
        with open(report_path, "w") as f:
            f.write(report)
    reproduced = [l for l in lines if "REGRESSED" in l]
    print(f"[merge_bench] {len(out_queries)} queries merged; "
          f"{len(reproduced)} reproduced regressions, "
          f"{sum('noise' in l for l in lines)} one-pass noise deltas "
          f"({'same-window' if same_window else 'cross-window'} compare)")
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
