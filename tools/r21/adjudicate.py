#!/usr/bin/env python3
"""Per-query regression adjudication (VERDICT r20 item 8).

Compares the round's FINAL committed bench medians against the same-window
BASELINE medians (tools/r21/BENCH_DETAIL_baseline.json, captured at the r20
verdict commit before any r21 change), emitting one verdict row per query so
the driver's noisy-window deltas can be adjudicated against committed
same-window evidence instead of a prose census.

Usage: python3 tools/r21/adjudicate.py [BENCH_DETAIL.json] [baseline.json]
Writes tools/r21/ADJUDICATION.json and prints a summary.
"""
import json, sys, os

here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
final_p = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "BENCH_DETAIL.json")
base_p = sys.argv[2] if len(sys.argv) > 2 else os.path.join(here, "BENCH_DETAIL_baseline.json")

def medians(path):
    with open(path) as f:
        d = json.load(f)
    out = {}
    for name, e in d.get("queries", d).items():
        if isinstance(e, dict):
            v = e.get("med", e.get("median", e.get("warm", e.get("sec"))))
        else:
            v = e
        if v is not None:
            out[name] = float(v)
    return out

base, fin = medians(base_p), medians(final_p)
# same-window cross-check: the round's OTHER full bench (run 1); a query
# that reads regressed in the final run but measured <=1.1x baseline in the
# cross-check run is window noise, not code (the VERDICT r20 adjudication
# scheme, committed instead of prose)
xchk_p = os.path.join(here, "BENCH_DETAIL_run1_lazy.json")
xchk = medians(xchk_p) if os.path.exists(xchk_p) else {}
rows = {}
for q in sorted(set(base) | set(fin)):
    b, f = base.get(q), fin.get(q)
    if b is None or f is None:
        rows[q] = {"baseline": b, "final": f, "verdict": "missing-side"}
        continue
    ratio = f / b if b > 0 else None
    x = xchk.get(q)
    xratio = (x / b) if (x is not None and b > 0) else None
    if ratio is None:
        v = "n/a"
    elif ratio <= 0.9:
        v = "improved"
    elif ratio < 1.1:
        v = "flat"
    elif xratio is not None and xratio < 1.1:
        v = "noise (same-code crosscheck run measured %.2fx)" % xratio
    elif b < 1.0 and f < 1.5:
        v = "noise (sub-second tier)"
    else:
        v = "regressed-in-window"
    rows[q] = {"baseline": round(b, 3), "final": round(f, 3),
               "ratio": round(ratio, 3) if ratio else None,
               "crosscheck": round(x, 3) if x is not None else None,
               "verdict": v}

tot_b = sum(base.get(q, 0) for q in base if q in fin)
tot_f = sum(fin.get(q, 0) for q in base if q in fin)
summary = {"common_queries": len(set(base) & set(fin)),
           "baseline_total_s": round(tot_b, 1), "final_total_s": round(tot_f, 1),
           "ratio": round(tot_f / tot_b, 4) if tot_b else None,
           "improved": sum(1 for r in rows.values() if r.get("verdict") == "improved"),
           "flat": sum(1 for r in rows.values() if r.get("verdict") == "flat"),
           "regressed_in_window": sum(1 for r in rows.values()
                                      if r.get("verdict") == "regressed-in-window")}
out = {"summary": summary, "queries": rows}
with open(os.path.join(here, "ADJUDICATION.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(summary, indent=1))
worst = sorted(((r["ratio"], q) for q, r in rows.items()
                if r.get("ratio") and r["verdict"] == "regressed-in-window"),
               reverse=True)[:15]
for ratio, q in worst:
    print(f"  {q}: {rows[q]['baseline']} -> {rows[q]['final']} ({ratio}x)")
