#!/usr/bin/env python3
"""Extended scale-ladder slope check: sf0.1 -> sf0.3 -> sf1.

Usage: python3 tools/slopes_ext.py BENCH_FULL.json BENCH_SF03.json BENCH_SF1.json

Reads the canary-NORMALIZED per-query medians from three bench runs at
1x / 3x / 10x data (the sf0.3 and sf1 dirs are ScaleGen's isomorphic
replications of sf0.1, so per-query work should scale at most linearly
in the factor) and reports, per query:

  - t at each rung (normalized seconds)
  - exponent alpha = log(t_sf1 / t_sf01) / log(10)   (1.0 = linear)
  - flag SUPERLINEAR if alpha > 1.15 and t_sf1 > 1s (overhead-dominated
    sub-second queries measure the constant term, not the slope)
  - flag BUDGET if t_sf1 > 3 * 10 * t_sf01 (the round-14 "no query >3x
    its sf0.1 wall-time beyond the data ratio" criterion)

Writes SLOPES_EXT.json next to the inputs. Dev tool only (driver-side
python); the shipped library is pure Scala/Spark.
"""
import json, math, sys

def norm(path):
    d = json.load(open(path))
    qs = d.get("queries_norm") or d.get("queries")
    return {k: v for k, v in qs.items() if isinstance(v, (int, float)) and v > 0}

def main():
    p01, p03, p1 = sys.argv[1], sys.argv[2], sys.argv[3]
    t01, t03, t1 = norm(p01), norm(p03), norm(p1)
    rows, flags = [], []
    for q in sorted(t01):
        if q not in t03 or q not in t1:
            continue
        a, b, c = t01[q], t03[q], t1[q]
        alpha = math.log(c / a) / math.log(10)
        superlinear = alpha > 1.15 and c > 1.0
        budget = c > 3 * 10 * a
        rows.append({"query": q, "sf01": round(a, 3), "sf03": round(b, 3),
                     "sf1": round(c, 3), "alpha": round(alpha, 3),
                     "superlinear": superlinear, "budget_exceeded": budget})
        if superlinear or budget:
            flags.append(q)
    out = {"inputs": [p01, p03, p1], "data_ratios": [1, 3, 10],
           "flagged": flags, "rows": rows}
    with open("SLOPES_EXT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"{len(rows)} queries | flagged: {flags or 'none'}")
    print(f"{'query':30s} {'sf0.1':>8s} {'sf0.3':>8s} {'sf1':>8s} {'alpha':>7s}")
    for r in sorted(rows, key=lambda r: -r["alpha"])[:15]:
        mark = " <-- FLAG" if r["query"] in flags else ""
        print(f"{r['query']:30s} {r['sf01']:8.3f} {r['sf03']:8.3f} "
              f"{r['sf1']:8.3f} {r['alpha']:7.3f}{mark}")

if __name__ == "__main__":
    main()
