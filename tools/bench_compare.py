#!/usr/bin/env python3
"""Cross-round bench comparison on canary-NORMALIZED medians.

Usage: bench_compare.py OLD.json NEW.json [--flag 1.3]

Each input is a full bench JSON line (BENCH_FULL.json, or a BENCH_r*.json
whose tail happens to carry queries_norm). Raw medians are NOT compared —
the host swings 2-4x between rounds; queries_norm projects every timing
onto the healthy reference host via the interleaved canary, which is the
only number comparable across rounds (round-11/12 verdicts).

Falls back to reconstructing normalized medians from `runs` + canary
samples when `queries_norm` was truncated away (pre-round-13 artifacts).
"""
import json
import re
import statistics
import sys


def scavenge(text):
    """Recover field objects from a truncated bench line. Driver tails
    keep only the LAST ~2000 chars, so the usual survivor is a
    front-truncated `runs` map: salvage every complete "q_x":[...]
    entry before "errors" and take per-query medians from those."""
    out = {}
    for field in ("queries_norm", "queries", "queries_min", "runs"):
        m = re.search(r'"%s":\{(.*?)\}[,}]' % field, text)
        if m:
            try:
                out[field] = json.loads("{" + m.group(1) + "}")
            except json.JSONDecodeError:
                pass
    if "runs" not in out and '"errors"' in text:
        body = text[: text.index('"errors"')].rstrip().rstrip(",")
        if body.endswith("}"):
            body = body[:-1]
        # drop the torn leading entry, keep complete ones
        first = body.find(',"q_')
        if first >= 0:
            try:
                out["runs"] = json.loads("{" + body[first + 1:] + "}")
            except json.JSONDecodeError:
                pass
    m = re.search(r'"canary":(\{.*?\]\]\})', text)
    if m:
        try:
            out["canary"] = json.loads(m.group(1))
        except json.JSONDecodeError:
            pass
    return out


def load(path):
    text = open(path).read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        return scavenge(text)
    if "tail" in doc and "queries" not in doc:
        # driver BENCH_r*.json wrapper: the bench line lives (truncated)
        # in the `tail` string
        return doc.get("parsed") or scavenge(doc["tail"])
    return doc


def norm_medians(doc):
    """Canary-normalized per-query medians, best effort: queries_norm
    when present; otherwise raw medians scaled by a FLAT
    healthy_ref/canary factor (the interleaved per-position
    interpolation is lost with the truncated tail, but the flat factor
    still removes the dominant round-to-round host swing). Returns
    (medians, exactly_normalized)."""
    if "queries_norm" in doc:
        return ({k: v for k, v in doc["queries_norm"].items() if v >= 0}, True)
    raw = ({k: statistics.median(v) for k, v in doc.get("runs", {}).items()
            if v and v[0] >= 0}
           or {k: v for k, v in doc.get("queries", {}).items() if v >= 0})
    c = doc.get("canary", {})
    samples = [s[1] for s in c.get("samples", [])]
    if samples:
        factor = c.get("healthy_ref_sec_sf01", 0.15) / statistics.median(samples)
        return ({k: v * factor for k, v in raw.items()}, False)
    return (raw, False)


def min_runs(doc):
    """Per-query MIN of runs — the contention-robust lower bound:
    co-scheduled load can only inflate a run, never deflate it, so a
    query whose min did NOT regress was slowed by the host, not the
    code (round-16 verdict: the driver bench medianed q_embed_outliers
    39.7s under external load vs 1.5s clean — min-of-runs would have
    exonerated the code immediately)."""
    if "queries_min" in doc:
        return {k: v for k, v in doc["queries_min"].items() if v >= 0}
    return {k: min(v) for k, v in doc.get("runs", {}).items()
            if v and v[0] >= 0}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flag = 1.3
    for i, a in enumerate(sys.argv):
        if a == "--flag":
            flag = float(sys.argv[i + 1])
    old_doc, new_doc = load(args[0]), load(args[1])
    (old, old_exact), (new, new_exact) = norm_medians(old_doc), norm_medians(new_doc)
    if not (old_exact and new_exact):
        print("WARNING: flat-factor canary normalization on at least one "
              "side (queries_norm truncated away) — per-position host "
              "drift within that suite is not corrected", file=sys.stderr)
    common = sorted(set(old) & set(new))
    if not common:
        print("no comparable queries", file=sys.stderr)
        sys.exit(2)
    old_min, new_min = min_runs(old_doc), min_runs(new_doc)
    rows = [(k, old[k], new[k], new[k] / old[k]) for k in common]
    # A real code regression must show in BOTH the normalized median
    # AND the min-of-runs (contention can inflate a median but never a
    # clean min); a median-only flag is demoted to contention-suspect.
    def min_regressed(k):
        if k not in old_min or k not in new_min or old_min[k] <= 0:
            return True  # no min data -> can't exonerate, keep the flag
        return new_min[k] / old_min[k] > flag
    candidates = [r for r in rows if r[3] > flag]
    regressions = [r for r in candidates if min_regressed(r[0])]
    suspects = [r for r in candidates if not min_regressed(r[0])]
    improvements = [r for r in rows if r[3] < 1 / flag]
    print(f"{len(common)} comparable queries | "
          f"sum ratio {sum(r[2] for r in rows) / sum(r[1] for r in rows):.2f} | "
          f"flagged >{flag}x: {len(regressions)} "
          f"(+{len(suspects)} contention-suspect, min-of-runs clean)")
    for title, rs in (("REGRESSIONS (median AND min regressed)", regressions),
                      ("CONTENTION-SUSPECT (median regressed, min clean)", suspects),
                      ("improvements", improvements)):
        if rs:
            print(f"\n{title}:")
            for k, o, n, ratio in sorted(rs, key=lambda r: -r[3]):
                extra = ""
                if k in old_min and k in new_min and old_min[k] > 0:
                    extra = f"  [min {old_min[k]:.2f} -> {new_min[k]:.2f}]"
                print(f"  {k:30s} {o:7.2f} -> {n:7.2f}  ({ratio:.2f}x){extra}")
    # --cite q1,q2: paste-ready provenance lines with RAW numbers read
    # straight from the two artifacts — commit messages must quote
    # THESE, not a stray intermediate run (round-17 verdict #5: a
    # commit claimed 12.7->7.9 s while its own artifact said 14.5).
    cite = None
    for i, a in enumerate(sys.argv):
        if a == "--cite":
            cite = [q.strip() for q in sys.argv[i + 1].split(",") if q.strip()]
    if cite:
        old_raw = {k: v for k, v in old_doc.get("queries", {}).items()}
        new_raw = {k: v for k, v in new_doc.get("queries", {}).items()}
        print(f"\nPASTE-READY raw numbers ({args[0]} -> {args[1]}):")
        for k in cite:
            o, n = old_raw.get(k), new_raw.get(k)
            om, nm = old_min.get(k), new_min.get(k)
            def f(v):
                return "?" if v is None else f"{v:.2f}"
            print(f"  {k}: median {f(o)} -> {f(n)} s (min {f(om)} -> {f(nm)})")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
