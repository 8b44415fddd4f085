#!/usr/bin/env python3
"""Dev-only scaling-report generator (round-8 scale proof).

Usage: python3 tools/scaling.py <base_detail.json> <scaled_detail.json> \
           <factor> <out_md>

Reads two Bench detail files (the BENCH_DETAIL.json written by graft.Bench
for the same query list at two scale factors), computes per-query scaling
ratios, and writes a markdown table. A query scales "linearly with logs"
when ratio <= factor * 1.3 (the log/overhead allowance); anything above is
flagged SUPER-LINEAR for a plan fix or a documented reason.
"""
import json, sys

def main(base_path, scaled_path, factor, out_md):
    factor = float(factor)
    base = json.load(open(base_path))["queries"]
    scaled = json.load(open(scaled_path))["queries"]
    rows = []
    for q in sorted(set(base) & set(scaled)):
        b, s = base[q]["s"], scaled[q]["s"]
        # sub-100ms baselines are all fixed overhead; ratios on them are
        # noise, so floor the denominator
        ratio = s / max(b, 0.1)
        flag = ("SUPER-LINEAR" if ratio > factor * 1.3 else
                "sub-linear" if ratio < factor * 0.7 else "~linear")
        rows.append((q, b, s, ratio, flag,
                     base[q].get("rounds"), scaled[q].get("rounds")))
    lines = [
        "# SCALING — measured scale-up behavior",
        "",
        f"Per-query wall time at the base scale vs a {factor:g}x derived",
        "corpus (tools/ScaleGen: replicated keys, perturbed payloads so",
        "dedup/ANN face organic — not artificially quadratic — duplicate",
        "structure). `ratio` = scaled/base; with perfectly linear work and",
        f"no fixed overhead the ideal is {factor:g}. Queries are flagged",
        f"SUPER-LINEAR above {factor * 1.3:g} (log/overhead allowance).",
        "Both runs: graft.Bench, min over SPARK_GRAFT_PASSES=2, local[32].",
        "",
        "| query | base s | scaled s | ratio | verdict | rounds b->s |",
        "|---|---|---|---|---|---|",
    ]
    for q, b, s, r, flag, rb, rs in rows:
        rounds = f"{rb}->{rs}" if rb or rs else ""
        lines.append(f"| {q} | {b:.3f} | {s:.3f} | {r:.1f}x | {flag} |"
                     f" {rounds} |")
    n_super = sum(1 for r in rows if r[4] == "SUPER-LINEAR")
    lines += ["",
              f"**{len(rows)} queries measured; {n_super} super-linear.**"]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-3:]))

if __name__ == "__main__":
    main(*sys.argv[1:5])
