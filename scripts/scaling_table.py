#!/usr/bin/env python3
"""Dev helper: regenerate SCALING.md's per-query table from three
graft.Bench JSON lines (sf0.001, sf0.01, sf0.1). Prints the markdown
table + the max-alpha summary to stdout; the prose around it is
maintained by hand.

Usage: python3 scripts/scaling_table.py a.json b.json c.json [verify_dir]
(files in ascending sf order; each holds one Bench JSON line;
verify_dir's subdir names expand Bench's short q-keys to full names)
"""
import sys, json, math, os

def load(p):
    with open(p) as f:
        return json.loads(f.read().strip())

def main(paths):
    runs = [load(p) for p in paths[:3]]
    longname = {}
    if len(paths) > 3 and os.path.isdir(paths[3]):
        for n in os.listdir(paths[3]):
            if os.path.isdir(os.path.join(paths[3], n)):
                longname[n.split("_")[0]] = n
    qs = sorted(runs[0]["queries"])
    rows = []
    flagged = []
    mx = (0.0, "")
    for q in qs:
        t = [r["queries"].get(q) for r in runs]
        if any(v is None for v in t):
            continue
        a1 = math.log10(t[1] / t[0]) if t[0] > 0 else float("nan")
        a2 = math.log10(t[2] / t[1]) if t[1] > 0 else float("nan")
        if a2 > mx[0]:
            mx = (a2, q)
        if a2 > 1.5:
            flagged.append(q)
        rows.append((q, t[0], t[1], t[2], a1, a2))
    print("| query | t(sf0.001) s | t(sf0.01) s | t(sf0.1) s | "
          "α(0.001→0.01) | α(0.01→0.1) |")
    print("|---|---|---|---|---|---|")
    for q, t0, t1, t2, a1, a2 in rows:
        print(f"| {longname.get(q, q)} | {t0:.2f} | {t1:.2f} | {t2:.2f} | "
              f"{a1:.2f} | {a2:.2f} |")
    print()
    print(f"max α(0.01→0.1): {mx[0]:.2f} ({mx[1]}); "
          f"flagged (α > 1.5): {flagged or 'none'}")

if __name__ == "__main__":
    main(sys.argv[1:])
