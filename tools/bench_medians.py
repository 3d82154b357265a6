#!/usr/bin/env python3
"""Median per query across the 6 protocol runs (dedup repeated per-query
emissions within a run by keeping the FIRST occurrence — Bench re-emits
each record before the summary for tail-capture)."""
import json, statistics, sys, pathlib

d = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "bench_r9")
runs = []
for f in sorted(d.glob("*.json")):
    if f.name == "medians.json":
        continue
    per = {}
    for line in f.read_text().splitlines():
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if r.get("metric") == "query" and r["name"] not in per:
            if r["value"] < 0:
                sys.exit(f"ERROR: {f.name} has err row for {r['name']}")
            per[r["name"]] = r["value"]
    runs.append((f.name, per))

names = sorted({n for _, per in runs for n in per})
for fn, per in runs:
    missing = set(names) - set(per)
    if missing:
        sys.exit(f"ERROR: {fn} missing {sorted(missing)}")

med = {n: round(statistics.median(per[n] for _, per in runs), 4) for n in names}
out = d / "medians.json"
out.write_text("{\n" + ",\n".join(f' "{n}": {v:.4f}' for n, v in med.items()) + "\n}\n")
print(f"{len(names)} queries, median-sum {sum(med.values()):.1f} s -> {out}")
for fn, per in runs:
    print(f"  {fn}: total {sum(per.values()):.1f} s")
