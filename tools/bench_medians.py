#!/usr/bin/env python3
"""Median per query across the 6 protocol runs (dedup repeated per-query
emissions within a run by keeping the FIRST occurrence — Bench re-emits
each record before the summary for tail-capture).

Artifact arms are reported in TWO labeled modes (r16 verdict #2): the
"query" records are the WARM mode (Bench clears the graft_* tmp roots
and pre-warms the artifact arms before timing), and the "query_cold"
records are each artifact arm's rebuild-from-clean-roots cost, written
to cold_medians.json."""
import json, statistics, sys, pathlib

d = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "bench_r9")
runs = []
cold_runs = []
for f in sorted(d.glob("*.json")):
    if f.name in ("medians.json", "cold_medians.json"):
        continue
    per = {}
    cold = {}
    for line in f.read_text().splitlines():
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if r.get("metric") == "query" and r["name"] not in per:
            if r["value"] < 0:
                sys.exit(f"ERROR: {f.name} has err row for {r['name']}")
            per[r["name"]] = r["value"]
        elif r.get("metric") == "query_cold" and r["name"] not in cold:
            if r["value"] < 0:
                sys.exit(f"ERROR: {f.name} has err cold row for {r['name']}")
            cold[r["name"]] = r["value"]
    runs.append((f.name, per))
    if cold:
        cold_runs.append((f.name, cold))

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

if cold_runs:
    cnames = sorted({n for _, c in cold_runs for n in c})
    cmed = {n: round(statistics.median(c[n] for _, c in cold_runs if n in c), 4)
            for n in cnames}
    cout = d / "cold_medians.json"
    cout.write_text("{\n" + ",\n".join(
        f' "{n}": {v:.4f}' for n, v in cmed.items()) + "\n}\n")
    print(f"{len(cnames)} artifact arms COLD (rebuild from clean roots), "
          f"median-sum {sum(cmed.values()):.1f} s -> {cout}")
    for n in cnames:
        w = med.get(n)
        print(f"  {n}: cold {cmed[n]:.3f} s, warm "
              f"{w:.3f} s" if w is not None else f"  {n}: cold {cmed[n]:.3f} s")
