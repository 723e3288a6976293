#!/usr/bin/env python3
"""Merge bracket sources into the two-column BRACKETS.json.

Inputs:
  - BRACKETS.json            (current: flat seconds or {"fam":..,"solo":..})
  - a full-bench artifact    (BENCH_FULL.json shape; its extra_queries are
                              family-cold walls under the frozen composition)
  - target/bench_solo.json   (optional; SPARK_GRAFT_BENCH_SOLO output:
                              name -> {"wall":..})

Rules: existing `fam` values are KEPT (they are recorded medians); extras
missing a fam bracket get the artifact's family-cold reading (provisional
single reading). `solo` is filled/overwritten from the solo file when
present. Output is the object form for every extra.

Usage: python3 tools/merge_brackets.py BENCH_FULL.json [target/bench_solo.json]
"""
import json
import sys

bench = json.load(open(sys.argv[1]))
extras = bench["extra_queries"]

cur_raw = json.load(open("BRACKETS.json"))
note = cur_raw.pop("_note", "")
cur = {}
for k, v in cur_raw.items():
    cur[k] = dict(v) if isinstance(v, dict) else {"fam": v}

solo = {}
if len(sys.argv) > 2:
    solo = {k: v["wall"] for k, v in json.load(open(sys.argv[2])).items()}

out = {}
added_fam = []
for q, w in extras.items():
    entry = cur.get(q, {})
    if "fam" not in entry:
        entry["fam"] = round(w, 2)
        added_fam.append(q)
    if q in solo:
        entry["solo"] = round(solo[q], 2)
    out[q] = entry

new_note = (
    "Per-extra brackets at sf0.1 under the frozen BenchFamilies composition "
    "(machine-readable twin of BASELINE.md's bracket tables; consumed by "
    "graft.Bench's end-of-run outlier rerun). `fam` = family-cold wall "
    "seconds (recorded medians where BASELINE.md lists reps; otherwise a "
    "single family-cold reading from the most recent clean full-bench run, "
    "provisional). `solo` = solo-cold wall seconds (one query per fresh "
    "child JVM, one rep) - the rerun pass's like mode; the rerun verdict is "
    "rerun_wall/solo. The rerun TRIGGER stays wall > 2x fam (the mode the "
    "first reading came from)."
)
final = {"_note": new_note}
for q in sorted(out):
    final[q] = out[q]
json.dump(final, open("BRACKETS.json", "w"), indent=1)
have_solo = sum(1 for v in out.values() if "solo" in v)
print(f"extras: {len(out)}, new fam entries: {len(added_fam)}, with solo: {have_solo}")
if added_fam:
    print("added fam (provisional):", ", ".join(sorted(added_fam)))
