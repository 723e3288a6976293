#!/usr/bin/env python3
"""Round-17 bracket re-record for the queries whose code changed this round.

Inputs (produced during the round, committed numbers derived here):
  - /tmp/solo_r17_rec_{1,2,3}.json : 3 solo-cold passes (changed extras)
  - /tmp/BENCH_MID_r17.json        : family-cold full run on the new code
  - target/bench_result.json       : FINAL family-cold full run (with serve)
  - /tmp/headline_runs_r17.json    : list of headline per-query dicts (new code)

Rules:
  - solo := median of the 3 passes (q_ann_mutual_nn_idx overridden by the
    paired no-cache re-record, passed in REC_OVERRIDES);
  - fam  := min(mid, final) family-cold first readings — box contention
    only inflates, so the lower clean reading is the honest family-cold
    level (same stance as the r16 builder's re-records on a loaded box);
  - __headline_<q>/__headline_total := per-query medians over the
    new-code headline readings (>= 5 runs).
Only queries listed in CHANGED are touched; every other bracket row is
preserved byte-for-byte semantics-wise (file rewritten via json).
"""
import json, statistics, sys

CHANGED = [
    "q_pl_communities", "q_pl_centrality", "q_pl_ppr",
    "q_pl_minhash_est", "q_pl_containment", "q_pl_dup_clusters",
    "q_pl_dup_clusters_star", "q_pl_leakage_split", "q_pl_incr_dedup",
    "q_pl_span_dedup", "q_pl_curation_chain", "q_pl_lm_bigram",
    "q_pl_lm_score", "q_pl_ppl_buckets", "q_ann_mutual_nn_idx",
    "q_pl_centrality_knn", "q_pl_centrality_banded",
]
REC_OVERRIDES = {"q_ann_mutual_nn_idx": 7.14}  # paired no-cache median of 3

def main():
    b = json.load(open("BRACKETS.json"))
    solos = [json.load(open(f"/tmp/solo_r17_rec_{i}.json")) for i in (1, 2, 3)]
    mid = json.load(open("/tmp/BENCH_MID_r17.json"))["extra_queries"]
    fin = json.load(open("target/bench_result.json"))["extra_queries"]
    for q in CHANGED:
        solo = REC_OVERRIDES.get(q) or round(
            statistics.median(s[q]["wall"] for s in solos), 3)
        fam = round(min(mid[q], fin[q]), 3)
        old = b.get(q, {})
        print(f"{q:30s} fam {old.get('fam')} -> {fam}   solo {old.get('solo')} -> {solo}")
        b[q] = {"fam": fam, "solo": solo}
    runs = json.load(open("/tmp/headline_runs_r17.json"))
    qs = runs[0].keys()
    total_med = round(statistics.median(sum(r.values()) for r in runs), 3)
    print(f"__headline_total {b['__headline_total']['fam']} -> {total_med}")
    b["__headline_total"] = {"fam": total_med}
    for q in qs:
        med = round(statistics.median(r[q] for r in runs), 3)
        print(f"__headline_{q}: {b.get('__headline_'+q,{}).get('fam')} -> {med}")
        b[f"__headline_{q}"] = {"fam": med}
    json.dump(b, open("BRACKETS.json", "w"), indent=1, sort_keys=True)
    print("BRACKETS.json rewritten")

if __name__ == "__main__":
    main()
