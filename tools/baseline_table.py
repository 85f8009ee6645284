#!/usr/bin/env python3
"""Emit the consolidated operative per-query baseline table (r16 verdict
ask #7): ONE table covering every registered query, so per-query
regression grading is a single lookup.

Sources, by the standing convention (each cohort keeps the medians from
the round that BASELINED it):
  - r14 idle-triple medians for the 172 queries baselined in r14
    (bench_records/r14_idle_{1,2,3}b_172q.json)
  - r15 idle-triple medians for q173-q181
    (bench_records/r15_idle_{1,2,3}_181q.json)
  - r16 idle-triple medians for q182-q195
    (bench_records/r16_idle_{1,2,3}_195q.json)
  - r17 idle-triple medians for q196-q199 (q196 landed after the r16
    triple ran, so its baseline joins with the r17 cohort)
    (bench_records/r17_idle_{1,2,3}_199q.json)
  - r18 idle-triple medians for q200-q205 (q200 landed after the r17
    triple ran, so its baseline joins with the r18 cohort)
    (bench_records/r18_idle_{1,2,3}_205q.json)
  - r19 idle-triple medians for q206-q208, plus the RE-BASELINED q201
    (r19 moved its training into the shared qf_margins memo, so its
    steady-state number changed shape — the memo build is a gross
    line item, the query median is scoring only)
    (bench_records/r19_idle_{1,2,3}_209q.json)

Usage: python3 tools/baseline_table.py   # prints the markdown table
"""
import json
import statistics

REC = "bench_records/r%s_idle_%s_%sq.json"

def medians(prefix, runs, nq):
    rs = [json.load(open(REC % (prefix, i, nq))) for i in runs]
    # a triple whose runs disagree on the query set is a recording error —
    # fail with the delta instead of a bare KeyError (r16 ADVICE)
    keys = [set(r["queries"]) for r in rs]
    if any(k != keys[0] for k in keys[1:]):
        diff = set.union(*keys) - set.intersection(*keys)
        raise SystemExit(f"r{prefix} idle runs disagree on query sets; "
                         f"only-in-some: {sorted(diff)}")
    out = {}
    for q in rs[0]["queries"]:
        out[q] = round(statistics.median(r["queries"][q] for r in rs), 2)
    return out

def main():
    r14 = medians("14", ["1b", "2b", "3b"], 172)
    r15 = medians("15", [1, 2, 3], 181)
    r16 = medians("16", [1, 2, 3], 195)
    r17 = medians("17", [1, 2, 3], 199)
    r18 = medians("18", [1, 2, 3], 205)
    r19 = medians("19", [1, 2, 3], 209)
    table = dict(r14)
    for cohort in (r15, r16, r17, r18):
        for q in cohort:
            if q not in table:
                table[q] = cohort[q]
    for q in r19:
        if q not in table:
            table[q] = r19[q]
    # q201 re-baselines with the r19 cohort: its training moved into the
    # shared qf_margins memo (reported as a gross memo line item), so the
    # r18 median measured a different computation shape
    table["q201_quality_classifier"] = r19["q201_quality_classifier"]
    rows = sorted(table.items())
    half = (len(rows) + 1) // 2
    print(f"| query | s | query | s |  <!-- {len(rows)} queries -->")
    print("|---|---|---|---|")
    for i in range(half):
        left = rows[i]
        right = rows[half + i] if half + i < len(rows) else ("", "")
        print(f"| {left[0]} | {left[1]} | {right[0]} | {right[1]} |")
    # cohort accounting for the prose (health vs the r14 operative table
    # is graded on the LATEST triple)
    shared = [q for q in r14 if q in r19]
    s14 = sum(r14[q] for q in shared)
    s19 = sum(r19[q] for q in shared)
    print(f"\nshared-{len(shared)} r19/r14 ratio: {s19/s14:.3f} "
          f"({s19:.1f}s vs {s14:.1f}s)")
    worst = max(shared, key=lambda q: r19[q] / r14[q] if r14[q] > 0.05 else 0)
    print(f"worst shared ratio: {worst} {r14[worst]} -> {r19[worst]} "
          f"({r19[worst]/r14[worst]:.2f}x)")
    new15 = {q: r15[q] for q in r15 if q not in r14}
    new16 = {q: r16[q] for q in r16 if q not in r15}
    new17 = {q: r17[q] for q in r17 if q not in r16}
    new18 = {q: r18[q] for q in r18 if q not in r17}
    new19 = {q: r19[q] for q in r19 if q not in r18}
    print(f"r15 cohort sum: {sum(new15.values()):.1f}s over {len(new15)}")
    print(f"r16 cohort sum: {sum(new16.values()):.1f}s over {len(new16)}")
    print(f"r17 cohort sum: {sum(new17.values()):.1f}s over {len(new17)}")
    print(f"r18 cohort sum: {sum(new18.values()):.1f}s over {len(new18)}: "
          + ", ".join(f"{q} {v}" for q, v in sorted(new18.items(), key=lambda x: -x[1])))
    print(f"r19 cohort sum: {sum(new19.values()):.1f}s over {len(new19)}: "
          + ", ".join(f"{q} {v}" for q, v in sorted(new19.items(), key=lambda x: -x[1]))
          + f"; q201 re-baselined {r18['q201_quality_classifier']} -> "
          + f"{r19['q201_quality_classifier']} (training now in the qf_margins memo)")

if __name__ == "__main__":
    main()
