"""Summarize .bench_out two-engine runs into the BASELINE.md table data.

Reads spark_sf{X}.full.json + duck_sf{X}.json pairs and prints, per scale
factor: suite totals, twin totals, the overall ratio, capped queries, and
the biggest per-query wins/losses — the evidence chain VERDICT r04 task #1
asks to keep on record."""

import json
import os
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_out")


def load(sf):
    sp = json.load(open(f"{OUT}/spark_sf{sf}.full.json"))
    du = json.load(open(f"{OUT}/duck_sf{sf}.json"))
    return sp, du


def summarize(sf):
    sp, du = load(sf)
    twins = {k: (sp["queries"][k], du["queries"][k]) for k in du["queries"] if k in sp["queries"]}
    st = sum(v[0] for v in twins.values())
    dt = sum(v[1] for v in twins.values())
    capped = du.get("capped", [])
    print(f"== sf{sf} ==")
    print(f"spark suite total: {sp['value']:.1f}s over {len(sp['queries'])} queries"
          + (f"  FAILURES: {list(sp['failures'])}" if sp.get("failures") else ""))
    print(f"twin totals: spark {st:.1f}s vs duckdb {dt:.1f}s over {len(twins)} twins "
          f"-> {'spark ' + format(dt/st, '.2f') + 'x faster' if dt > st else 'duckdb ' + format(st/dt, '.2f') + 'x faster'}"
          + (f"  (duck CAPPED at 300s: {capped} -> duck total is a LOWER bound)" if capped else ""))
    by_ratio = sorted(twins.items(), key=lambda kv: kv[1][0] / max(kv[1][1], 1e-9))
    print("spark wins:", [(k, f"{a:.1f}s vs {b:.1f}s") for k, (a, b) in by_ratio[:6]])
    print("spark losses:", [(k, f"{a:.1f}s vs {b:.2f}s") for k, (a, b) in by_ratio[-6:]])
    if "env" in sp:
        e = sp["env"]
        print(f"env: {e['cpus']} cpus, calib {e['calib_sha256_per_sec']} sha256/s, "
              f"docs rows {e['testdata'].get('documents', {}).get('rows')}")
    print()


if __name__ == "__main__":
    for sf in (sys.argv[1:] or ["0.1", "1", "3", "10"]):
        try:
            summarize(sf)
        except FileNotFoundError as ex:
            print(f"== sf{sf} == (missing: {ex.filename})\n")
