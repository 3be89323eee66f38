#!/usr/bin/env python3
"""Regenerate bench_priors.json from a full local Bench log.

Usage: python3 tools/bench_to_priors.py <bench_log> [out_json]

Reads the log's `{"metric":"runs",...}` detail line and computes each
query's figure the way Bench does (lower median of the fastest 3
successful runs). Carried queries (rotating heavy pool) appear in the
runs map as their single recorded prior, so they round-trip unchanged.
"""
import json
import sys


def main(log_path, out_path="bench_priors.json"):
    runs_line = None
    for ln in open(log_path):
        if '"metric":"runs"' in ln:
            runs_line = ln[ln.index("{"):]
    if runs_line is None:
        raise SystemExit("no runs line in " + log_path)
    runs = json.loads(runs_line)["runs"]
    priors = {}
    for name, arr in runs.items():
        times = [arr[i] for i in range(0, len(arr), 2) if arr[i] >= 0]
        kept = sorted(times)[:3]
        if kept:
            priors[name] = round(kept[(len(kept) - 1) // 2], 3)
    json.dump(priors, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(priors)} queries")


if __name__ == "__main__":
    main(*sys.argv[1:])
