#!/usr/bin/env python3
"""Regenerate bench_priors.json from one or more full local Bench logs.

Usage: python3 tools/bench_to_priors.py <bench_log> [more_logs...] [out.json]
(the last argument is the output path when it ends in .json and is not a
log; default bench_priors.json)

Reads each log's `{"metric":"runs",...}` detail line and computes each
query's figure the way Bench does (lower median of the fastest 3
successful runs). With MULTIPLE logs the per-query minimum is kept —
timing noise on this box is one-sided (contention only inflates), so
the fastest same-epoch quiet figure is the best steady-state estimate;
two runs also wash out the single-run degradation of whatever tail the
wall cap clipped in each. Carried queries (rotating heavy pool) appear
in a log's runs map as their single recorded prior, so they round-trip
unchanged unless another log measured them fresh.
"""
import json
import sys


def log_priors(log_path):
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
    return priors


def main(*args):
    if len(args) > 1 and args[-1].endswith(".json"):
        logs, out_path = args[:-1], args[-1]
    else:
        logs, out_path = args, "bench_priors.json"
    merged = {}
    for path in logs:
        for name, v in log_priors(path).items():
            merged[name] = min(merged.get(name, float("inf")), v)
    json.dump(dict(sorted(merged.items())), open(out_path, "w"),
              indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(merged)} queries from {len(logs)} log(s)")


if __name__ == "__main__":
    main(*sys.argv[1:])
