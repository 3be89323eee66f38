#!/usr/bin/env python3
"""Fold one or more tools/check.py logs into a CORRECTNESS-style JSON.

Usage: python3 tools/checklog_to_json.py out.json log1 [log2 ...]
Later logs override earlier entries per query (so a targeted re-run of
a fixed query supersedes the full sweep's row). Only PASS/FAIL lines
are read; the driver-style fields that a plain log can't distinguish
(schema vs hash) are set from the FAIL reason prefix.
"""
import json
import re
import sys


def main(out_path, logs):
    entries = {}
    for path in logs:
        for ln in open(path):
            m = re.match(r"PASS (\S+) \((\d+) rows\)", ln)
            if m:
                n = int(m.group(2))
                entries[m.group(1)] = {
                    "rows_match": True, "schema_match": True,
                    "hash_match": True, "spark_rows": n, "oracle_rows": n,
                    "err": None}
                continue
            m = re.match(r"FAIL (\S+): (.*)", ln.rstrip())
            if not m:
                continue
            name, reason = m.group(1), m.group(2)
            e = {"rows_match": True, "schema_match": True,
                 "hash_match": True, "spark_rows": None, "oracle_rows": None,
                 "err": None}
            if reason.startswith("error:"):
                e.update(err=reason, rows_match=False, schema_match=False,
                         hash_match=False)
            else:
                if "schema:" in reason:
                    e["schema_match"] = False
                rm = re.search(r"rows: oracle=(\d+) spark=(\d+)", reason)
                if rm:
                    e.update(rows_match=False,
                             oracle_rows=int(rm.group(1)),
                             spark_rows=int(rm.group(2)))
                if "hash:" in reason:
                    e["hash_match"] = False
                e["err"] = reason if not (rm or "hash:" in reason
                                          or "schema:" in reason) else None
            entries[name] = e
    with open(out_path, "w") as f:
        json.dump(dict(sorted(entries.items())), f, indent=1)
    n_pass = sum(1 for e in entries.values()
                 if e["rows_match"] and e["schema_match"] and e["hash_match"])
    print(f"{out_path}: {len(entries)} queries, {n_pass} pass")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
