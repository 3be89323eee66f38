#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
testdata parquet tables, loads the Spark result parquet from
<outdir>/<name>/, and compares: schema (column names), row count, and a
hash over the value matrix with columns sorted by name and rows sorted.

Usage: python3 tools/check.py <sfDir> <outDir>
(Only a dev-loop tool: the production library is pure Scala/Spark.)
"""
import hashlib
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    # the .df() fetch path yields numpy scalars/arrays: unwrap to Python
    # values BEFORE the type checks, otherwise arrays fall to str() (which
    # numpy truncates to ~8 sig digits and summarizes with '...')
    if hasattr(v, "tolist") and not isinstance(v, (bytes, str)):
        v = v.tolist()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # shortest repr, stable across engines for identical doubles
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x02")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single-file tables; locally-generated
        # sets (MakeSf1) are Spark part-file directories
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            # Fetch via pandas (.df()) to mirror the driver's hasher exactly:
            # DuckDB HUGEINT (e.g. SUM over integers) becomes float64 there,
            # so a fetchall() path would mask typing mismatches (round-1 bug).
            odf = con.sql(sql).df()
            ocols = [c.lower() for c in odf.columns]
            orows = list(odf.itertuples(index=False, name=None))
            sdf = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            scols = [c.lower() for c in sdf.columns]
            srows = list(sdf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(ocols) != sorted(scols):
            problems.append(f"schema: oracle={sorted(ocols)} spark={sorted(scols)}")
        if len(orows) != len(srows):
            problems.append(f"rows: oracle={len(orows)} spark={len(srows)}")
        if not problems:
            oh = table_hash(ocols, orows)
            sh = table_hash(scols, srows)
            if oh != sh:
                # find first differing row for debugging
                oset = {"\x01".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
                sset = {"\x01".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows}
                only_o = list(oset - sset)[:2]
                only_s = list(sset - oset)[:2]
                problems.append(f"hash: oracle_only={only_o} spark_only={only_s}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
