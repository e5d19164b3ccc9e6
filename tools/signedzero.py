#!/usr/bin/env python3
"""Scan every oracle's DuckDB result for -0.0 payloads.

The driver's correctness gate hashes raw float payloads, where IEEE -0.0
(0x8000000000000000) differs from +0.0 even though compare.py's tolerance
and SQL equality both call them equal. Spark's BigDecimal HALF_UP round
never emits -0.0, DuckDB's round keeps the sign — so ANY -0.0 in an oracle
result is a latent driver-hash mismatch (the r9 sample_weighted_k defect).
Usage: python3 tools/signedzero.py <sf_dir> <verify_out_dir>
Exit 1 if any oracle emits -0.0 (prints query/column); the fix is the house
`+ 0.0` normalization applied to BOTH the op and the oracle expression.
"""
import json
import math
import struct
import sys

import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    try:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    except duckdb.Error:
        pass

def neg_zero(x):
    return isinstance(x, float) and x == 0.0 and math.copysign(1.0, x) < 0

bad = []
for name, sql in sorted(oracle.items()):
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        for row in cur.fetchall():
            hit = [c for c, v in zip(cols, row) if neg_zero(v)]
            if hit:
                bad.append((name, hit))
                break
    except duckdb.Error as e:
        print(f"SKIP {name}: {str(e).splitlines()[0][:100]}")

if bad:
    for name, cols in bad:
        print(f"NEGZERO {name}: columns {cols}")
    sys.exit(1)
print(f"{len(oracle)} oracles scanned, no -0.0 payloads")
