#!/usr/bin/env python3
"""Build an N-fold scaled copy of a testdata dir for scaling measurements.

Facts and their FK partners are replicated with a uniform +i*OFFSET on every
join/id key (joins and groupings keep exactly their per-copy structure; text
payloads repeat, so dedup families see a realistic 3x duplication load).
Dimension tables keyed by nation/region stay single-copy, so their FK columns
are deliberately NOT offset. Output goes under /tmp (never /root/testdata).

Usage: python3 tools/scale_corpus.py /root/testdata/sf0.1 /tmp/sfx3 3
"""
import sys
import duckdb

SRC, DST, N = sys.argv[1], sys.argv[2], int(sys.argv[3])
OFFSET = 10_000_000  # > every key in sf0.1 (max l_orderkey ~ 600k)

# columns to offset per table; nationkey/regionkey reference the un-scaled dims
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
SINGLE_COPY = ["nation", "region"]

import os
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for t, keys in OFFSET_COLS.items():
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
    sel = ", ".join(
        f"{c} + i * {OFFSET} AS {c}" if c in keys else c for c in cols)
    copies = ", ".join(f"({i})" for i in range(N))
    con.execute(
        f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet' "
        f"CROSS JOIN (VALUES {copies}) v(i)) TO '{DST}/{t}.parquet'")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: x{N} -> {n}")
for t in SINGLE_COPY:
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet'")
    print(f"{t}: single copy")
