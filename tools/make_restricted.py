#!/usr/bin/env python3
"""Deterministic sub-corpus of a replica-scaled SF directory (VERDICT r9
item #6): keep documents/embeddings whose id % MOD == 0, leave every other
table untouched. Because the replica offset (10,000,000) is divisible by
16, id % 16 == 0 is REPLICA-CLOSED: every replica of a kept base row is
kept, so cross-replica duplicate clusters — the structure the sf10 gate
exists to exercise — survive the restriction intact. Both engines read the
same restricted parquet, so the restriction is identical on both sides by
construction, and DuckDB's replay oracles (minhash sigs, k-means Lloyd
unrolls, kNN-graph projections) finish under the per-query cap.

Physical parquet types are preserved via pyarrow (same reason as
make_sf1.py: a DuckDB COPY would rewrite events.ts).

Usage: python3 tools/make_restricted.py <src_sfdir> <out_dir> [mod]
"""
import os
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1]
OUT = sys.argv[2]
MOD = int(sys.argv[3]) if len(sys.argv) > 3 else 16

RESTRICT = {"documents": "doc_id", "embeddings": "vec_id"}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

os.makedirs(OUT, exist_ok=True)
for t in TABLES:
    tab = pq.read_table(f"{SRC}/{t}.parquet")
    if t in RESTRICT:
        keep = pc.equal(pc.bit_wise_and(tab.column(RESTRICT[t]),
                                        MOD - 1), 0)
        out = tab.filter(keep)
        print(f"{t}: {tab.num_rows} -> {out.num_rows} (id % {MOD} == 0)")
    else:
        out = tab
        print(f"{t}: copied ({tab.num_rows})")
    pq.write_table(out, f"{OUT}/{t}.parquet")
