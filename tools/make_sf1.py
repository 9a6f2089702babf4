#!/usr/bin/env python3
"""Build an sf1-scale dataset as 10 key-shifted replicas of sf0.1.

Every id column is shifted by a single global offset (replica_i * 10M), so
all intra-replica joins (custkey, orderkey, partkey, suppkey, user_id,
doc_id/vec_id) stay referentially intact and replicas never collide.
region/nation are fixed-cardinality dims and stay as-is (their keys are
referenced by shifted tables unchanged). To avoid a pathological 10x
exact-duplicate corpus, replica i>0 documents get a short text suffix
(n_chars updated to match — the generator preserves the n_chars==len(text)
invariant) and embeddings get a tiny deterministic perturbation on dim 0.

Physical parquet types are preserved via pyarrow (notably events.ts is
TIMESTAMP(NANOS), which the engine reads with nanosAsLong — a DuckDB COPY
would silently rewrite it to micros and change the schema Spark sees).

Usage: python3 tools/make_sf1.py [src_sfdir] [out_dir] [n_replicas]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
NREP = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000  # > every key max at sf0.1 (largest is o_orderkey 149,999)

ID_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

import os
os.makedirs(OUT, exist_ok=True)

for t in ["region", "nation"]:
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{OUT}/{t}.parquet")
    print(f"{t}: copied")

for t, ids in ID_COLS.items():
    base = pq.read_table(f"{SRC}/{t}.parquet")
    schema = pa.schema([base.schema.field(i) for i in range(len(base.schema))])
    reps = []
    for i in range(NREP):
        cols = []
        for name in base.column_names:
            col = base.column(name)
            if name in ids:
                col = pc.add(col, pa.scalar(i * OFF, type=col.type))
            elif t == "documents" and name == "text" and i > 0:
                col = pc.binary_join_element_wise(
                    col, pa.scalar(f"r{i}"), " ")
            elif t == "documents" and name == "n_chars" and i > 0:
                # keep the n_chars == length(text) invariant after the
                # suffix (" r{i}" — length varies once i reaches 10)
                col = pc.add(col, pa.scalar(len(f"r{i}") + 1, type=col.type))
            elif t == "embeddings" and name == "embedding" and i > 0:
                flat = col.combine_chunks()
                vals = pc.list_flatten(flat).to_numpy(zero_copy_only=False)
                import numpy as np
                vals = vals.copy()
                dims = len(vals) // len(flat)
                vals[::dims] += np.float32(i * 1e-3)
                col = pa.ListArray.from_arrays(
                    flat.offsets, pa.array(vals, type=pa.float32()))
                col = col.cast(base.schema.field(name).type)
            cols.append(col)
        reps.append(pa.table(cols, schema=schema))
    out = pa.concat_tables(reps)
    pq.write_table(out, f"{OUT}/{t}.parquet")
    print(f"{t}: {base.num_rows} -> {out.num_rows}")
