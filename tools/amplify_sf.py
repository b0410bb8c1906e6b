#!/usr/bin/env python3
"""FK-consistent fixture amplifier: sf0.1 -> ~sf1 (default K=10).

Purpose (VERDICT r13 item 7): a THIRD correctness scale factor. The
driver gates at sf0.01 and the self-run refresh at sf0.1; this tool
amplifies the sf0.1 parquet fixtures 10x so the same Verify + DuckDB
oracle machinery (`check.py --sf /tmp/graft_sf1 <names>`) can pin a
subset of the registry at a 100x spread from the smallest gate —
scale-dependent wrongness (overflow, precision drift, tie instability,
partition-order sensitivity) that neither smaller SF can reach.

Scaling model = TPC-H style replication with key offsets:
  - region/nation stay FIXED (dimension realism: 5 regions, 25 nations);
  - every other table is replicated K times with each PRIMARY and
    FOREIGN key shifted by copy_index * OFFSET (1e9, far above any base
    key), so copy i of lineitem joins copy i of orders/part/supplier —
    join cardinality scales exactly Kx, never K^2;
  - event/document/embedding payloads (ts, text, vectors) are copied
    VERBATIM: group densities grow 10x, which is the stress we want.
    Near-dup pair queries are excluded from the sf1 subset (identical
    text copies would quadratically inflate candidate pairs — that
    regime is ScaleDedupBench's, with its controlled dup_pct).

Correctness claim is PARITY, not realism: Spark and DuckDB read the
same amplified files, so any deterministic amplification is a valid
oracle point.
"""
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 1_000_000_000

# table -> columns to shift by copy*OFF (primary + foreign keys)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1")
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied fixed")
    for t, keys in KEYED.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
        sel = ", ".join(
            f"{c} + i * {OFF} AS {c}" if c in keys else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
            f"range({k}) AS copies(i)) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows ({k}x, keys shifted: {', '.join(keys)})")


if __name__ == "__main__":
    main()
