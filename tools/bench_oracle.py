#!/usr/bin/env python3
"""Time the DuckDB oracle for each headline BENCH query — the committed
per-query baseline BENCH_r{N}.json is compared against (BASELINE.md).

Mirrors graft.Bench's discipline: same SQL the correctness gate runs,
32 threads, min-of-3, full materialization (fetchall). q13's oracle SQL
in the correctness gate only aggregates (DuckDB can't see Spark's temp
dir); HERE it performs the genuine round-trip — COPY partitioned parquet,
read back with a partition filter, aggregate — so the 13-vs-oracle ratio
compares like with like.

Usage: python3 tools/bench_oracle.py [--sf /root/testdata/sf0.1] [--runs 3]
Prints one JSON line; paste/commit the table into BASELINE.md.
"""
import argparse
import json
import shutil
import tempfile
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

HEADLINE = [
    "q01_groupby_agg_low", "q03_groupby_agg_high", "q13_parquet_roundtrip",
    "q30_join_broadcast", "q31_join_smj", "q40_sort_global",
    "q50_window_cumsum", "q60_scan_filter_project", "q70_string_funcs",
    "q90_resample_hour", "q100_dedup_exact_groups",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--oracle-json", default="/tmp/graft_verify/oracle_sql.json",
                    help="oracle_sql.json from a graft.Verify dump (SQL is data-independent)")
    args = ap.parse_args()

    oracles = json.loads(Path(args.oracle_json).read_text())
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    rt_dir = Path(tempfile.mkdtemp(prefix="duck_rt_"))

    def run_query(name: str) -> None:
        if name == "q13_parquet_roundtrip":
            # the honest round-trip twin of the Spark plan: partitioned
            # write, partition-filtered read-back, aggregate
            out = rt_dir / "part_parquet"
            if out.exists():
                shutil.rmtree(out)
            con.execute(
                f"COPY part TO '{out}' (FORMAT PARQUET, PARTITION_BY (p_brand))")
            con.execute(
                f"""SELECT p_type, count(*) AS n, round(sum(p_retailprice), 2) AS total
                    FROM read_parquet('{out}/*/*.parquet', hive_partitioning = 1)
                    WHERE p_brand = 'Brand#11'
                    GROUP BY p_type ORDER BY p_type""").fetchall()
        else:
            con.execute(oracles[name]).fetchall()

    results = {}
    for name in HEADLINE:
        run_query(name)  # warmup (buffer cache, catalog)
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            run_query(name)
            times.append(time.perf_counter() - t0)
        results[name] = round(min(times), 3)
    shutil.rmtree(rt_dir, ignore_errors=True)

    total = round(sum(results.values()), 3)
    print(json.dumps({"metric": "duckdb_oracle", "unit": "sec", "threads": 32,
                      "runs": args.runs, "sf": args.sf, "total": total,
                      "queries": results}))


if __name__ == "__main__":
    main()
