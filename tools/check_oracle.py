#!/usr/bin/env python3
"""Local correctness check mimicking the driver: for each query result
parquet in OUTDIR, run the oracle SQL in DuckDB against the same sf dir
and compare rows/schema/values (columns sorted by name, rows sorted)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        try:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        except Exception:
            pass
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        df = df.reset_index(drop=True)
    return df

results = {}
names = sorted(d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d)))
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        results[name] = {"status": "NO_RESULT"}
        continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle:
        results[name] = {"status": "ROWS_ONLY", "rows": len(got)}
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        results[name] = {"status": "ORACLE_SQL_ERROR", "err": str(e)[:200]}
        continue
    g, e = canon(got), canon(exp)
    schema_match = list(g.columns) == list(e.columns)
    rows_match = len(g) == len(e)
    val_match = False
    if schema_match and rows_match:
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=1e-5, atol=1e-8)
            val_match = True
        except Exception as ex:
            results[name] = {"status": "VALUES_DIFF", "detail": str(ex)[:300]}
            continue
    if schema_match and rows_match and val_match:
        results[name] = {"status": "OK", "rows": len(g)}
    else:
        results[name] = {"status": "MISMATCH", "schema_match": schema_match,
                         "rows_spark": len(g), "rows_oracle": len(e),
                         "cols_spark": list(g.columns)[:12], "cols_oracle": list(e.columns)[:12]}

ok = sum(1 for r in results.values() if r["status"] == "OK")
rows_only = sum(1 for r in results.values() if r["status"] == "ROWS_ONLY")
print(f"== {ok} OK / {rows_only} rows-only / {len(results)} total ==")
for n, r in results.items():
    if r["status"] not in ("OK",):
        print(n, json.dumps(r)[:400])
