#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage:
  python3 tools/check.py [--sf /root/testdata/sf0.01] [--out /tmp/graft_verify] [--skip-run] [names...]

1. runs `sbt "runMain graft.Verify <sf> <out>"` (unless --skip-run)
2. loads every parquet table from <sf> into DuckDB views
3. runs each oracle SQL from <out>/oracle_sql.json
4. compares to the Spark result parquet at <out>/<name>/ and prints a verdict

Queries with no SQL-expressible oracle (xxhash64-based minhash/simhash/LSH)
are diffed against committed golden fixtures in tools/golden/<name>.parquet
instead (deterministic seeds + sorted output make them reproducible).
Regenerate with --bless after an intentional semantic change — and say why
in the commit.

`--verify-golden` is the CI-style golden gate: run it on an untouched tree
(`python3 tools/check.py --verify-golden`) and it hard-fails if any
committed fixture drifts from the current engine output, if a fixture is
stale (no query produces it any more), or if a no-oracle query has never
been blessed. A clean pass means re-blessing would be a no-op — the
property that guards against accidentally blessing a regression.
"""
import argparse
import json
import math
import struct
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# No-oracle queries whose full output is too large to commit as a fixture
# at the LARGER scale factors (q105 at sf0.1 is ~4M pair rows): instead of
# a rows-only pass, they get the q105c checksum discipline at ROW
# granularity — a committed prefix fixture (first N rows of the
# canonically-sorted dump, value-compared like any golden) plus a sidecar
# with the total row count and an ORDER-INDEPENDENT 64-bit row-content
# checksum over the ENTIRE result. Any added/dropped/changed pair anywhere
# in the 4M rows moves the checksum; the prefix pins concrete values.
# sf0.01 keeps full fixtures (small), so this applies only to other SFs.
# `key` is the query's canonical sort key: the prefix compare is positional
# against the dump's own ordering, which is only sound when that key is a
# TOTAL order — so the check asserts the key is unique and the dump is
# sorted by it before trusting head(n). A future entry with a tying key
# fails loudly instead of flaking on ties.
PREFIX_GOLDEN = {
    "q105_simhash_pairs": {"n": 1000, "key": ["id_a", "id_b"]},
    # r16 (VERDICT r15 item 8 / r14 item 5): the remaining no-oracle
    # queries join the same discipline at sf0.1. Their outputs are small
    # (pairs/top-k), so the "prefix" is the whole result — the value the
    # sidecar adds over the old full-parquet fixtures is the total-order
    # sort-key assertion plus the v2 order-independent whole-output
    # checksum, the same three-way pin q105 carries.
    "q104_minhash_pairs": {"n": 1000, "key": ["id_a", "id_b"]},
    "q108_ann_lsh": {"n": 1000, "key": ["query_id", "rank"]},
}


def _encode_col(s: pd.Series) -> list:
    """Canonical per-dtype cell encoding (v2): library-repr-independent
    fixed byte forms, vectorized column-wise. ints -> 'i'+int64le raw,
    floats -> 'f'+IEEE754le raw, bools -> 'b'+1 byte, datetimes ->
    't'+epoch-micros int64le raw, missing -> 'N', strings/other ->
    's'+utf8. str(v) never touches a typed scalar, so a pandas/numpy
    repr change can't move blessed checksums."""
    n = len(s)
    if pd.api.types.is_datetime64_any_dtype(s):
        raw = s.astype("datetime64[us]").to_numpy().view("<i8").tobytes()
        nat = s.isna().to_numpy()
        return [b"N" if nat[i] else b"t" + raw[8 * i:8 * i + 8] for i in range(n)]
    if pd.api.types.is_bool_dtype(s) and not s.isna().any():
        a = s.to_numpy().astype(np.uint8)
        return [b"b\x01" if a[i] else b"b\x00" for i in range(n)]
    if pd.api.types.is_integer_dtype(s) and not s.isna().any():
        raw = s.to_numpy().astype("<i8", copy=False).tobytes()
        return [b"i" + raw[8 * i:8 * i + 8] for i in range(n)]
    if pd.api.types.is_float_dtype(s):
        raw = s.to_numpy().astype("<f8", copy=False).tobytes()
        return [b"f" + raw[8 * i:8 * i + 8] for i in range(n)]
    out = []
    for v in s.to_numpy():
        if v is None or (isinstance(v, float) and math.isnan(v)):
            out.append(b"N")
        elif isinstance(v, (float, np.floating)):
            out.append(b"f" + struct.pack("<d", float(v)))
        elif isinstance(v, (bool, np.bool_)):
            out.append(b"b\x01" if v else b"b\x00")
        elif isinstance(v, (int, np.integer)):
            out.append(b"i" + struct.pack("<q", int(v)))
        elif isinstance(v, bytes):
            out.append(b"y" + v)
        else:
            out.append(b"s" + str(v).encode())
    return out


def rowhash_sum(df: pd.DataFrame) -> str:
    """Order-independent content checksum: md5 each row's canonical cell
    bytes (columns sorted by name, encoding v2 per _encode_col), sum the
    first 8 bytes of each digest mod 2^64. Commutative sum => row order
    never matters; md5 per row => any cell change moves the total.
    Cell encoding is vectorized column-wise; the row loop only joins
    pre-encoded bytes and hashes."""
    import hashlib
    d = canon(df)
    cols = [_encode_col(d[c]) for c in d.columns]
    md5 = hashlib.md5
    total = 0
    join = b"|".join
    for row in zip(*cols):
        h = md5(join(row)).digest()
        total = (total + int.from_bytes(h[:8], "little")) % (1 << 64)
    return f"{total:016x}"


def load_spark_result(outdir: Path, name: str) -> pd.DataFrame:
    d = outdir / name
    files = sorted(d.glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet under {d}")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif isinstance(df[c].dtype, pd.ArrowDtype) or str(df[c].dtype) == "object":
            pass
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # Bitwise-strict: the driver hashes the raw bytes, so -0.0 != +0.0
        # there. `==` hid exactly that (q248 r9/r10). The mirror must be at
        # least as strict as the thing it mirrors.
        return struct.pack("<d", a) == struct.pack("<d", b)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if (pd.isna(a)) != (pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(name: str, spark: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    s, o = canon(spark), canon(oracle)
    if list(s.columns) != list(o.columns):
        problems.append(f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}")
        return problems
    if len(s) != len(o):
        problems.append(f"row count differs: spark={len(s)} oracle={len(o)}")
        return problems
    # order-sensitive compare first; fall back to sorted compare info
    mismatch_cells = []
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        for i in range(len(sv)):
            if not values_equal(sv[i], ov[i]):
                mismatch_cells.append((i, c, sv[i], ov[i]))
                if len(mismatch_cells) > 5:
                    break
        if len(mismatch_cells) > 5:
            break
    if mismatch_cells:
        for i, c, a, b in mismatch_cells[:5]:
            problems.append(f"row {i} col {c}: spark={a!r} oracle={b!r}")
    # dtype report (informational)
    for c in s.columns:
        if str(s[c].dtype) != str(o[c].dtype):
            problems.append(f"dtype note {c}: spark={s[c].dtype} oracle={o[c].dtype}")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/graft_verify")
    ap.add_argument("--skip-run", action="store_true")
    ap.add_argument("--bless", action="store_true",
                    help="(re)write tools/golden fixtures for no-oracle queries")
    ap.add_argument("--verify-golden", action="store_true",
                    help="CI-style golden gate: every committed fixture must have a "
                         "matching, value-identical result in the dump, and every "
                         "no-oracle query must have a fixture — both directions hard-fail. "
                         "Guards against blessing a regression or leaving stale fixtures.")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    # golden fixtures are SF-specific by construction (the no-oracle
    # queries' outputs depend on the corpus): the legacy flat layout
    # serves the default sf0.01 gate, other SFs read/bless
    # tools/golden/<sfname>/.
    root_golden = Path(__file__).resolve().parent / "golden"
    sf_base = Path(args.sf).name
    golden_dir = root_golden if sf_base == "sf0.01" else root_golden / sf_base

    outdir = Path(args.out)
    if not args.skip_run:
        name_filter = f" {','.join(args.names)}" if args.names else ""
        r = subprocess.run(
            ["sbt", f'runMain graft.Verify {args.sf} {args.out}{name_filter}'],
            cwd="/root/repo", capture_output=True, text=True)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-30:])
        if r.returncode != 0:
            print(tail)
            sys.exit(1)
        for line in (r.stdout + r.stderr).splitlines():
            if "[verify]" in line:
                print(line)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    oracle_sql = json.loads((outdir / "oracle_sql.json").read_text())
    golden_names = ({p.stem[:-7] if p.stem.endswith(".prefix") else p.stem
                     for p in golden_dir.glob("*.parquet")}
                    if golden_dir.is_dir() else set())
    # include result dirs too: a new rows-only query (no oracle, no
    # fixture yet) must show up in default runs so --bless can create
    # its first fixture instead of silently skipping it
    dumped = {p.name for p in outdir.iterdir() if p.is_dir()} if outdir.is_dir() else set()
    names = args.names or sorted(set(oracle_sql) | golden_names | dumped)
    ok = fail = 0
    for name in names:
        if name not in oracle_sql:
            pg = PREFIX_GOLDEN.get(name) if sf_base != "sf0.01" else None
            pn = pg["n"] if pg else None
            fixture = golden_dir / (f"{name}.prefix.parquet" if pn else f"{name}.parquet")
            sidecar = golden_dir / f"{name}.prefix.json"
            try:
                sdf = load_spark_result(outdir, name)
            except Exception as e:
                print(f"FAIL {name}: spark result missing: {e}")
                fail += 1
                continue
            if args.bless:
                # only bless explicitly named queries: result dirs persist
                # across runs, so a default-run bless would mint fixtures
                # from stale dirs of renamed/removed queries and turn the
                # gate red with 'spark result missing' forever after
                if name not in args.names:
                    print(f"-- {name}: skipped by --bless (name it explicitly to bless)")
                    continue
                golden_dir.mkdir(parents=True, exist_ok=True)
                if pn:
                    mi = pd.MultiIndex.from_frame(sdf[pg["key"]])
                    if not (mi.is_unique and mi.is_monotonic_increasing):
                        print(f"FAIL {name}: refusing to bless prefix golden — "
                              f"key {pg['key']} not a total order over the dump")
                        fail += 1
                        continue
                    sdf.head(pn).to_parquet(fixture, index=False)
                    sidecar.write_text(json.dumps({
                        "prefix_rows": int(min(pn, len(sdf))),
                        "total_rows": int(len(sdf)),
                        "sort_key": pg["key"],
                        "encoding": "v2",
                        "rowhash_sum": rowhash_sum(sdf)}, indent=1))
                    print(f"ok   {name} ({len(sdf)} rows)  [blessed PREFIX golden: "
                          f"first {min(pn, len(sdf))} rows + order-free checksum]")
                else:
                    sdf.to_parquet(fixture, index=False)
                    print(f"ok   {name} ({len(sdf)} rows)  [blessed golden fixture]")
                ok += 1
                continue
            if not fixture.exists() or (pn and not sidecar.exists()):
                if args.verify_golden:
                    print(f"FAIL {name}: no-oracle query has no committed golden fixture "
                          f"(run check.py --bless {name} and commit tools/golden/{name}"
                          + (".prefix.parquet + .prefix.json)" if pn else ".parquet)"))
                    fail += 1
                else:
                    print(f"-- {name}: no oracle SQL and no golden fixture (rows-only op)")
                continue
            if pn:
                gold = pd.read_parquet(fixture)
                meta = json.loads(sidecar.read_text())
                # the dump is canonically sorted by the query itself, so its
                # head IS the blessed prefix; the sidecar extends the pin to
                # the full row set (count + order-independent content sum).
                # Positional head-compare is only sound under a total order:
                # assert the declared sort key is unique and actually sorted.
                mi = pd.MultiIndex.from_frame(sdf[pg["key"]])
                problems = []
                if not mi.is_unique:
                    problems.append(f"prefix-golden sort key {pg['key']} has "
                                    "duplicates: positional prefix compare unsound")
                elif not mi.is_monotonic_increasing:
                    problems.append(f"dump not sorted by declared key {pg['key']}")
                problems += compare(name, sdf.head(len(gold)), gold)
                if len(sdf) != meta["total_rows"]:
                    problems.append(f"total rows differ: spark={len(sdf)} "
                                    f"blessed={meta['total_rows']}")
                got = rowhash_sum(sdf)
                if got != meta["rowhash_sum"]:
                    problems.append(f"order-free row checksum differs: got {got} "
                                    f"blessed {meta['rowhash_sum']}")
            else:
                problems = compare(name, sdf, pd.read_parquet(fixture))
            hard = [p for p in problems if not p.startswith("dtype note")]
            if hard:
                print(f"FAIL {name} ({len(sdf)} rows) vs golden fixture:")
                for p in problems[:8]:
                    print(f"   {p}")
                fail += 1
            else:
                kind = "prefix golden" if pn else "golden fixture"
                print(f"ok   {name} ({len(sdf)} rows)  [{kind}]")
                ok += 1
            continue
        try:
            odf = con.execute(oracle_sql[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        try:
            sdf = load_spark_result(outdir, name)
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            fail += 1
            continue
        problems = compare(name, sdf, odf)
        hard = [p for p in problems if not p.startswith("dtype note")]
        if hard:
            print(f"FAIL {name} ({len(sdf)} rows):")
            for p in problems[:8]:
                print(f"   {p}")
            fail += 1
        else:
            notes = "; ".join(p for p in problems if p.startswith("dtype note"))
            print(f"ok   {name} ({len(sdf)} rows)" + (f"  [{notes}]" if notes else ""))
            ok += 1
    print(f"\n{ok} ok, {fail} fail, {len(names)} checked")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
