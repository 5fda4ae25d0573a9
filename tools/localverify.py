#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (SURVEY.md §5.1).

Usage: python3 tools/localverify.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran, which
dumped one parquet dir per query plus oracle_sql.json. Replays every
oracle SQL in DuckDB (tables = views over the sf parquet files) and
compares values column-sorted; reports per-query PASS/FAIL with first
diffs. Stricter than the driver: also checks row order as produced.
"""
import json
import sys
import glob
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime, decimal, math
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # NO normalize(): the driver's hash is representation-sensitive
        # (r1: trailing-zero scale differences failed). f-format avoids
        # the unreadable '1E+2' scientific rendering.
        return f"{v:f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_rows(rel, cols):
    # positional reorder (duplicate names would alias under cols.index)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    return ([tuple(norm_cell(r[i]) for i in order) for r in rows],
            [cols[i] for i in order],
            [str(rel.types[i]) for i in order])


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            got_cols = list(got_rel.columns)
            got, gcols, gtypes = table_rows(got_rel, got_cols)
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)" if got else "rows-only EMPTY!"
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = list(exp_rel.columns)
            exp, ecols, etypes = table_rows(exp_rel, exp_cols)
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e)[:200]}"
            continue
        if gcols != ecols:
            results[name] = f"COLS-MISMATCH spark={gcols} duck={ecols}"
            continue
        if gtypes != etypes:
            # int-width / decimal-scale divergence fails the driver's hash
            # even when values print equal (VERDICT r1 mechanism).
            results[name] = f"TYPE-MISMATCH spark={gtypes} duck={etypes}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(got)} duck={len(exp)}"
            continue
        # VERDICT r6: DECIMAL output columns can compare EQUAL here (values
        # and DuckDB-read types identical) yet fail the driver's hash, which
        # is representation-sensitive (q_embed_outliers, DECIMAL(38,0)).
        # Doubles/floats risk the same via rendering. Flag them even when
        # the value compare would pass — §7.5.2 is a gate, not prose.
        unstable = [c for c, t in zip(gcols, gtypes)
                    if "DECIMAL" in t or t in ("DOUBLE", "FLOAT", "REAL")]
        if unstable:
            results[name] = f"UNSTABLE-TYPES {unstable} (decimal/double output fails the driver hash even when values match)"
            continue
        if got == exp:
            results[name] = f"PASS ({len(got)} rows)"
        elif sorted(got) == sorted(exp):
            results[name] = "ORDER-ONLY-MISMATCH (values equal when sorted)"
        else:
            diffs = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e][:3]
            results[name] = f"VALUE-MISMATCH cols={gcols} first_diffs={diffs}"
    npass = sum(1 for v in results.values() if v.startswith("PASS") or v.startswith("rows-only ("))
    for k in sorted(results):
        flag = "  " if results[k].startswith(("PASS", "rows-only (")) else "**"
        print(f"{flag} {k}: {results[k]}")
    print(f"\n{npass}/{len(results)} ok")
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
