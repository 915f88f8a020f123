#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [key ...]

Reads each <out_dir>/<name> spark parquet dump, runs the matching oracle
SQL from <out_dir>/oracle_sql.json in DuckDB (tables = views over the sf
dir parquet files), canonicalizes both sides (columns sorted by name,
rows sorted by all columns, values stringified) and diffs.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # q_scan_jsonl's oracle pins the driver's sf0.01 side-output dir;
    # when mimicking at another sf, point it at that sf's dir instead
    sf_name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        sql = sql.replace("/jsonl_scan/sf0.01/", f"/jsonl_scan/{sf_name}/")
        sql = sql.replace("/csv_scan/sf0.01/", f"/csv_scan/{sf_name}/")
        sql = sql.replace("/schema_evo/sf0.01/", f"/schema_evo/{sf_name}/")
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [c[0] for c in spark_rel.description]
            s_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        try:
            o_rel = con.execute(sql)
            o_cols = [c[0] for c in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        oc, orr = canon(o_rows, o_cols)
        if sc != oc:
            print(f"FAIL {name}: schema mismatch spark={sc} oracle={oc}")
            n_bad += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            n_bad += 1
            continue
        if sr != orr:
            bad = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs (spark vs oracle):")
            for a, b in bad:
                print(f"   spark : {a}")
                print(f"   oracle: {b}")
            n_bad += 1
            continue
        print(f"ok   {name}: {len(sr)} rows")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
