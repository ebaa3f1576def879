#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [outDir] [sfDir] [query...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<name>/ parquet dirs and <outDir>/oracle_sql.json. Registers the
testdata tables as DuckDB views, runs each oracle, sorts columns by name and
rows by value, and diffs against the Spark result.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return str(v) if v is not None else "\x00NULL"


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        # replicate.py writes multi-file table DIRECTORIES; glob them.
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
        ).fetch_arrow_table()

        scols = sorted(sdf.column_names)
        ocols = sorted(odf.column_names)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        # The driver's hash canonicalizes arrow decimal128 / timestamp
        # columns differently on the Spark-parquet vs DuckDB-oracle side
        # (round-2 lesson: equal values still hash-mismatch). Treat any
        # such output type, on either side, as a failure.
        risky = [
            f"{src}:{f.name}={f.type}"
            for src, tbl in (("spark", sdf), ("oracle", odf))
            for f in tbl.schema
            # list/struct: the driver's pandas sort_values crashes on
            # unhashable array cells (round-5 xsl_solr_array) — serialize
            # such columns to strings in the query instead.
            if any(t in str(f.type) for t in ("decimal", "timestamp", "list", "struct"))
        ]
        if risky:
            print(f"FAIL {name}: driver-unsafe output types {risky}")
            n_fail += 1
            continue
        srows = sorted(
            (tuple(canon(r[c]) for c in scols) for r in sdf.to_pylist())
        )
        orows = sorted(
            (tuple(canon(r[c]) for c in ocols) for r in odf.to_pylist())
        )
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = [
            (a, b) for a, b in zip(srows, orows) if a != b
        ]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} row mismatches; first 3:")
            for a, b in bad[:3]:
                print(f"  spark : {a}")
                print(f"  oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
