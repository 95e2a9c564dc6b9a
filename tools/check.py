#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare per query (schema, rows, values).

Comparison discipline (aligned with the driver's HASH gate, round 12):
  * floats compare by raw IEEE-754 bit pattern — NO rounding. The driver
    hashes values; a 9-dp round here passed queries the driver failed.
  * any output column (either side) whose type falls outside the
    driver-safe whitelist {BIGINT, INTEGER, DOUBLE, VARCHAR, BOOLEAN,
    TIMESTAMP, DATE} is flagged as a FAILURE ("TYPE-SMELL"). Two engines
    can agree on every value yet hash-differ on physical representation:
      - DECIMAL: aggregates widen differently (Spark sum(DECIMAL(20,4))
        -> DECIMAL(30,4), DuckDB -> DECIMAL(38,4)) — the r12 t21/st9 bug.
      - HUGEINT: DuckDB sum(BIGINT) returns INT128, which arrow surfaces
        as decimal128 while Spark emits int64 — the r13 k25/k26 bug.
    Cast decimal/hugeint aggregates to DOUBLE or BIGINT on both sides.
    The whitelist is exactly the set of types observed across all 221
    driver-green outputs (r13 sweep); anything new must be justified.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import decimal
import json
import math
import struct
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-faithful: exact bit pattern, no rounding
        return struct.pack(">d", v).hex()
    if isinstance(v, decimal.Decimal):
        # value-normalize for the diff message; the DECIMAL-SMELL flag
        # below is what actually fails the query
        return str(v.normalize())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def frame(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    data = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return names, data


SAFE_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
              "TIMESTAMP", "DATE"}


def smell_cols(rel):
    """Output columns whose physical type can hash-differ cross-engine."""
    return [(c, str(t).upper()) for c, t in zip(rel.columns, rel.types)
            if str(t).upper() not in SAFE_TYPES]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    results = {}
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json"))
    for name in names:
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_dec = smell_cols(got)
            g_cols, g_rows = frame(got.fetchall(), got.columns)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            if g_dec:
                results[name] = f"TYPE-SMELL spark cols {g_dec} (cast to a whitelist type)"
            else:
                results[name] = f"rows-only: {len(g_rows)} rows"
            continue
        try:
            want = con.sql(oracle[name])
            w_dec = smell_cols(want)
            w_cols, w_rows = frame(want.fetchall(), want.columns)
        except Exception as e:
            results[name] = f"ORACLE-FAIL {type(e).__name__} {e}"
            continue
        if g_dec or w_dec:
            results[name] = (f"TYPE-SMELL spark={g_dec} oracle={w_dec} — physical "
                             "representation hash-differs cross-engine even when values "
                             "agree; cast to a whitelist type on both sides")
        elif g_cols != w_cols:
            results[name] = f"SCHEMA-MISMATCH spark={g_cols} oracle={w_cols}"
        elif len(g_rows) != len(w_rows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(g_rows)} oracle={len(w_rows)}"
        elif g_rows != w_rows:
            bad = next(i for i, (a, b) in enumerate(zip(g_rows, w_rows)) if a != b)
            results[name] = (f"VALUE-MISMATCH at sorted-row {bad}: "
                             f"spark={g_rows[bad]} oracle={w_rows[bad]}")
        else:
            results[name] = f"OK ({len(g_rows)} rows)"
    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for name, res in sorted(results.items()):
        print(f"{name:<{width}}  {res[:300]}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
