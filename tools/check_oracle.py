#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each test parquet as a DuckDB view, runs every oracle_sql.json
query, and compares (schema-insensitively: columns sorted by name,
rows sorted, values stringified with float rounding) against the
Spark-written parquet under <verifyOutDir>/<name>/.

Driver parity (VERDICT r10 task #3): both sides are fetched THROUGH
ARROW (duckdb .arrow() → to_pylist) rather than the Python-native
fetchall() path, and any output column wider than 64 bits — HUGEINT,
UHUGEINT, DECIMAL precision > 18 — on EITHER the oracle DESCRIBE or
the Spark parquet schema fails the row outright. The Python fetch
stringifies int128/decimal128 identically on both engines, which
false-greened a driver-red type class two rounds running (r9
graph_hits int128, r10 q9/rate_outliers decimal128); the driver's
Arrow canonicalization does not.
"""
import sys, json, glob, math, decimal

import duckdb

from lint_oracle_types import wider_than_64

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)  # share the %.10g path; avoids '38273.2300' vs '38273.23'
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in idx) for r in rows)
    return [cols[i] for i in idx], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            # Driver-parity guard: the driver canonicalizes through Arrow,
            # which hashes 128-bit values (HUGEINT/UHUGEINT and
            # decimal128) differently than a 64-bit column with the same
            # values. Fail the row on EITHER schema so the local gate can
            # never false-green that class (r9 int128, r10 decimal128).
            desc = con.execute(f"DESCRIBE (\n{sql}\n)").fetchall()
            wide = [(c, t) for c, t, *_ in desc if wider_than_64(t)]
            if wide:
                print(f"FAIL {name}: oracle emits >64-bit column(s) the "
                      f"driver hashes differently: {wide} — cast the "
                      f"final projection to BIGINT/DOUBLE/VARCHAR")
                continue
            tbl = con.execute(sql).arrow()
            ocols = tbl.column_names
            orows = list(zip(*[c.to_pylist() for c in tbl.columns])) \
                if tbl.num_columns else []
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        spark_src = ("read_parquet([" +
                     ",".join(f"'{f}'" for f in files) + "])")
        sdesc = con.execute(
            f"DESCRIBE (SELECT * FROM {spark_src})").fetchall()
        swide = [(c, t) for c, t, *_ in sdesc if wider_than_64(t)]
        if swide:
            print(f"FAIL {name}: spark result emits >64-bit column(s) the "
                  f"driver hashes differently: {swide} — cast the final "
                  f"projection to long/double/string")
            continue
        tbl = con.execute(f"SELECT * FROM {spark_src}").arrow()
        scols = tbl.column_names
        srows = list(zip(*[c.to_pylist() for c in tbl.columns])) \
            if tbl.num_columns else []
        oc, orows_c = frame(orows, ocols)
        sc, srows_c = frame(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
        elif orows_c != srows_c:
            bad = next((i for i, (a, b) in enumerate(zip(orows_c, srows_c))
                        if a != b), min(len(orows_c), len(srows_c)))
            print(f"FAIL {name}: rows differ (oracle {len(orows_c)} vs spark "
                  f"{len(srows_c)}); first diff at {bad}:")
            if bad < len(orows_c):
                print(f"   oracle: {orows_c[bad]}")
            if bad < len(srows_c):
                print(f"   spark : {srows_c[bad]}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(srows_c)} rows)")
    print(f"{n_ok}/{len(oracle)} queries match")
    return 0 if n_ok == len(oracle) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
