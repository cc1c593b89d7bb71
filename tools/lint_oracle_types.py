#!/usr/bin/env python3
"""Oracle-type lint: fail if any SparkEntry.oracleSql query would hand
the driver an output column wider than 64 bits.

Usage: python3 tools/lint_oracle_types.py <sfDir> <oracle_sql.json>

DuckDB widens sum(BIGINT) to HUGEINT; the driver canonicalizes results
through Arrow, where 128-bit values stringify differently than the
local Python fetch ("62374.0" vs "62374") and flip the hash while
leaving row count and column names intact — the r9 graph_hits escape
(int128) and the r10 q9/rate_outliers escape (decimal128). ANY output
column wider than int64/float64 — HUGEINT, UHUGEINT, or DECIMAL with
precision > 18 — is therefore rejected; 128-bit arithmetic must stay
INTERNAL and the final projection must cast to BIGINT/DOUBLE/VARCHAR.
This lint DESCRIBEs every oracle (so it also catches plain SQL
syntax/binding errors without materializing results).
"""
import sys, json, re

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def wider_than_64(type_str):
    """True for any type the driver's Arrow canonicalization cannot hash
    identically to a 64-bit value: int128 and decimal128 classes."""
    t = str(type_str).upper()
    if "HUGEINT" in t:  # HUGEINT and UHUGEINT
        return True
    m = re.search(r"DECIMAL\((\d+)\s*,", t)
    return bool(m) and int(m.group(1)) > 18


def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE (\n{sql}\n)").fetchall()
        except Exception as e:
            bad += 1
            print(f"LINT-FAIL {name}: oracle does not bind: {e}")
            continue
        wide = [(c, t) for c, t, *_ in desc if wider_than_64(t)]
        if wide:
            bad += 1
            print(f"LINT-FAIL {name}: >64-bit output column(s) {wide} — "
                  f"cast the final projection to BIGINT/DOUBLE/VARCHAR")
    print(f"{len(oracle) - bad}/{len(oracle)} oracles lint clean")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
