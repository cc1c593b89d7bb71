#!/usr/bin/env python3
"""Oracle-type lint: fail if any SparkEntry.oracleSql query would hand
the driver an int128 column.

Usage: python3 tools/lint_oracle_types.py <sfDir> <oracle_sql.json>

DuckDB widens sum(BIGINT) to HUGEINT; the driver canonicalizes results
through Arrow, where int128 stringifies as a float ("62374.0" vs
"62374") and flips the hash while leaving row count and column names
intact — the exact r9 graph_hits escape. Every integer-summing oracle
must CAST(... AS BIGINT). This lint DESCRIBEs every oracle (so it also
catches plain SQL syntax/binding errors without materializing results)
and rejects HUGEINT/UHUGEINT output columns.
"""
import sys, json

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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
        wide = [(c, t) for c, t, *_ in desc if "HUGEINT" in str(t).upper()]
        if wide:
            bad += 1
            print(f"LINT-FAIL {name}: int128 output column(s) {wide} — "
                  f"wrap the sum in CAST(... AS BIGINT)")
    print(f"{len(oracle) - bad}/{len(oracle)} oracles lint clean")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
