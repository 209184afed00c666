#!/usr/bin/env python3
"""EXPLAIN-parse every oracle in DuckDB WITHOUT executing it (dev tool).

Round-8 lesson: q_graph_degree_dist shipped with an oracle DuckDB could
not parse (duplicate CTE name), so the query reached the round artifact
untested. This guard binds + plans each oracle against empty-schema views
in a few seconds, so a parser/binder error can never survive to the gate.

Usage (after `sbt "runMain graft.Verify <sf_dir> <out_dir>"` wrote
oracle_sql.json, any scale — only schemas are read):

    python3 dev/parse_oracles.py /root/testdata/sf0.001 /tmp/verify_out
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # schema-only views: EXPLAIN binds columns but scans nothing
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            print(f"PARSE-FAIL {name}: {str(e)[:300]}")
            bad += 1
    print(f"{len(oracle) - bad}/{len(oracle)} oracles parse+bind clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
