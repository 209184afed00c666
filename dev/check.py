#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tool only — the
shipped library is pure Scala/Spark; this script just saves round-trips).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 dev/check.py /root/testdata/sf0.01 /tmp/verify_out`.

For each query: load Spark's parquet result, run the oracle SQL in DuckDB
over views of the same tables, sort columns by name + rows by all columns,
compare values exactly (doubles: exact bits, with a tolerance fallback
reported separately).
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {str(e)[:200]}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        exact = True
        close = True
        for c in got.columns:
            a, b = got[c].values, want[c].values
            if a.dtype.kind == "f" or (hasattr(b, "dtype") and b.dtype.kind == "f"):
                af = a.astype(float)
                bf = b.astype(float)
                if not ((af == bf) | (np.isnan(af) & np.isnan(bf))).all():
                    exact = False
                    if not np.allclose(af, bf, rtol=1e-9, atol=1e-12, equal_nan=True):
                        close = False
                        bad = np.where(~np.isclose(af, bf, rtol=1e-9, equal_nan=True))[0][:3]
                        print(f"  {name}.{c} diff rows {bad}: {af[bad]} vs {bf[bad]}")
            else:
                if not (pd.Series(a).fillna("∅") == pd.Series(b).fillna("∅")).all():
                    exact = False
                    close = False
                    bad = np.where(pd.Series(a).fillna("∅") != pd.Series(b).fillna("∅"))[0][:3]
                    print(f"  {name}.{c} diff rows {bad}: {a[bad]} vs {b[bad]}")
        if exact:
            print(f"PASS {name} ({len(got)} rows)")
        elif close:
            print(f"WARN {name}: values close but not bit-exact")
            failures += 1
        else:
            print(f"FAIL {name}: value mismatch")
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle-exact")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
