#!/usr/bin/env python3
"""Local dev-only mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet dump produced by graft.Verify plus
oracle_sql.json, runs the oracle SQL in DuckDB against views over the
same parquet tables, sorts columns by name on both sides, and compares
values cell-by-cell. Exits nonzero on any mismatch.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        dtype_mismatch = [
            (c, str(got[c].dtype), str(want[c].dtype))
            for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        bad = None
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c].tolist(), want[c].tolist())):
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    if a != b:  # exact: the driver hashes, no tolerance
                        bad = (c, i, a, b)
                        break
                elif a != b:
                    # pandas NaN vs None for nullable ints
                    if (a is None or (isinstance(a, float) and math.isnan(a))) and \
                       (b is None or (isinstance(b, float) and math.isnan(b))):
                        continue
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} oracle={b!r}")
            failures += 1
        else:
            note = f" [dtype diff: {dtype_mismatch}]" if dtype_mismatch else ""
            print(f"OK   {name}: {len(got)} rows{note}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
