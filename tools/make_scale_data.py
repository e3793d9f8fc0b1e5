#!/usr/bin/env python3
"""Dev-only scale-probe data builder (the ScaleProbe input).

Replicates <sfDir>/events.parquet N times — event_ids offset to stay
dense-and-unique, timestamps shifted past the source span per copy so
time semantics stay sane — and symlinks every other table unchanged.
pyarrow is used (not DuckDB) so the parquet physical types, including
events.ts TIMESTAMP(NANOS), survive byte-exact.

Usage: python3 tools/make_scale_data.py <sfDir> <outDir> [N=10]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, n: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/events.parquet")
    n_rows = t.num_rows
    span_ns = pc.max(t["ts"]).cast(pa.int64()).as_py() - \
        pc.min(t["ts"]).cast(pa.int64()).as_py() + 60_000_000_000
    copies = []
    for k in range(n):
        c = t
        c = c.set_column(c.schema.get_field_index("event_id"), "event_id",
                         pc.add(c["event_id"], k * n_rows))
        shifted = pc.add(c["ts"].cast(pa.int64()), k * span_ns) \
            .cast(pa.timestamp("ns"))
        c = c.set_column(c.schema.get_field_index("ts"), "ts", shifted)
        copies.append(c)
    big = pa.concat_tables(copies)
    pq.write_table(big, f"{out_dir}/events.parquet")
    for name in TABLES:
        dst = f"{out_dir}/{name}.parquet"
        if not os.path.lexists(dst):  # lexists: repair broken links too
            # abspath: a relative sf_dir would otherwise produce a link
            # that resolves relative to out_dir (broken)
            os.symlink(os.path.abspath(f"{sf_dir}/{name}.parquet"), dst)
    print(f"wrote {big.num_rows} events ({n}x {n_rows}) to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
