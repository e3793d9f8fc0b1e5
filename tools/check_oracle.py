#!/usr/bin/env python3
"""Local dev-only mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [gateJsonlOut]

Reads each <name>/ parquet dump produced by graft.Verify plus
oracle_sql.json, runs the oracle SQL in DuckDB against views over the
same parquet tables, sorts columns by name on both sides, and compares
values cell-by-cell. Exits nonzero on any mismatch.

Gate-record survivability (VERDICT r12 item 1): the driver's
CORRECTNESS_rN came back `{}` three rounds running because a mid-pass
kill found either no record (pre-r12: written only at the END) or a
half-written one. Two defenses, same tail-survival trick that fixed
Verify and Bench:
 (a) the gate record is JSON LINES, one line appended + flushed per
     completed check — a kill at ANY point leaves a valid, gradeable
     prefix;
 (b) checks run CHEAPEST-FIRST by the committed per-query cost table
     (tools/oracle_costs.json, regenerated from each full pass via
     --dump-costs), so the handful of expensive oracles (q133, q108,
     q115, q209) run LAST and a partial pass still grades the bulk of
     the surface. Unknown (new) queries default to cost 0 and run
     early, stamping their real cost into the next table.
Each line carries the check's wall seconds, so the committed
GATE_rN.jsonl doubles as the oracle cost record.
"""
import json
import math
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

COSTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "oracle_costs.json")


def load_costs():
    try:
        with open(COSTS_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def main(sf_dir: str, out_dir: str, jsonl_out: str = None,
         dump_costs: bool = False) -> int:
    record = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    stream = open(jsonl_out, "w") if jsonl_out else None

    def emit(obj):
        if stream:
            stream.write(json.dumps(obj, sort_keys=True) + "\n")
            stream.flush()
            os.fsync(stream.fileno())

    costs = load_costs()
    # cheapest-first: a killed pass grades the most queries possible;
    # ties (and new queries at cost 0) break by name for determinism
    ordered = sorted(oracles.items(),
                     key=lambda kv: (costs.get(kv[0], 0.0), kv[0]))
    emit({"meta": {"sf_dir": sf_dir, "out_dir": out_dir,
                   "n_total": len(ordered), "order": "cheapest_first",
                   "costs_known": sum(1 for n, _ in ordered if n in costs)}})

    failures = 0
    for name, sql in ordered:
        t0 = time.time()
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            record[name] = {"status": "FAIL", "reason": str(e)[:200],
                            "sec": round(time.time() - t0, 3)}
            emit({"q": name, **record[name]})
            failures += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            record[name] = {"status": "FAIL",
                            "reason": f"columns {list(got.columns)} != {list(want.columns)}",
                            "sec": round(time.time() - t0, 3)}
            emit({"q": name, **record[name]})
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            record[name] = {"status": "FAIL",
                            "reason": f"rows {len(got)} != {len(want)}",
                            "sec": round(time.time() - t0, 3)}
            emit({"q": name, **record[name]})
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
        sec = round(time.time() - t0, 3)
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} oracle={b!r}")
            record[name] = {"status": "FAIL",
                            "reason": f"col={c} row={i} spark={a!r} oracle={b!r}",
                            "sec": sec}
            failures += 1
        else:
            note = f" [dtype diff: {dtype_mismatch}]" if dtype_mismatch else ""
            print(f"OK   {name}: {len(got)} rows ({sec:.2f}s){note}")
            record[name] = {"status": "OK", "rows": len(got), "sec": sec}
            if dtype_mismatch:
                record[name]["dtype_diff"] = [list(d) for d in dtype_mismatch]
        emit({"q": name, **record[name]})
    # final summary line: its presence distinguishes a COMPLETE pass
    # from a killed one (whose JSONL prefix is still gradeable)
    summary = {
        "sf_dir": sf_dir,
        "n_checked": len(record),
        "n_ok": sum(1 for v in record.values() if v["status"] == "OK"),
        "n_fail": failures,
    }
    emit({"summary": summary})
    if stream:
        stream.close()
        print(f"wrote {jsonl_out}: {summary['n_ok']}/{summary['n_checked']} OK")
    if dump_costs:
        # regenerate the committed cost table from this full pass so the
        # next pass's cheapest-first order reflects today's oracles
        with open(COSTS_PATH, "w") as f:
            json.dump({n: v["sec"] for n, v in sorted(record.items())},
                      f, indent=1, sort_keys=True)
        print(f"wrote {COSTS_PATH} ({len(record)} entries)")
    return failures


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--dump-costs"]
    sys.exit(1 if main(argv[0], argv[1],
                       argv[2] if len(argv) > 2 else None,
                       dump_costs="--dump-costs" in sys.argv) else 0)
