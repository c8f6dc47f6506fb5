#!/usr/bin/env python3
"""Round-start fixture probe: print each driver table's physical schema and
flag drift from what the engine expects. The r13/r14 breakage (driver
silently switched events.ts from timestamp[ns] to timestamp[us]) cost two
rounds because nothing looked at the fixture; this costs seconds.

Usage: python3 tools/schemaprobe.py [sf_dir ...]   (default: all three SFs)

Exit 1 on any drift so it can gate a round-start checklist.
"""
import glob
import os
import sys

import pyarrow.parquet as pq


def read_schema(path):
    # driver tables are single files; DataGen writes Spark-style directories
    if os.path.isdir(path):
        parts = sorted(glob.glob(f"{path}/part-*.parquet")) or \
            sorted(glob.glob(f"{path}/*.parquet"))
        return pq.read_schema(parts[0])
    return pq.read_schema(path)

# expectation per table: {column: arrow-type-string}. Only columns whose
# physical encoding the engine's loaders branch on are pinned — a benign
# driver change elsewhere should not fail the probe.
PINNED = {
    "events": {"ts": {"timestamp[us]", "timestamp[ns]", "int64"}},
    "lineitem": {"l_shipdate": {"timestamp[us]", "timestamp[ns]"}},
    "orders": {"o_orderdate": {"timestamp[us]", "timestamp[ns]"}},
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(dirs):
    drift = 0
    for d in dirs:
        print(f"== {d}")
        for t in TABLES:
            try:
                sch = read_schema(f"{d}/{t}.parquet")
            except Exception as e:
                print(f"  {t}: UNREADABLE ({e})")
                drift += 1
                continue
            cols = {f.name: str(f.type) for f in sch}
            pins = PINNED.get(t, {})
            flagged = {c: ty for c, ty in cols.items()
                       if c in pins and ty not in pins[c]}
            pin_note = " ".join(f"{c}={cols.get(c, 'MISSING')}" for c in pins)
            status = "DRIFT " + str(flagged) if flagged else "ok"
            print(f"  {t}: {len(cols)} cols {pin_note} [{status}]")
            drift += len(flagged)
    if drift:
        print(f"DRIFT: {drift} pinned column(s) changed encoding — "
              "check graft.ops.tbl's type-switch covers the new form")
        sys.exit(1)
    print("no drift")


if __name__ == "__main__":
    main(sys.argv[1:] or [f"/root/testdata/sf{s}" for s in
                          ("0.001", "0.01", "0.1")])
