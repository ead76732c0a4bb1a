#!/usr/bin/env python3
"""Seed/refresh BENCH_RECORD.json: the per-line MIN across recent FULL
bench artifacts (committed BENCH_FULL.json versions in git history).

The stall tripwire in graft.Bench anchors to this record instead of the
latest BENCH_FULL.json: the latest artifact inherits whatever host
weather its run saw (r14 ran at ~2x), so a 4x-of-latest tripwire let a
23.8 s stall on a 5.9 s query escape by 4 s. The min across the last K
full runs is the honest per-line record (r12's 390.997 s driver run for
most lines). graft.Bench also self-maintains the record: every clean
full run at the same SF folds its per-line min pass into this file.

Usage: python3 tools/make_record.py [K]   (default: last 6 full versions)
"""
import json
import subprocess
import sys


def full_versions(limit):
    out = subprocess.run(
        ["git", "log", "--format=%H", "--", "BENCH_FULL.json"],
        capture_output=True, text=True, check=True).stdout.split()
    kept = []
    for h in out:
        blob = subprocess.run(["git", "show", f"{h}:BENCH_FULL.json"],
                              capture_output=True, text=True).stdout
        try:
            d = json.loads(blob)
        except Exception:
            continue
        qs = d.get("queries", {})
        # full suite only: partial/filtered artifacts must not set records
        if d.get("sf") == "/root/testdata/sf0.1" and len(qs) >= 280:
            kept.append((h, qs))
        if len(kept) >= limit:
            break
    return kept


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    versions = full_versions(k)
    record = {}
    for h, qs in versions:
        for q, t in qs.items():
            if q not in record or t < record[q]:
                record[q] = t
    out = {
        "sf": "/root/testdata/sf0.1",
        "metric": "per_line_record",
        "sources": [h for h, _ in versions],
        "record": {q: record[q] for q in sorted(record)},
    }
    with open("BENCH_RECORD.json", "w") as f:
        json.dump(out, f, separators=(",", ":"))
        f.write("\n")
    print(f"{len(record)} lines from {len(versions)} artifacts; "
          f"sum of records {sum(record.values()):.1f} s")


if __name__ == "__main__":
    main()
