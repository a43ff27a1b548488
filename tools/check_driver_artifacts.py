#!/usr/bin/env python3
"""Round-entry gate over the driver's own artifacts.

Usage: check_driver_artifacts.py  (run from the repo root at round start)

Round 8 was lost because the round-7 artifacts already contained the whole
diagnosis (23 queries missing from CORRECTNESS, bench rc=1) and nobody read
them. This check fails loudly when:

  1. the latest CORRECTNESS_r*.json is missing ANY query named in
     BENCH_FLOOR.json (the floor file is spec-pinned to contain every
     SparkEntry.queries key, so it is a build-free proxy for that set), or
     has any row that is not rows+schema+hash green;
  2. the latest BENCH_r*.json has rc != 0 or parsed == null.

Exit 0 = artifacts clean; exit 1 prints one actionable line per problem.
A missing-row failure means Verify threw BEFORE dumping that query — look
for the throw, not the comparison.
"""
import glob
import json
import re
import sys


def latest(pattern: str):
    files = sorted(glob.glob(pattern),
                   key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    return files[-1] if files else None


def main() -> int:
    problems = []
    # underscore keys (_note/_sf/_total) are floor-file metadata, not queries
    expected = {k for k in json.load(open("BENCH_FLOOR.json")) if not k.startswith("_")}

    cpath = latest("CORRECTNESS_r*.json")
    if cpath is None:
        print("no CORRECTNESS_r*.json yet (round 1?) — nothing to gate")
        return 0
    rows = json.load(open(cpath))
    missing = sorted(expected - set(rows.keys()))
    # A query the driver has NEVER reported on is new since the artifact —
    # normal mid-round state, not a Verify crash. Only a query that has a
    # row in SOME prior artifact but vanished from the latest one indicates
    # Verify threw before dumping it (the round-8 silent-failure mode).
    ever_seen = set()
    for p in glob.glob("CORRECTNESS_r*.json"):
        ever_seen.update(json.load(open(p)).keys())
    dropped = [q for q in missing if q in ever_seen]
    new = [q for q in missing if q not in ever_seen]
    if dropped:
        problems.append(
            f"{cpath}: {len(dropped)} queries have NO row (Verify threw before "
            f"dumping them): {', '.join(dropped)}")
    if new:
        print(f"note: {len(new)} queries newer than {cpath} (not yet "
              f"driver-reported): {', '.join(new)}")
    for name, r in sorted(rows.items()):
        if not (r.get("rows_match") and r.get("schema_match")
                and r.get("hash_match")):
            problems.append(f"{cpath}: {name} not green: "
                            f"rows={r.get('rows_match')} schema={r.get('schema_match')} "
                            f"hash={r.get('hash_match')} err={r.get('err')}")

    bpath = latest("BENCH_r*.json")
    if bpath:
        b = json.load(open(bpath))
        if b.get("rc") != 0:
            tail = (b.get("tail") or "")[-300:].replace("\n", " | ")
            problems.append(f"{bpath}: bench rc={b.get('rc')} — tail: ...{tail}")
        elif b.get("parsed") is None:
            problems.append(f"{bpath}: bench rc=0 but parsed=null — the JSON "
                            "line did not reach the driver's captured tail")

    if problems:
        print(f"DRIVER ARTIFACTS RED — fix these BEFORE adding operators:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"driver artifacts clean: {cpath} all green ({len(rows)} queries), "
          f"{bpath or 'no bench yet'} parsed ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
