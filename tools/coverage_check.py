#!/usr/bin/env python3
"""Coverage-doc parity check (round-4 verdict item 5): every gate query
key must appear verbatim in COVERAGE.md, so the coverage claim stays
auditable as the gate grows. Keys come from the newest CORRECTNESS_r*.json
(the driver's own record of SparkEntry.queries), falling back to a dump
path passed as argv[1] (a directory containing oracle_sql.json).
Exit 0 = parity; exit 1 = missing keys listed on stderr.
"""
import glob
import json
import re
import sys


def gate_keys():
    if len(sys.argv) > 1:
        return sorted(json.load(open(sys.argv[1] + "/oracle_sql.json")).keys())
    runs = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not runs:
        sys.exit("no CORRECTNESS_r*.json found and no dump dir given")
    return sorted(json.load(open(runs[-1])).keys())


def main():
    cov = open("COVERAGE.md").read()
    missing = [k for k in gate_keys()
               if not re.search(r"\b" + re.escape(k) + r"\b", cov)]
    if missing:
        print("gate keys not mentioned in COVERAGE.md:", ", ".join(missing),
              file=sys.stderr)
        sys.exit(1)
    print(f"COVERAGE.md parity OK ({len(gate_keys())} gate keys all mentioned)")


if __name__ == "__main__":
    main()
