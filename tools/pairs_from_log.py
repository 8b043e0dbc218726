#!/usr/bin/env python3
"""Reconstruct append_bench PAIR rows from a run log — used when a staged
sweep aborts partway (require_time FATAL) after printing valid pairs, so
completed measurements are not re-paid.

Usage: pairs_from_log.py <log> <fixtureDir> <nDocs> [floor]
Emits the same JSON pair objects append_bench.sh writes.
"""
import json
import re
import sys

log, fix, ndocs = sys.argv[1], sys.argv[2], int(sys.argv[3])
floor = float(sys.argv[4]) if len(sys.argv) > 4 else None
pat = re.compile(
    r"PAIR append=(\S+) ([\d.]+)s rebuild=(\S+) ([\d.]+)s ratio=([\d.]+) "
    r"\(runs: append=([\d. ]+) rebuild=([\d. ]+)\)")
fpat = re.compile(r"FLOOR ([\d.]+)s")
pairs = []
for line in open(log):
    m = fpat.search(line)
    if m and floor is None:
        floor = float(m.group(1))
    m = pat.search(line)
    if m:
        a, at, r, rt, ratio, aruns, rruns = m.groups()
        pairs.append({
            "pair": f"{a}:{r}", "corpus": fix, "n_docs": ndocs,
            "append_s": float(at), "rebuild_s": float(rt),
            "ratio": float(ratio), "floor_s": floor,
            "runs": {"append": [float(x) for x in aruns.split()],
                     "rebuild": [float(x) for x in rruns.split()]}})
json.dump({"fixture": fix, "n_docs": ndocs, "floor_s": floor,
           "pairs": pairs}, sys.stdout, indent=1)
print()
