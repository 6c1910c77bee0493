#!/usr/bin/env python3
"""Oracle-check only the queries actually dumped in the verify out dir.

Usage: python3 tools/checkq.py <sfDir> <verifyOutDir>

Thin wrapper over selfcheck.py: trims oracle_sql.json to the query
dirs present in <verifyOutDir> (graft.Verify's optional 3rd arg dumps
a subset but writes the full oracle map), then runs the same compare.
"""
import sys, os, json, glob

out = sys.argv[2]
full = json.load(open(f"{out}/oracle_sql.json"))
present = {d for d in os.listdir(out)
           if os.path.isdir(os.path.join(out, d))}
trimmed = {k: v for k, v in full.items() if k in present}
tmp = f"{out}_trim"
os.makedirs(tmp, exist_ok=True)
json.dump(trimmed, open(f"{tmp}/oracle_sql.json", "w"))
for d in present:
    dst = os.path.join(tmp, d)
    if not os.path.islink(dst) and not os.path.exists(dst):
        os.symlink(os.path.abspath(os.path.join(out, d)), dst)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import selfcheck
selfcheck.main(sys.argv[1], tmp)
