#!/usr/bin/env python3
"""Regenerate PLANS.md's audit table from PlanAudit output.

Usage: python3 tools/plans_table.py <audit.txt> [PLANS.md]

Parses `AUDIT <name> shuffles=N broadcasts=M reads=...` lines and
replaces the contiguous block of `| ... |` table rows after the
`| query | shuffles | ...` header in PLANS.md with one row per query
(sorted by name, the PlanAudit order). Content after the table — if
any is ever added — is preserved.
"""
import re
import sys

def main(audit_path: str, plans_path: str = "PLANS.md") -> None:
    rows = []
    pat = re.compile(r"^AUDIT (\S+) shuffles=(-?\d+) broadcasts=(\d+) reads=(.*)$")
    with open(audit_path, encoding="utf-8") as f:
        for line in f:
            m = pat.match(line.strip())
            if m:
                name, sh, bc, reads = m.groups()
                rows.append(f"| {name} | {sh} | {bc} | {reads.strip()} |")
    if not rows:
        sys.exit("no AUDIT lines found")
    with open(plans_path, encoding="utf-8") as f:
        text = f.read()
    header = "| query | shuffles | broadcasts | ReadSchema(s) |"
    idx = text.index(header)
    sep_end = text.index("\n", text.index("\n", idx) + 1) + 1
    # replace only the contiguous run of table rows; keep what follows
    tail = sep_end
    while tail < len(text):
        nl = text.find("\n", tail)
        line_end = len(text) if nl == -1 else nl + 1
        if not text[tail:line_end].startswith("|"):
            break
        tail = line_end
    new_text = text[:sep_end] + "\n".join(rows) + "\n" + text[tail:]
    with open(plans_path, "w", encoding="utf-8") as f:
        f.write(new_text)
    print(f"wrote {len(rows)} rows to {plans_path}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "PLANS.md")
