#!/usr/bin/env python3
"""Extract per-query `## <name>` sections from docs/plans/PLANS_*.md
(the committed round-vintage plan dumps) into plans/rNN/<q>_before.txt.

Usage: extract_plans.py <git-rev> <outdir> <query> [query...]
Reads the PLANS_*.md files at the given git revision so the extracted
plans are exactly the previous round's committed ones.
"""
import subprocess
import sys
import re

rev, outdir = sys.argv[1], sys.argv[2]
queries = set(sys.argv[3:])

fams = ["analytics", "dedup", "ann", "text", "curation", "io"]
found = {}
for fam in fams:
    try:
        txt = subprocess.check_output(
            ["git", "show", f"{rev}:docs/plans/PLANS_{fam}.md"],
            text=True)
    except subprocess.CalledProcessError:
        continue
    # sections: "## <name>\n\n```\n<plan>```\n"
    for m in re.finditer(r"^## (\S+)\n\n```\n(.*?)```", txt,
                         re.M | re.S):
        name, plan = m.group(1), m.group(2)
        if name in queries:
            found[name] = plan

import os
os.makedirs(outdir, exist_ok=True)
for q in sorted(queries):
    if q not in found:
        print(f"MISSING {q}", file=sys.stderr)
        continue
    with open(f"{outdir}/{q}_before.txt", "w") as f:
        f.write(found[q])
    print(f"wrote {outdir}/{q}_before.txt")
