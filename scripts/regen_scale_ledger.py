"""Regenerate SCALE.md's scaled-oracle ledger block from
SCALED_ORACLE.json (round-11 verdict item 1: the round-11 tree shipped
with the ledger pinned at 59 queries while the artifact had grown to
95 — the pin test `tests/test_scale.py::
test_scale_md_ledger_matches_scaled_oracle_artifact` was red). Closing
new cells now ends with running this script; the pin test keeps the
two in sync from then on.

Usage: python scripts/regen_scale_ledger.py
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    art_path = os.path.join(REPO, "SCALED_ORACLE.json")
    md_path = os.path.join(REPO, "SCALE.md")
    with open(art_path) as fh:
        art = json.load(fh)
    want = {
        name: sorted(d for d, cell in dirs.items() if cell.get("match"))
        for name, dirs in art.items()
    }
    want = {k: v for k, v in want.items() if v}
    nq = len(want)
    nc = sum(len(v) for v in want.values())
    lines = "\n".join(
        f"- {name}: {', '.join(dirs)}" for name, dirs in sorted(want.items())
    )

    with open(md_path) as fh:
        md = fh.read()
    pat = re.compile(
        r"(Scaled-oracle ledger after this round — hash-green "
        r"\(match: true\)\ncells in SCALED_ORACLE\.json \()"
        r"\d+ queries, \d+ cells"
        r"(\);\ntests/test_scale\.py pins this list key-for-key against "
        r"the artifact:\n\n)"
        r"(?:- [^\n]*\n)+",
        re.S,
    )
    new_md, n = pat.subn(
        lambda m: f"{m.group(1)}{nq} queries, {nc} cells{m.group(2)}{lines}\n",
        md,
    )
    if n != 1:
        print(f"ERROR: ledger block matched {n} times in SCALE.md", flush=True)
        return 1
    with open(md_path, "w") as fh:
        fh.write(new_md)
    print(f"SCALE.md ledger regenerated: {nq} queries, {nc} cells")
    return 0


if __name__ == "__main__":
    sys.exit(main())
