"""Regenerate PARITY.md's per-query oracle-evidence provenance table
from the driver's CORRECTNESS_r*.json records and the live registry.

Run from the repo root after each round:  python tools/gen_provenance.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

MARK_START = "| Query | Oracle | Evidence |"


def main() -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    osql = entry.oracle_sql()

    drawn: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            rec = json.load(fh)
        for name, res in rec.items():
            ok = res.get("hash_match") or (
                res.get("rows_match") and res.get("err") is None
            )
            if ok and name not in drawn:
                drawn[name] = rnd

    lines = [MARK_START, "|---|---|---|"]
    n_drawn = 0
    for name in sorted(qs):
        oracle = "full-value" if name in osql else "rows-only"
        if name in drawn:
            ev = f"driver r{drawn[name]} + mirror"
            n_drawn += 1
        else:
            ev = "**mirror-only**"
        lines.append(f"| `{name}` | {oracle} | {ev} |")
    lines.append("")
    lines.append(
        f"Totals: {len(qs)} registered; {n_drawn} ever driver-drawn, "
        f"{len(qs) - n_drawn} mirror-only."
    )
    table = "\n".join(lines)

    parity_path = os.path.join(ROOT, "PARITY.md")
    with open(parity_path) as fh:
        doc = fh.read()
    head, _, rest = doc.partition(MARK_START)
    if not rest:
        raise SystemExit("PARITY.md provenance table header not found")
    # the old table runs to the end of the file or the next heading
    m = re.search(r"\n#+ ", rest)
    tail = rest[m.start():] if m else "\n"
    with open(parity_path, "w") as fh:
        fh.write(head + table + tail)
    print(f"provenance regenerated: {len(qs)} queries, {n_drawn} driver-drawn")


if __name__ == "__main__":
    main()
