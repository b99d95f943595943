"""Regenerate PARITY.md's per-query oracle-evidence provenance table
from the driver's CORRECTNESS_r*.json records and the live registry,
including a per-query DRAW-READY verdict: the oracle's DuckDB result
types compared kind-for-kind against the Spark result schema (the
type-sensitive value hash failed 4 queries in rounds 1-2 on HUGEINT vs
BIGINT while values were identical — this sweep catches that class
BEFORE a driver draw does).

Run from the repo root after each round:  python tools/gen_provenance.py
(spins up a local Spark session; ~3-5 min for the full registry)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

MARK_START = "| Query | Registered | Oracle | Evidence | Draw-ready |"
OLD_MARKS = (
    "| Query | Oracle | Evidence | Draw-ready |",
    "| Query | Oracle | Evidence |",
)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
ROUNDS_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "registry_rounds.json"
)


def type_sweep(entry, qs, osql) -> "dict[str, str]":
    """Per-query draw-readiness: '✅' when the oracle's DuckDB column
    kinds equal the Spark result kinds (same canonicalization as
    tests/test_entry_oracle.py), else the mismatch description."""
    from tests.oracle_utils import duckdb_connection
    from tests.test_entry_oracle import _duck_kind, _spark_kind

    from muller_spark.session import get_spark

    spark = get_spark("gen_provenance")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, str] = {}
    for name in sorted(qs):
        if name not in osql:
            out[name] = "rows-only"
            continue
        try:
            con = duckdb_connection(SF_DIR)
            try:
                rel = con.sql(osql[name])
                duck = {
                    c.lower(): _duck_kind(str(t))
                    for c, t in zip(rel.columns, rel.types)
                }
            finally:
                con.close()
            sdf = qs[name](spark, SF_DIR)  # analysis only (.schema)
            mine = {
                f.name.lower(): _spark_kind(f.dataType)
                for f in sdf.schema.fields
            }
            # round-9: the driver's pandas canonicalizer cannot sort
            # Array/Map/Struct cells (round-8 err class) — a complex
            # output column means NOT draw-ready even when the oracle
            # types match kind-for-kind
            complex_cols = {
                c: k for c, k in mine.items()
                if k.startswith("list<") or k.startswith("other:")
            }
            if complex_cols:
                out[name] = f"⚠ driver-unsortable columns {complex_cols}"
            elif set(duck) != set(mine):
                out[name] = (
                    f"⚠ columns duck={sorted(duck)} spark={sorted(mine)}"
                )
            else:
                bad = {c: (duck[c], mine[c]) for c in duck if duck[c] != mine[c]}
                out[name] = "✅" if not bad else f"⚠ kinds {bad}"
        except Exception as exc:  # noqa: BLE001 — report, don't abort the table
            out[name] = f"⚠ sweep error: {type(exc).__name__}"
    return out


def main() -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    osql = entry.oracle_sql()

    drawn: dict[str, int] = {}
    cur_round = 1
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        cur_round = max(cur_round, rnd + 1)
        with open(path) as fh:
            rec = json.load(fh)
        for name, res in rec.items():
            ok = res.get("hash_match") or (
                res.get("rows_match") and res.get("err") is None
            )
            if ok and name not in drawn:
                drawn[name] = rnd

    # registration-round ledger (round-10 verdict #6: age the never-
    # drawn list): seeded once from git history, maintained here —
    # names not yet in the file register in the CURRENT round
    try:
        with open(ROUNDS_FILE) as fh:
            registered: dict[str, int] = json.load(fh)
    except FileNotFoundError:
        registered = {}
    changed = False
    for name in sorted(set(qs) | set(entry.rows_only_queries())):
        if name not in registered:
            registered[name] = cur_round
            changed = True
    if changed:
        with open(ROUNDS_FILE, "w") as fh:
            json.dump(registered, fh, indent=0, sort_keys=True)

    ready = type_sweep(entry, qs, osql)

    lines = [MARK_START, "|---|---|---|---|---|"]
    n_drawn = n_ready = n_aged = 0
    for name in sorted(qs):
        oracle = "full-value" if name in osql else "rows-only"
        reg = registered.get(name, cur_round)
        if name in drawn:
            ev = f"driver r{drawn[name]} + mirror"
            n_drawn += 1
        else:
            waited = cur_round - reg
            if waited >= 2:
                ev = f"**mirror-only** (waiting {waited} rounds)"
                n_aged += 1
            else:
                ev = "**mirror-only**"
        rd = ready.get(name, "?")
        if rd == "✅":
            n_ready += 1
        lines.append(f"| `{name}` | r{reg} | {oracle} | {ev} | {rd} |")
    lines.append("")
    lines.append(
        f"Totals: {len(qs)} registered; {n_drawn} ever driver-drawn, "
        f"{len(qs) - n_drawn} mirror-only ({n_aged} waiting ≥2 rounds "
        f"for a draw); {n_ready}/{len(qs)} draw-ready "
        f"(oracle type-sweep clean)."
    )
    ro = entry.rows_only_queries()
    if ro:
        lines.append(
            f"Plus {len(ro)} rows-only queries OUTSIDE the driver registry "
            f"(values not SQL-expressible; pytest-golden-pinned): "
            + ", ".join(f"`{n}`" for n in sorted(ro)) + "."
        )
    table = "\n".join(lines)

    parity_path = os.path.join(ROOT, "PARITY.md")
    with open(parity_path) as fh:
        doc = fh.read()
    for mark in (MARK_START,) + OLD_MARKS:
        head, sep, rest = doc.partition(mark)
        if sep:
            break
    if not sep:
        raise SystemExit("PARITY.md provenance table header not found")
    # the old table runs to the end of the file or the next heading
    m = re.search(r"\n#+ ", rest)
    tail = rest[m.start():] if m else "\n"
    with open(parity_path, "w") as fh:
        fh.write(head + table + tail)
    print(
        f"provenance regenerated: {len(qs)} queries, {n_drawn} driver-drawn, "
        f"{n_ready} draw-ready"
    )


if __name__ == "__main__":
    main()
