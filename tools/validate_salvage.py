#!/usr/bin/env python3
"""Salvage hw_validate rows from its log into HWVALIDATE.md.

hw_validate.py appends its table only after EVERY pair completes; a
timeout or kill mid-run (e.g. a 3-hour tail-compile overrun) loses all
measured rows even though each one was printed as a ``(PERF) {...}``
JSON line.  This tool re-parses the log and appends any rows missing
from benchmarks/HWVALIDATE.md, preserving the validation evidence.

Run: python tools/validate_salvage.py [benchmarks/logs/validate.log]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(REPO, "benchmarks", "HWVALIDATE.md")


def main() -> None:
    log = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "benchmarks", "logs", "validate.log")
    rows = []
    for line in open(log):
        if line.startswith("(PERF) {"):
            try:
                r = json.loads(line[len("(PERF) "):])
            except json.JSONDecodeError:
                continue
            if "bit_exact_pair" in r:
                rows.append(r)
    existing = open(OUT).read() if os.path.exists(OUT) else ""
    fresh = []
    for r in rows:
        key = (f"| {r['code']} | {r['backend']} | {r['iters']} "
               f"| {r['batch']} | {r['ms_per_call']} ")
        if key not in existing:
            fresh.append(r)
    if not fresh:
        print(f"(II) nothing to salvage ({len(rows)} rows all present)")
        return
    with open(OUT, "a") as f:
        f.write(
            "\n\nSalvaged from the run log (the writer runs only at "
            "full completion; these rows were measured before a "
            "timeout/kill — source benchmarks/logs/validate.log):\n\n"
            "| code | backend | iters | batch | ms/call | Mbps coded "
            "| bit-exact pair |\n|---|---|---|---|---|---|---|\n"
        )
        for r in fresh:
            f.write(
                f"| {r['code']} | {r['backend']} | {r['iters']} "
                f"| {r['batch']} | {r['ms_per_call']} "
                f"| {r['coded_mbps']} | {r['bit_exact_pair']} |\n"
            )
    print(f"(II) appended {len(fresh)} salvaged rows to {OUT}")


if __name__ == "__main__":
    main()
