#!/usr/bin/env python
"""Round-N bookkeeping helper: fold CORRECTNESS_r{N}.json into the registry's
verified-set maintenance (queries/__init__.py invariant).

Prints (a) the hash-green names as a ready-to-paste Python set literal for
_R{N}_VERIFIED, (b) the checked-but-not-green names that must STAY in the
never-green backlog, and (c) registry names never driver-checked in any
round so far. Run at the START of round N+1, then: add the green set as
_R{N}_VERIFIED and append it to _VERIFIED_STALEST_FIRST, MOVE any
re-checked name OUT of its older _R*_VERIFIED set (a name's tier is its
FRESHEST green round — that is what makes the stalest-first rotation
truthful), remove stale-evidence names (anything whose builder/oracle
changed since its green row — that part needs human judgment over the
round's diff), and start an empty _R{N+1}_NEW. _DRIVER_VERIFIED is
computed ONCE after all tier literals are final — never snapshot it
mid-edit (see the r6 note in queries/__init__.py).

Usage: python scripts/fold_verified.py CORRECTNESS_r04.json [more...]
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(paths: list[str]) -> None:
    from dumpr_spark.queries import REGISTRY

    # a name's verdict is its MOST RECENT row (pass files oldest-first):
    # a query green in r3 but red in r4 must NOT come out verified
    verdict: dict[str, bool] = {}
    for p in paths:
        rows = json.load(open(p))
        for name, r in rows.items():
            verdict[name] = r.get("hash_match") is True
    checked = set(verdict)
    green = {n for n, ok in verdict.items() if ok}

    print(f"# latest-verdict hash-green across {paths} "
          f"({len(green)} of {len(checked)} checked):")
    if green:
        lit = "\n".join(
            textwrap.wrap(", ".join(f'"{n}"' for n in sorted(green)), width=76)
        )
        print("_RN_VERIFIED = {\n" + textwrap.indent(lit, "    ") + ",\n}")
    else:
        print("_RN_VERIFIED: set = set()")
    not_green = sorted(checked - green)
    if not_green:
        print(f"\n# latest verdict NOT green (stay in the backlog): {not_green}")
    never = sorted(set(REGISTRY) - checked)
    print(f"\n# never checked in the given files ({len(never)}):")
    print("#", ", ".join(never))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
