#!/usr/bin/env python
"""Rotate the driver verification window (the first 50 ``QUERY_ORDER``
entries in ``__spark_entry__.py``) for a new round.

Queue discipline (the standing rotation protocol, VERDICT r2 #1 /
r4 #1 / r15 #1):

1. queries whose engine or oracle CHANGED this round jump to the
   front (their first driver check must cover the new semantics);
2. the remainder of the new window is filled from the head of the
   old post-window queue — the queries longest-unchecked, because
   every previous round's checked window was rotated to the tail;
3. the old window (just checked by the driver) rotates to the tail.

This tool rewrites BOTH the ``QUERY_ORDER`` list in
``__spark_entry__.py`` and the ``tools/driver_window.json`` manifest
in one shot, so the dict ordering, the manifest, and the pinning test
(``tests/test_oracle_parity.py::test_driver_window_composition_pinned``)
can never drift apart — the defect that broke the r15 closing battery.

Usage:
    python tools/rotate_window.py --round 16 --changed name1,name2,...
    python tools/rotate_window.py --round 16 --changed-file changed.txt
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ENTRY = REPO / "__spark_entry__.py"
MANIFEST = REPO / "tools" / "driver_window.json"
WINDOW = 50


def read_order(src: str) -> list[str]:
    m = re.search(r"^QUERY_ORDER = \[\n(.*?)^\]$", src, re.S | re.M)
    if not m:
        raise SystemExit("QUERY_ORDER list not found in __spark_entry__.py")
    return re.findall(r'^\s*"([^"]+)",\s*$', m.group(1), re.M)


def rotate(
    old: list[str],
    changed: list[str],
    last_green: dict[str, int] | None = None,
) -> list[str]:
    unknown = [n for n in changed if n not in old]
    # changed names not yet in the queue are NEW queries this round —
    # they join the front like any other changed query.
    old_window, old_tail = old[:WINDOW], old[WINDOW:]
    front = list(dict.fromkeys(changed))
    fill = [n for n in old_tail if n not in front]
    if last_green is not None:
        # fill by ACTUAL staleness (last round each query appeared in
        # a committed CORRECTNESS file), not by queue position: jump-
        # to-front rotations drift the queue away from age (the r15
        # window carried r13 greens while r11 greens sat deeper in
        # the tail), and the pin test checks the ages. Queue position
        # stays the deterministic tie-break within a cohort.
        pos = {n: i for i, n in enumerate(old)}
        fill.sort(key=lambda n: (last_green.get(n, 0), pos[n]))
    rotated_out = [n for n in old_window if n not in front]
    new = front + fill + rotated_out
    assert sorted(new) == sorted(set(old) | set(unknown)), "rotation lost names"
    return new


def read_last_green(upto_round: int) -> dict[str, int]:
    """query -> newest round (< upto_round) whose committed
    CORRECTNESS file contains it; absent = never driver-checked."""
    last: dict[str, int] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p.name)
        r = int(m.group(1))
        if r >= upto_round:
            continue
        for name in json.loads(p.read_text()):
            last[name] = max(last.get(name, 0), r)
    return last


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--changed", default="")
    ap.add_argument("--changed-file")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    changed = [n for n in args.changed.split(",") if n]
    if args.changed_file:
        changed += Path(args.changed_file).read_text().split()
    # dedup BEFORE the guard and the manifest write: rotate() dedups
    # the window front, so an un-deduped manifest would fail the very
    # pin test this tool exists to keep green (r16 review)
    changed = list(dict.fromkeys(changed))
    if len(changed) > WINDOW:
        raise SystemExit(f"{len(changed)} changed queries exceed the {WINDOW}-slot window")

    src = ENTRY.read_text()
    old = read_order(src)
    new = rotate(old, changed, read_last_green(args.round))

    manifest = {"round": args.round, "changed": changed, "window": new[:WINDOW]}
    if args.dry_run:
        print(json.dumps(manifest, indent=1))
        return

    body = "\n".join(f'    "{n}",' for n in new)
    new_src, nsub = re.subn(
        r"^QUERY_ORDER = \[\n.*?^\]$",
        "QUERY_ORDER = [\n" + body + "\n]",
        src,
        count=1,
        flags=re.S | re.M,
    )
    assert nsub == 1
    ENTRY.write_text(new_src)
    MANIFEST.write_text(json.dumps(manifest, indent=1) + "\n")
    print(
        f"rotated for r{args.round}: {len(changed)} changed lead the window, "
        f"{WINDOW - len(changed)} filled oldest-green-first from the "
        f"CORRECTNESS history; old window moved to tail ({len(new)} total)"
    )
    print("now run: python -m pytest tests/test_oracle_parity.py -q  (same commit!)")


if __name__ == "__main__":
    main()
