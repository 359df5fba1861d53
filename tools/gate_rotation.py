"""Refresh the gate-rotation history in aegisthus_spark/queries.py.

Reads every CORRECTNESS_r*.json at the repo root, computes the round of
each query's most recent GREEN driver row (rows/schema/hash match, no
err), and rewrites the `_LAST_GREEN = {...}` block in queries.py in
place. Run once at the start of each round, after the driver drops the
previous round's artifact:

    python tools/gate_rotation.py          # rewrite queries.py
    python tools/gate_rotation.py --check  # print, don't write

The staleness sort in queries._apply_gate_order() then puts the 50
least-recently-proven queries in the driver's correctness window. A
query whose latest check was RED keeps its stale entry and therefore
stays in (or returns to) the window until it earns a green row again.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES_PY = os.path.join(ROOT, "aegisthus_spark", "queries.py")


def is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") in (True, None)  # None = rows-only check
        and not row.get("err")
    )


def collect_last_green(max_round: int | None = None) -> dict[str, int]:
    """Round of each query's latest green driver row.

    max_round limits the scan to artifacts from rounds <= max_round, so a
    caller can reconstruct what the history looked like BEFORE a newer
    driver artifact landed (the test_registry freshness guard uses this to
    distinguish "rotation pending" from a genuinely stale _LAST_GREEN).
    """
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if is_green(row):
                last[name] = max(last.get(name, 0), rnd)
    return last


def render_dict(last: dict[str, int]) -> str:
    items = sorted(last.items())
    lines = ["_LAST_GREEN = {"]
    for i in range(0, len(items), 3):
        chunk = ", ".join(f'"{k}": {v}' for k, v in items[i : i + 3])
        lines.append(f"    {chunk},")
    lines.append("}")
    return "\n".join(lines)


def main() -> None:
    last = collect_last_green()
    block = render_dict(last)
    if "--check" in sys.argv:
        print(block)
        return
    with open(QUERIES_PY) as f:
        src = f.read()
    new_src, n = re.subn(
        r"_LAST_GREEN = \{.*?\n\}", block, src, count=1, flags=re.S
    )
    if n != 1:
        raise SystemExit("could not locate the _LAST_GREEN block in queries.py")
    if new_src != src:
        with open(QUERIES_PY, "w") as f:
            f.write(new_src)
        print(f"updated _LAST_GREEN: {len(last)} queries with green rows")
    else:
        print("already up to date")


if __name__ == "__main__":
    main()
