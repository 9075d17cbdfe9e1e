"""Regenerate the registry `_PRIORITY_ORDER` for the next round's
driver window.

The external correctness driver grades exactly the FIRST 50 entries of
``get_registry()`` iteration order each round. Rotation policy (see the
comment above ``_PRIORITY_ORDER`` in ``miniodb_spark/queries/order.py``):

1. entries NEVER graded by the driver (no green row in any
   ``CORRECTNESS_r*.json``) come first, oldest-registered first;
2. then all previously-graded entries by staleness — the round of
   their most recent green row, ascending — so no entry's last driver
   grade ages indefinitely;
3. ties keep current registry order (stable sort).

Run from the repo root AFTER the driver has written the round's
CORRECTNESS file:

    python tools/gen_priority_order.py            # print the new order
    python tools/gen_priority_order.py --write    # rewrite queries/order.py

``--write`` replaces the list literal between the ``_PRIORITY_ORDER = [``
line and its closing ``]`` in ``miniodb_spark/queries/order.py`` (the
explanatory comments above the list are left untouched — update them by
hand each round). It refuses to write if the regenerated list would
drop or invent names vs the live registry.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from miniodb_spark.queries import get_registry  # noqa: E402

QUERIES_PY = os.path.join(REPO, "miniodb_spark", "queries", "order.py")
GOLDEN_TXT = os.path.join(REPO, "tests", "golden_registry_order.txt")
WINDOW = 50


def last_green_round(name: str, history: dict[int, dict]) -> int | None:
    """Most recent round with a fully-green driver row for ``name``."""
    last = None
    for rnd in sorted(history):
        row = history[rnd].get(name)
        if row and all(
            row.get(k, False)
            for k in ("rows_match", "schema_match", "hash_match")
            if k in row
        ) and not row.get("err"):
            last = rnd
    return last


def load_history() -> dict[int, dict]:
    history: dict[int, dict] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as fh:
            history[int(m.group(1))] = json.load(fh)
    return history


def new_order() -> tuple[list[str], list[str]]:
    registry = list(get_registry())
    history = load_history()
    graded = {n: last_green_round(n, history) for n in registry}
    never = [n for n in registry if graded[n] is None]
    stale = sorted(
        (n for n in registry if graded[n] is not None),
        key=lambda n: graded[n],  # stable: registry order breaks ties
    )
    order = never + stale
    return order, never


def render_literal(order: list[str]) -> str:
    lines = []
    buf = "    "
    for name in order:
        token = f'"{name}",'
        if len(buf) + len(token) + 1 > 79:
            lines.append(buf.rstrip())
            buf = "    "
        buf += token + " "
    if buf.strip():
        lines.append(buf.rstrip())
    return "\n".join(lines)


def main() -> None:
    order, never = new_order()
    registry = set(get_registry())
    assert set(order) == registry, "order must be a permutation of the registry"
    window = order[:WINDOW]
    print(f"# never-graded: {len(never)}; window 50 = "
          f"{len([n for n in window if n in never])} never-graded + "
          f"{WINDOW - len([n for n in window if n in never])} stalest")
    for i, n in enumerate(order):
        mark = "  <-- window edge" if i == WINDOW - 1 else ""
        print(f"{i + 1:3d} {n}{mark}")

    if "--write" not in sys.argv:
        return
    src = open(QUERIES_PY).read()
    m = re.search(r"_PRIORITY_ORDER = \[\n(.*?)\n\]", src, re.S)
    assert m, "order.py must contain the _PRIORITY_ORDER literal"
    new_src = (src[: m.start()]
               + "_PRIORITY_ORDER = [\n" + render_literal(order) + "\n]"
               + src[m.end():])
    open(QUERIES_PY, "w").write(new_src)
    print(f"wrote {QUERIES_PY} ({len(order)} names)")
    # the golden-order pin (tests/test_registry_order.py) must move with
    # the rotation — regenerate it from the SAME order so the two can
    # never drift apart
    tail = [n for n in get_registry() if n not in set(order)]
    open(GOLDEN_TXT, "w").write("\n".join(order + tail) + "\n")
    print(f"wrote {GOLDEN_TXT}")


if __name__ == "__main__":
    main()
