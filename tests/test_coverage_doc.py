"""COVERAGE.md hygiene: the stated registry counts must equal the live
registry, so the document can never silently overstate coverage when
entries are added or removed (round-7 verdict item 8)."""

import re
from pathlib import Path

from miniodb_spark.queries import get_registry

DOC = Path(__file__).resolve().parent.parent / "COVERAGE.md"


def test_stated_registry_count_matches_live_registry():
    text = DOC.read_text()
    m = re.search(r"\((\d+) queries", text)
    assert m, "COVERAGE.md header must state the registry size"
    registry = get_registry()
    assert int(m.group(1)) == len(registry), (
        f"COVERAGE.md claims {m.group(1)} queries but get_registry() has "
        f"{len(registry)} — regenerate the doc in the same commit that "
        "changes the registry"
    )


def test_stated_oracle_count_matches_live_registry():
    text = DOC.read_text()
    m = re.search(r"all (\d+) with oracles", text)
    assert m, "COVERAGE.md header must state the oracle-backed count"
    registry = get_registry()
    with_oracle = sum(1 for s in registry.values() if s.oracle is not None)
    assert int(m.group(1)) == with_oracle


def test_readme_registry_count_matches_live_registry():
    """README is prose, not generated — pin its stated count the same
    way COVERAGE.md is pinned (round-9 verdict item 6: README drifted
    189 vs 191 because only COVERAGE.md was test-pinned)."""
    readme = DOC.parent / "README.md"
    m = re.search(r"\((\d+) as of round", readme.read_text())
    assert m, "README.md must state the registry size '(N as of round …)'"
    assert int(m.group(1)) == len(get_registry()), (
        f"README.md claims {m.group(1)} registry entries but "
        f"get_registry() has {len(get_registry())}"
    )


def test_claim_is_dated_per_round():
    # the green-at-SF claim must carry a round stamp so staleness is
    # visible ("round N" somewhere in the header paragraph)
    header = DOC.read_text().split("##", 1)[0]
    assert re.search(r"round \d+", header), (
        "COVERAGE.md header must date its all-green claim with a round"
    )


def test_registry_doc_in_sync():
    """REGISTRY.md must equal what tools/gen_registry_doc.py renders
    from the live registry — no silently-stale generated doc."""
    import sys
    sys.path.insert(0, str(DOC.parent / "tools"))
    import gen_registry_doc

    rendered = gen_registry_doc.render()
    actual = (DOC.parent / "REGISTRY.md").read_text()
    assert actual == rendered, (
        "REGISTRY.md is stale — run `python tools/gen_registry_doc.py` "
        "in the same commit as the registry change"
    )


def test_priority_order_generator_is_registry_permutation():
    """tools/gen_priority_order.py drives the per-round driver-window
    rotation: its output must always be a permutation of the live
    registry with every never-driver-graded entry ahead of every graded
    one (the driver grades the first 50)."""
    import sys
    sys.path.insert(0, str(DOC.parent / "tools"))
    import gen_priority_order as g

    order, never = g.new_order()
    assert sorted(order) == sorted(get_registry())
    never_set = set(never)
    seen_graded = False
    for n in order:
        if n in never_set:
            assert not seen_graded, (
                f"never-graded {n} appears after a graded entry"
            )
        else:
            seen_graded = True


def test_priority_order_generator_literal_roundtrip():
    import sys
    sys.path.insert(0, str(DOC.parent / "tools"))
    import gen_priority_order as g

    order, _ = g.new_order()
    lit = g.render_literal(order)
    names = __import__("re").findall(r'"([^"]+)"', lit)
    assert names == order
    assert all(len(line) <= 79 for line in lit.splitlines())
